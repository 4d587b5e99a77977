"""Pallas TPU fused attention for the encoder hot paths, with in-kernel
attention-weight dropout.

The reference's FLOPs live in BGE attention over <=384-token chunks and ViT
attention over 197 tokens (SURVEY §3.2); at those lengths the win is not
streaming softmax over a huge sequence but never materializing the [L, L]
probability matrix in HBM: each kernel instance loads one query block plus
the full K/V for its (batch, head) into VMEM and does
QK^T -> mask -> softmax -> (dropout) -> PV in one pass on the MXU/VPU.
Matmuls run in the input dtype (bf16 in training) with fp32 accumulation.

Attention-weight dropout (torch MultiheadAttention semantics, used by every
reference attention module) runs inside the kernel via the TPU PRNG: forward
and backward seed identically per (batch, head), so the backward — also a
Pallas kernel — regenerates the exact keep mask instead of storing an
[B, H, L, L] mask in HBM.  With dropout off, the backward is a cheap XLA
recompute (fused well at these lengths).

Padded keys are masked via an int8 [B, L] pad mask (1 = pad), the torch
`key_padding_mask` convention used throughout the reference.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _hash_bits(seed, base, shape):
    """Counter-based 32-bit hash (murmur3-finalizer style) over a unique
    per-element index.  Backend-independent: the Pallas kernels and the
    jnp reference generate the SAME stream, so forward/backward masks align
    and the whole path is testable off-TPU (the TPU-interpret PRNG stubs
    prng_random_bits to zeros, so a real PRNG primitive would be
    untestable in CI)."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (base.astype(jnp.uint32) + rows * jnp.uint32(shape[1]) + cols)
    x = x * jnp.uint32(2654435761) + seed.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _keep_mask(seed, base, shape, rate: float):
    """Bernoulli keep mask: keep iff hash_bits >= rate * 2^32."""
    threshold = jnp.uint32(min(max(rate, 0.0), 1.0) * 4294967295.0)
    return _hash_bits(seed, base, shape) >= threshold


def _softmax_fp32(scores):
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                scale: float, dropout_rate: float, head_block: int,
                n_heads: int):
    # One program per (batch row, q block, head group); heads inner-unrolled
    # so the grid stays small (per-program dispatch overhead dominates with
    # B*H*nq tiny programs of ~40 MFLOP each), with head_block bounding the
    # per-program VMEM (scoped vmem limit is 16MB).
    # q: [1, hb, bq, dh]; k,v: [1, hb, Lk, dh]; mask: [1, 1, Lk]; o like q.
    mask = mask_ref[0, 0, :]
    bi, qi, gi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nq = pl.num_programs(1)
    for h in range(head_block):
        h_abs = gi * head_block + h
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask[None, :] != 0, NEG_INF, scores)
        p = _softmax_fp32(scores)
        if dropout_rate > 0.0:
            base = ((bi * n_heads + h_abs) * nq + qi) * p.shape[0] * p.shape[1]
            keep = _keep_mask(seed_ref[0], base, p.shape, dropout_rate)
            p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        p = p.astype(v.dtype)
        o_ref[0, h, :, :] = jax.lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _pad_inputs(q, k, v, pad_mask, block_q):
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    if pad_mask is None:
        pad_mask = jnp.zeros((b, lk), jnp.int8)
    else:
        pad_mask = pad_mask.astype(jnp.int8)
    pad_lk = -(-lk // 128) * 128
    if pad_lk != lk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_lk - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_lk - lk), (0, 0)))
        pad_mask = jnp.pad(pad_mask, ((0, 0), (0, pad_lk - lk)),
                           constant_values=1)
    bq = min(block_q, lq)
    nq = pl.cdiv(lq, bq)
    pad_lq = nq * bq
    if pad_lq != lq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_lq - lq), (0, 0)))
    return q, k, v, pad_mask, bq, nq, pad_lq, pad_lk


def _fused_attention_fwd_impl(q, k, v, pad_mask, seed, *, block_q: int,
                              dropout_rate: float, interpret: bool = False):
    b, h, lq, dh = q.shape
    scale = 1.0 / math.sqrt(dh)
    q, k, v, pad_mask, bq, nq, pad_lq, lk = _pad_inputs(q, k, v, pad_mask,
                                                        block_q)
    seed_arr = jnp.asarray([seed if seed is not None else 0], jnp.int32)
    hb = math.gcd(h, 4)
    grid = (b, nq, h // hb)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale,
                          dropout_rate=dropout_rate, head_block=hb,
                          n_heads=h),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, hb, bq, dh),
                             lambda bi, qi, gi, *_: (bi, gi, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hb, lk, dh),
                             lambda bi, qi, gi, *_: (bi, gi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hb, lk, dh),
                             lambda bi, qi, gi, *_: (bi, gi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, lk), lambda bi, qi, gi, *_: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, hb, bq, dh),
                                   lambda bi, qi, gi, *_: (bi, gi, qi, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, pad_lq, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * pad_lq * lk * dh,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * pad_lq * lk),
        interpret=interpret,
    )(seed_arr, q, k, v, pad_mask[:, None, :])
    if pad_lq != lq:
        out = out[:, :, :lq]
    return out


# ---------------------------------------------------------------------------
# Backward (Pallas, regenerates the dropout mask from the same seeds)
# ---------------------------------------------------------------------------

def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, dropout_rate: float,
                head_block: int, n_heads: int):
    # One program per (batch row, head group), single q block (the dropout
    # seed stream assumes nq == 1).
    mask = mask_ref[0, 0, :]
    bi, gi = pl.program_id(0), pl.program_id(1)
    for h in range(head_block):
        h_abs = gi * head_block + h
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        do = do_ref[0, h].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask[None, :] != 0, NEG_INF, scores)
        p = _softmax_fp32(scores)                     # pre-dropout probs
        if dropout_rate > 0.0:
            base = (bi * n_heads + h_abs) * p.shape[0] * p.shape[1]
            keep = _keep_mask(seed_ref[0], base, p.shape, dropout_rate)
            inv = 1.0 / (1.0 - dropout_rate)
            p_drop = jnp.where(keep, p * inv, 0.0)
        else:
            p_drop = p
        dv_ref[0, h, :, :] = jax.lax.dot_general(
            p_drop.astype(do_ref.dtype), do.astype(do_ref.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do.astype(v.dtype), v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            dp = jnp.where(keep, dp * inv, 0.0)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = (ds * scale).astype(q.dtype)
        dq_ref[0, h, :, :] = jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[0, h, :, :] = jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _fused_attention_bwd_impl(q, k, v, pad_mask, seed, g, *,
                              dropout_rate: float, interpret: bool = False):
    b, h, lq, dh = q.shape
    lk_orig = k.shape[2]
    scale = 1.0 / math.sqrt(dh)
    # single q block (the dropout seed stream assumes nq == 1)
    q_p, k_p, v_p, mask_p, bq, nq, pad_lq, lk = _pad_inputs(
        q, k, v, pad_mask, block_q=max(lq, 8))
    assert nq == 1
    if pad_lq != lq:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, pad_lq - lq), (0, 0)))
    seed_arr = jnp.asarray([seed if seed is not None else 0], jnp.int32)
    hb = math.gcd(h, 2)   # bwd holds ~3x the temporaries of fwd
    grid = (b, h // hb)
    spec_q = pl.BlockSpec((1, hb, pad_lq, dh),
                          lambda bi, gi, *_: (bi, gi, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, hb, lk, dh), lambda bi, gi, *_: (bi, gi, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale,
                          dropout_rate=dropout_rate, head_block=hb,
                          n_heads=h),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec_q, spec_k, spec_k,
                      pl.BlockSpec((1, 1, lk), lambda bi, gi, *_: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
                      spec_q],
            out_specs=[spec_q, spec_k, spec_k],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, h, pad_lq, dh), q.dtype),
                   jax.ShapeDtypeStruct((b, h, lk, dh), k.dtype),
                   jax.ShapeDtypeStruct((b, h, lk, dh), v.dtype)],
        interpret=interpret,
    )(seed_arr, q_p, k_p, v_p, mask_p[:, None, :], g)
    return (dq[:, :, :lq], dk[:, :, :lk_orig], dv[:, :, :lk_orig])


# ---------------------------------------------------------------------------
# Reference implementation (ground truth + dropout-free XLA backward)
# ---------------------------------------------------------------------------

def _reference_attention(q, k, v, pad_mask):
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / math.sqrt(dh)
    if pad_mask is not None:
        scores = jnp.where(pad_mask[:, None, None, :] != 0, NEG_INF, scores)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


def _reference_attention_with_mask(q, k, v, pad_mask, keep, rate):
    """Einsum attention applying an explicit keep mask (testing only)."""
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / math.sqrt(dh)
    if pad_mask is not None:
        scores = jnp.where(pad_mask[:, None, None, :] != 0, NEG_INF, scores)
    p = jax.nn.softmax(scores, axis=-1)
    p = jnp.where(keep, p / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


def dropout_keep_mask(seed: int, b: int, h: int, lq: int, lk: int,
                      rate: float, lk_padded: Optional[int] = None,
                      interpret: bool = False):
    """The kernels' keep mask (single-q-block seed stream) computed with the
    same backend-independent hash — verifies fwd/bwd against einsum attention
    with the identical mask.  `lk_padded` defaults to lk rounded up to 128
    (the kernel pads K that way; mask columns beyond lk are discarded)."""
    lk_p = lk_padded or (-(-lk // 128) * 128)
    seed_a = jnp.asarray(seed, jnp.int32)
    masks = []
    for bi in range(b):
        row = []
        for hi in range(h):
            base = jnp.asarray((bi * h + hi) * lq * lk_p, jnp.uint32)
            row.append(_keep_mask(seed_a, base, (lq, lk_p), rate)[:, :lk])
        masks.append(jnp.stack(row))
    return jnp.stack(masks)


# ---------------------------------------------------------------------------
# Public API with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention(q, k, v, pad_mask=None, seed=None,
                    dropout_rate: float = 0.0, block_q: int = 512,
                    interpret: bool = False):
    """Fused attention. q,k,v: [B, H, L, Dh]; pad_mask: [B, Lk] (1 = pad);
    seed: int32 scalar for attention-weight dropout (ignored at rate 0).

    With dropout_rate > 0 the whole sequence must fit one q block
    (block_q >= Lq) so forward/backward PRNG streams align.
    """
    if dropout_rate > 0.0:
        assert block_q >= q.shape[2], "dropout needs a single q block"
    return _fused_attention_fwd_impl(q, k, v, pad_mask, seed,
                                     block_q=block_q,
                                     dropout_rate=dropout_rate,
                                     interpret=interpret)


def _vjp_fwd(q, k, v, pad_mask, seed, dropout_rate, block_q, interpret):
    out = _fused_attention_fwd_impl(q, k, v, pad_mask, seed,
                                    block_q=block_q,
                                    dropout_rate=dropout_rate,
                                    interpret=interpret)
    return out, (q, k, v, pad_mask, seed)


def _vjp_bwd(dropout_rate, block_q, interpret, residuals, g):
    q, k, v, pad_mask, seed = residuals
    if dropout_rate > 0.0:
        dq, dk, dv = _fused_attention_bwd_impl(
            q, k, v, pad_mask, seed, g, dropout_rate=dropout_rate,
            interpret=interpret)
        return dq, dk, dv, None, None
    # rate 0: plain XLA recompute (fuses well at these lengths)
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    gf = g.astype(jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    if pad_mask is not None:
        scores = jnp.where(pad_mask[:, None, None, :] != 0, NEG_INF, scores)
    p = jax.nn.softmax(scores, axis=-1)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None)


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)

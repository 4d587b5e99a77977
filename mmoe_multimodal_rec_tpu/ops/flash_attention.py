"""Pallas TPU fused attention for the encoder hot paths — layout-native,
with in-kernel attention-weight dropout.

Layout: q/k/v arrive EXACTLY as the q/k/v Dense projections produce them —
[B, L, H*dh] — and the output leaves in the same layout for the out
projection.  The per-head views are static 64-column slices of the last
dim, so no [B,H,L,dh] transpose ever exists: profiling the train step showed
~20% of device time burned in XLA "data formatting" copies feeding the
earlier [B,H,L,dh] kernel layout.

Each kernel instance handles one batch row x one q block x one head group
(head groups sized so the merged slice stays 128-lane aligned), computing
QK^T -> mask -> softmax -> (dropout) -> PV per head in VMEM; matmuls run in
the input dtype (bf16 in training) with fp32 accumulation; only softmax is
fp32.  The [L, L] probability matrix never reaches HBM.

These kernels are VPU-bound (the [L, L] fp32 softmax tiles dominate; the
MXU dots are ~20% of runtime), so the design minimizes per-element VPU work:
- softmax uses exp(clip(s, ±60)) with NO max-subtraction pass: padded keys
  carry a -1e9 additive bias so clip keeps them at exp(-60) ≈ 8.8e-27
  (vanishing but nonzero — all-masked rows degrade to uniform weights
  instead of NaN, same as the max-shifted form), and |real scores| stay far
  below 60 for LayerNormed inputs (measured |s| < ~30) while
  384*exp(60)*|v| stays well inside fp32 range.  If trained attention
  logits ever drift past the clip, probabilities above it flatten silently
  — set MMOE_SAFE_SOFTMAX=1 (env, read at trace time) to switch every
  kernel to the exact max-shifted softmax (one extra row-max pass per
  tile), and tests/test_flash_attention.py::test_safe_softmax_large_scores
  pins that path's correctness at |s| >> 60;
- the key-pad mask becomes one additive bias vector per program instead of a
  compare+select per score element;
- attention-weight dropout (torch MultiheadAttention semantics, used by
  every reference attention module) draws its keep mask from the TPU
  hardware PRNG (`pltpu.prng_seed` / `prng_random_bits`, ~1 VPU op/element)
  seeded per (seed, batch, head).  The backward kernel reseeds the same
  stream and regenerates the identical mask instead of storing [B,H,L,L]
  in HBM.  In interpret mode (CPU tests) the hardware PRNG is unavailable,
  so both kernels fall back to a counter-based murmur-finalizer hash over
  the same (seed, batch, head, position) key — backend-independent and
  replicated by the jnp test reference.  `dropout_keep_mask` dumps either
  stream so tests can compare against einsum attention given the SAME mask.

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
# exp-clip bound: unnormalized exp(s) flows into bf16 dots, so the bound must
# keep 384*exp(60)*|v| < fp32 max (1.3e29, safe) while exp(-60) ~ 8.8e-27
# stays a normal bf16 (all-pad rows degrade to uniform weights, not NaN).
# LayerNormed scores are |s| < ~30, far inside the clip.
_CLIP = 60.0
_LANE = 128
# Escape hatch for out-of-envelope scores (see module docstring): exact
# max-shifted softmax in every kernel, traded for one extra row-max pass.
import os as _os
SAFE_SOFTMAX = _os.environ.get("MMOE_SAFE_SOFTMAX", "") == "1"


def _hash_bits(seed, base, shape):
    """Counter-based 32-bit hash (murmur3-finalizer style) over a unique
    per-element index; identical on every backend (interpret-mode path)."""
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


def _threshold(rate: float):
    return jnp.uint32(min(max(rate, 0.0), 1.0) * 4294967295.0)


def _keep_mask(seed, bi, h_abs, n_heads: int, rows: int, shape, rate: float,
               use_prng: bool):
    """Keep mask for one (batch, head): rows x shape[1].  `shape` may have
    more rows than `rows` (padded q blocks); the generated stream always
    covers exactly (rows, shape[1]) so forward/backward agree, padded rows
    are filled with keep=True (their cotangents are zero).

    use_prng=True -> TPU hardware PRNG seeded (seed, bi, h_abs);
    use_prng=False -> portable murmur hash (interpret mode / jnp reference).
    """
    gen_shape = (rows, shape[1])
    if use_prng:
        # Mosaic caps prng_seed at 2 values: fold (batch, head) into one
        pltpu.prng_seed(seed, bi * n_heads + h_abs)
        bits = pltpu.bitcast(pltpu.prng_random_bits(gen_shape), jnp.uint32)
    else:
        base = ((bi * n_heads + h_abs) * rows * shape[1]).astype(jnp.uint32)
        bits = _hash_bits(seed, base, gen_shape)
    keep = bits >= _threshold(rate)
    if gen_shape != tuple(shape):
        keep = jnp.pad(keep, ((0, shape[0] - rows), (0, 0)),
                       constant_values=True)
    return keep


def _softmax_parts(scores):
    """Unnormalized softmax: exp(clip(s)) and the per-row reciprocal sum.
    Callers fold `rinv` in where it is cheapest (a [rows, 1]-broadcast
    multiply, or the [rows, dh] output epilogue) instead of paying a
    per-element divide over the [rows, Lk] tile.

    Under SAFE_SOFTMAX the exact max-shifted form runs instead (still
    row-wise unnormalized + rinv, so callers are unchanged); padded keys sit
    at bias -1e9 and the shift keeps them at exp(<= -1e9+max) == 0 unless
    the whole row is padded, where the clip keeps uniform-weights
    degradation identical to the fast path."""
    if SAFE_SOFTMAX:
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(jnp.clip(scores - m, -_CLIP * 2, 0.0))
        return p, 1.0 / jnp.sum(p, axis=-1, keepdims=True)
    p = jnp.exp(jnp.clip(scores, -_CLIP, _CLIP))
    return p, 1.0 / jnp.sum(p, axis=-1, keepdims=True)


def _head_group(dh: int, n_heads: int, max_heads: int) -> int:
    """Heads per program: the merged slice width (hb*dh) must be a 128-lane
    multiple and divide the head count; bounded by max_heads for VMEM."""
    for hb in range(min(max_heads, n_heads), 0, -1):
        if n_heads % hb == 0 and (hb * dh) % _LANE == 0:
            return hb
    return n_heads


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _head_fwd(q, k, v, bias, seed, bi, h_abs, *, n_heads: int, rows: int,
              scale: float, dropout_rate: float, use_prng: bool, out_dtype):
    """One head's fused attention forward (shared by the split-qkv and
    packed-qkv kernels)."""
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale + bias
    p, rinv = _softmax_parts(scores)
    if dropout_rate > 0.0:
        # single q block (asserted by the public API), so the stream covers
        # the whole (Lq, Lk) tile of this (batch, head)
        keep = _keep_mask(seed, bi, h_abs, n_heads, rows, p.shape,
                          dropout_rate, use_prng)
        p = jnp.where(keep, p, 0.0)
        rinv = rinv * (1.0 / (1.0 - dropout_rate))
    # normalization rides the [rows, dh] output epilogue, not the
    # [rows, Lk] probability tile
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * rinv
    return o.astype(out_dtype)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                scale: float, dropout_rate: float, dh: int, hb: int,
                n_heads: int, use_prng: bool):
    # q: [1, bq, hb*dh]; k,v: [1, Lk, hb*dh]; mask: [1, 1, Lk]; o like q.
    # additive key-pad bias, computed arithmetically from the 0/1 int8 mask
    # (Mosaic cannot relayout broadcast bool vectors)
    bias = mask_ref[0, :, :].astype(jnp.float32) * NEG_INF
    bi, qi, gi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    rows = q_ref.shape[1]
    for h in range(hb):
        h_abs = gi * hb + h
        sl = slice(h * dh, (h + 1) * dh)
        o_ref[0, :, sl] = _head_fwd(
            q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl], bias,
            seed_ref[0], bi, h_abs, n_heads=n_heads, rows=rows, scale=scale,
            dropout_rate=dropout_rate, use_prng=use_prng,
            out_dtype=o_ref.dtype)


def _fwd_kernel_packed(seed_ref, qkv_ref, mask_ref, o_ref, *, scale: float,
                       dropout_rate: float, dh: int, hb: int, n_heads: int,
                       use_prng: bool):
    # qkv: [1, L, 3*hb*dh] in GROUP-INTERLEAVED layout — this program's
    # columns are [q_g | k_g | v_g] for head group g; o: [1, L, hb*dh].
    bias = mask_ref[0, :, :].astype(jnp.float32) * NEG_INF
    bi, gi = pl.program_id(0), pl.program_id(1)
    rows = qkv_ref.shape[1]
    w = hb * dh
    for h in range(hb):
        h_abs = gi * hb + h
        o_ref[0, :, h * dh:(h + 1) * dh] = _head_fwd(
            qkv_ref[0, :, h * dh:(h + 1) * dh],
            qkv_ref[0, :, w + h * dh:w + (h + 1) * dh],
            qkv_ref[0, :, 2 * w + h * dh:2 * w + (h + 1) * dh], bias,
            seed_ref[0], bi, h_abs, n_heads=n_heads, rows=rows, scale=scale,
            dropout_rate=dropout_rate, use_prng=use_prng,
            out_dtype=o_ref.dtype)


def _pad_packed(q, k, v, pad_mask, block_q):
    b, lq, d = q.shape
    lk = k.shape[1]
    if pad_mask is None:
        pad_mask = jnp.zeros((b, lk), jnp.int8)
    else:
        pad_mask = pad_mask.astype(jnp.int8)
    pad_lk = -(-lk // _LANE) * _LANE
    if pad_lk != lk:
        k = jnp.pad(k, ((0, 0), (0, pad_lk - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_lk - lk), (0, 0)))
        pad_mask = jnp.pad(pad_mask, ((0, 0), (0, pad_lk - lk)),
                           constant_values=1)
    bq = min(block_q, lq)
    nq = pl.cdiv(lq, bq)
    pad_lq = nq * bq
    if pad_lq != lq:
        q = jnp.pad(q, ((0, 0), (0, pad_lq - lq), (0, 0)))
    return q, k, v, pad_mask, bq, nq, pad_lq, pad_lk


def _fused_attention_fwd_impl(q, k, v, pad_mask, seed, *, n_heads: int,
                              block_q: int, dropout_rate: float,
                              interpret: bool = False):
    b, lq, d = q.shape
    dh = d // n_heads
    scale = 1.0 / math.sqrt(dh)
    q, k, v, pad_mask, bq, nq, pad_lq, lk = _pad_packed(q, k, v, pad_mask,
                                                        block_q)
    hb = _head_group(dh, n_heads, max_heads=6)
    seed_arr = jnp.asarray([seed if seed is not None else 0], jnp.int32)
    grid = (b, nq, n_heads // hb)
    w = hb * dh
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale,
                          dropout_rate=dropout_rate, dh=dh, hb=hb,
                          n_heads=n_heads, use_prng=not interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, w),
                             lambda bi, qi, gi, *_: (bi, qi, gi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk, w),
                             lambda bi, qi, gi, *_: (bi, 0, gi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lk, w),
                             lambda bi, qi, gi, *_: (bi, 0, gi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, lk), lambda bi, qi, gi, *_: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, w),
                                   lambda bi, qi, gi, *_: (bi, qi, gi),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, pad_lq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * pad_lq * lk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * n_heads * pad_lq * lk),
        interpret=interpret,
    )(seed_arr, q, k, v, pad_mask[:, None, :])
    if pad_lq != lq:
        out = out[:, :lq]
    return out


# ---------------------------------------------------------------------------
# Backward (Pallas, regenerates the dropout mask from the same stream)
# ---------------------------------------------------------------------------

def _head_bwd(q, k, v, do, bias, seed, bi, h_abs, *, n_heads: int,
              fwd_rows: int, scale: float, dropout_rate: float,
              use_prng: bool, out_dtype):
    """One head's attention backward; returns (dq, dk, dv).

    `fwd_rows` is the UNPADDED q length the forward generated keep bits
    for: the stream must cover exactly (fwd_rows, Lk) even when this
    kernel's q block is padded past it (padded rows only ever see zero
    cotangents, so their keep=True fill is harmless)."""
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale + bias
    # pre-dropout probs; the dropout 1/(1-rate) scale is UNIFORM, so it
    # rides scalar epilogues (dv output, ds scale) instead of [Lq, Lk]
    # tile passes
    pt, rinv = _softmax_parts(scores)
    p = pt * rinv
    inv = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
    if dropout_rate > 0.0:
        keep = _keep_mask(seed, bi, h_abs, n_heads, fwd_rows, p.shape,
                          dropout_rate, use_prng)
        p_drop = jnp.where(keep, p, 0.0)
    else:
        p_drop = p
    dv = jax.lax.dot_general(
        p_drop.astype(do.dtype), do,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dv = (dv * inv) if inv != 1.0 else dv
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        dp = jnp.where(keep, dp, 0.0)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds * (scale * inv)).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (dq.astype(out_dtype), dk.astype(out_dtype),
            dv.astype(out_dtype))


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, dropout_rate: float,
                dh: int, hb: int, n_heads: int, fwd_rows: int,
                use_prng: bool):
    # One program per (batch row, head group), single q block (dropout seed
    # stream assumes nq == 1).
    bias = mask_ref[0, :, :].astype(jnp.float32) * NEG_INF
    bi, gi = pl.program_id(0), pl.program_id(1)
    for h in range(hb):
        h_abs = gi * hb + h
        sl = slice(h * dh, (h + 1) * dh)
        dq, dk, dv = _head_bwd(
            q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl],
            do_ref[0, :, sl], bias, seed_ref[0], bi, h_abs,
            n_heads=n_heads, fwd_rows=fwd_rows, scale=scale,
            dropout_rate=dropout_rate, use_prng=use_prng,
            out_dtype=dq_ref.dtype)
        dq_ref[0, :, sl] = dq
        dk_ref[0, :, sl] = dk
        dv_ref[0, :, sl] = dv


def _bwd_kernel_packed(seed_ref, qkv_ref, mask_ref, do_ref, dqkv_ref, *,
                       scale: float, dropout_rate: float, dh: int, hb: int,
                       n_heads: int, fwd_rows: int, use_prng: bool):
    # qkv/dqkv: [1, L, 3*hb*dh] group-interleaved; do: [1, L, hb*dh].  The
    # packed cotangent leaves the kernel ALREADY concatenated, so the
    # projection dx is one [*, 3D] x [3D, D] matmul with no stitching.
    bias = mask_ref[0, :, :].astype(jnp.float32) * NEG_INF
    bi, gi = pl.program_id(0), pl.program_id(1)
    w = hb * dh
    for h in range(hb):
        h_abs = gi * hb + h
        sq = slice(h * dh, (h + 1) * dh)
        sk = slice(w + h * dh, w + (h + 1) * dh)
        sv = slice(2 * w + h * dh, 2 * w + (h + 1) * dh)
        dq, dk, dv = _head_bwd(
            qkv_ref[0, :, sq], qkv_ref[0, :, sk], qkv_ref[0, :, sv],
            do_ref[0, :, sq], bias, seed_ref[0], bi, h_abs,
            n_heads=n_heads, fwd_rows=fwd_rows, scale=scale,
            dropout_rate=dropout_rate, use_prng=use_prng,
            out_dtype=dqkv_ref.dtype)
        dqkv_ref[0, :, sq] = dq
        dqkv_ref[0, :, sk] = dk
        dqkv_ref[0, :, sv] = dv


def _fused_attention_bwd_impl(q, k, v, pad_mask, seed, g, *, n_heads: int,
                              dropout_rate: float, interpret: bool = False):
    b, lq, d = q.shape
    dh = d // n_heads
    lk_orig = k.shape[1]
    scale = 1.0 / math.sqrt(dh)
    q_p, k_p, v_p, mask_p, bq, nq, pad_lq, lk = _pad_packed(
        q, k, v, pad_mask, block_q=max(lq, 8))
    assert nq == 1
    if pad_lq != lq:
        g = jnp.pad(g, ((0, 0), (0, pad_lq - lq), (0, 0)))
    # head-group sweep (BENCHMARKS.md): wider programs amortize per-program
    # overhead; 6 heads/program is ~5% faster than 2 and stays well inside
    # scoped VMEM now that the kernel carries fewer fp32 temporaries
    hb = _head_group(dh, n_heads, max_heads=6)
    seed_arr = jnp.asarray([seed if seed is not None else 0], jnp.int32)
    grid = (b, n_heads // hb)
    w = hb * dh
    spec_q = pl.BlockSpec((1, pad_lq, w), lambda bi, gi, *_: (bi, 0, gi),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, lk, w), lambda bi, gi, *_: (bi, 0, gi),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale,
                          dropout_rate=dropout_rate, dh=dh, hb=hb,
                          n_heads=n_heads, fwd_rows=lq,
                          use_prng=not interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[spec_q, spec_k, spec_k,
                      pl.BlockSpec((1, 1, lk), lambda bi, gi, *_: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
                      spec_q],
            out_specs=[spec_q, spec_k, spec_k],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, pad_lq, d), q.dtype),
                   jax.ShapeDtypeStruct((b, lk, d), k.dtype),
                   jax.ShapeDtypeStruct((b, lk, d), v.dtype)],
        interpret=interpret,
    )(seed_arr, q_p, k_p, v_p, mask_p[:, None, :], g)
    return (dq[:, :lq], dk[:, :lk_orig], dv[:, :lk_orig])


# ---------------------------------------------------------------------------
# Packed-QKV self-attention (group-interleaved [B, L, 3D] end to end)
# ---------------------------------------------------------------------------

def pack_qkv_weights(wq, wk, wv, n_heads: int, hb: int):
    """[din, D] x3 -> [din, 3D] in the kernels' GROUP-INTERLEAVED column
    order: for each head group g, [q_g | k_g | v_g] (w = hb*dh columns
    each).  Used on the projection kernels (and, with zeros, on LoRA B
    factors) so ONE matmul produces the packed kernel input and the packed
    backward cotangent feeds ONE dx matmul — no slice/concat traffic, which
    profiling showed cost ~8% of the train step with a plain [q|k|v]
    concat layout."""
    d = wq.shape[-1]
    dh = d // n_heads
    w = hb * dh
    g = n_heads // hb
    parts = [x.reshape(x.shape[:-1] + (g, w)) for x in (wq, wk, wv)]
    return jnp.stack(parts, axis=-2).reshape(wq.shape[:-1] + (3 * d,))


def _pad_rows(x, rows, value=0):
    if x.shape[1] == rows:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[1] = (0, rows - x.shape[1])
    return jnp.pad(x, cfg, constant_values=value)


def _fused_attention_fwd_packed_impl(qkv, pad_mask, seed, *, n_heads: int,
                                     hb: int, dropout_rate: float,
                                     interpret: bool = False):
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    w = hb * dh
    g = n_heads // hb
    scale = 1.0 / math.sqrt(dh)
    pad_l = -(-l // _LANE) * _LANE
    if dropout_rate > 0.0:
        assert pad_l == l, "dropout needs lane-aligned L (stream alignment)"
    qkv_p = _pad_rows(qkv, pad_l)
    if pad_mask is None:
        pad_mask = jnp.zeros((b, l), jnp.int8)
    mask_p = _pad_rows(pad_mask.astype(jnp.int8)[:, None, :].swapaxes(1, 2),
                       pad_l, 1).swapaxes(1, 2)
    seed_arr = jnp.asarray([seed if seed is not None else 0], jnp.int32)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_packed, scale=scale,
                          dropout_rate=dropout_rate, dh=dh, hb=hb,
                          n_heads=n_heads, use_prng=not interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, g),
            in_specs=[
                pl.BlockSpec((1, pad_l, 3 * w), lambda bi, gi, *_: (bi, 0, gi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, pad_l), lambda bi, gi, *_: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, pad_l, w),
                                   lambda bi, gi, *_: (bi, 0, gi),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, pad_l, d), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * pad_l * pad_l * d,
            bytes_accessed=qkv.size * qkv.dtype.itemsize,
            transcendentals=b * n_heads * pad_l * pad_l),
        interpret=interpret,
    )(seed_arr, qkv_p, mask_p)
    return out[:, :l] if pad_l != l else out


def _fused_attention_bwd_packed_impl(qkv, pad_mask, seed, g_out, *,
                                     n_heads: int, hb: int,
                                     dropout_rate: float,
                                     interpret: bool = False):
    b, l, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    w = hb * dh
    g = n_heads // hb
    scale = 1.0 / math.sqrt(dh)
    pad_l = -(-l // _LANE) * _LANE
    qkv_p = _pad_rows(qkv, pad_l)
    g_p = _pad_rows(g_out, pad_l)
    if pad_mask is None:
        pad_mask = jnp.zeros((b, l), jnp.int8)
    mask_p = _pad_rows(pad_mask.astype(jnp.int8)[:, None, :].swapaxes(1, 2),
                       pad_l, 1).swapaxes(1, 2)
    seed_arr = jnp.asarray([seed if seed is not None else 0], jnp.int32)
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel_packed, scale=scale,
                          dropout_rate=dropout_rate, dh=dh, hb=hb,
                          n_heads=n_heads, fwd_rows=l,
                          use_prng=not interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, g),
            in_specs=[
                pl.BlockSpec((1, pad_l, 3 * w), lambda bi, gi, *_: (bi, 0, gi),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, pad_l), lambda bi, gi, *_: (bi, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, pad_l, w), lambda bi, gi, *_: (bi, 0, gi),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, pad_l, 3 * w),
                                   lambda bi, gi, *_: (bi, 0, gi),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, pad_l, d3), qkv.dtype),
        interpret=interpret,
    )(seed_arr, qkv_p, mask_p, g_p)
    return dqkv[:, :l] if pad_l != l else dqkv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_packed(qkv, pad_mask=None, seed=None, n_heads: int = 12,
                           hb: int = 6, dropout_rate: float = 0.0,
                           interpret: bool = False):
    """Self-attention over a packed qkv [B, L, 3D] in the group-interleaved
    layout produced by `pack_qkv_weights` (w = hb*dh columns per projection
    per group).  Output [B, L, D] in standard head-major layout.  The
    backward returns the cotangent in the SAME packed layout, so the
    surrounding projection runs as single [D, 3D] / [3D, D] matmuls with
    no slice or concat between them and the kernel."""
    return _fused_attention_fwd_packed_impl(
        qkv, pad_mask, seed, n_heads=n_heads, hb=hb,
        dropout_rate=dropout_rate, interpret=interpret)


def _vjp_fwd_packed(qkv, pad_mask, seed, n_heads, hb, dropout_rate,
                    interpret):
    out = _fused_attention_fwd_packed_impl(
        qkv, pad_mask, seed, n_heads=n_heads, hb=hb,
        dropout_rate=dropout_rate, interpret=interpret)
    return out, (qkv, pad_mask, seed)


def _vjp_bwd_packed(n_heads, hb, dropout_rate, interpret, residuals, g):
    qkv, pad_mask, seed = residuals
    dqkv = _fused_attention_bwd_packed_impl(
        qkv, pad_mask, seed, g, n_heads=n_heads, hb=hb,
        dropout_rate=dropout_rate, interpret=interpret)
    return dqkv, None, None


flash_attention_packed.defvjp(_vjp_fwd_packed, _vjp_bwd_packed)


# ---------------------------------------------------------------------------
# Reference implementations (ground truth + dropout-free XLA backward)
# ---------------------------------------------------------------------------

def _split_heads(x, n_heads):
    b, l, d = x.shape
    return x.reshape(b, l, n_heads, d // n_heads)


def _reference_attention(q, k, v, pad_mask, n_heads):
    """[B, L, D]-layout einsum attention (ground truth)."""
    qh, kh, vh = (_split_heads(x, n_heads) for x in (q, k, v))
    dh = qh.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(jnp.float32),
                        kh.astype(jnp.float32)) / math.sqrt(dh)
    if pad_mask is not None:
        scores = jnp.where(pad_mask[:, None, None, :] != 0, NEG_INF, scores)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, vh.astype(jnp.float32))
    return out.reshape(q.shape).astype(q.dtype)


def _reference_attention_with_mask(q, k, v, pad_mask, keep, rate, n_heads):
    """Einsum attention applying an explicit keep mask [B, H, Lq, Lk]
    (testing only)."""
    qh, kh, vh = (_split_heads(x, n_heads) for x in (q, k, v))
    dh = qh.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(jnp.float32),
                        kh.astype(jnp.float32)) / math.sqrt(dh)
    if pad_mask is not None:
        scores = jnp.where(pad_mask[:, None, None, :] != 0, NEG_INF, scores)
    p = jax.nn.softmax(scores, axis=-1)
    p = jnp.where(keep, p / (1.0 - rate), 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, vh.astype(jnp.float32))
    return out.reshape(q.shape).astype(q.dtype)


def dropout_keep_mask(seed: int, b: int, h: int, lq: int, lk: int,
                      rate: float, lk_padded: Optional[int] = None,
                      interpret: bool = True):
    """Dump the kernels' keep mask [b, h, lq, lk] via the SAME generator the
    fused kernels use (hardware PRNG when compiled, murmur hash when
    interpreted) — lets tests verify fwd/bwd against einsum attention with
    the same mask on either backend."""
    lk_p = lk_padded or (-(-lk // _LANE) * _LANE)
    seed_arr = jnp.asarray([seed], jnp.int32)

    def kernel(seed_ref, o_ref):
        bi, hi = pl.program_id(0), pl.program_id(1)
        keep = _keep_mask(seed_ref[0], bi, hi, h, lq, (lq, lk_p), rate,
                          use_prng=not interpret)
        o_ref[0, 0] = keep.astype(jnp.int8)

    masks = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h),
            in_specs=[],
            out_specs=pl.BlockSpec((1, 1, lq, lk_p),
                                   lambda bi, hi, *_: (bi, hi, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, lq, lk_p), jnp.int8),
        interpret=interpret,
    )(seed_arr)
    return masks[..., :lk] != 0


# ---------------------------------------------------------------------------
# Public API with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def flash_attention(q, k, v, pad_mask=None, seed=None, n_heads: int = 12,
                    dropout_rate: float = 0.0, block_q: int = 512,
                    interpret: bool = False):
    """Fused attention in packed layout. q: [B, Lq, H*dh]; k,v: [B, Lk, H*dh];
    pad_mask: [B, Lk] (1 = pad); seed: int32 scalar for attention-weight
    dropout (ignored at rate 0).

    With dropout_rate > 0 the whole sequence must fit one q block
    (block_q >= Lq) so forward/backward keep-mask streams align.
    """
    if dropout_rate > 0.0:
        assert block_q >= q.shape[1], "dropout needs a single q block"
    return _fused_attention_fwd_impl(q, k, v, pad_mask, seed,
                                     n_heads=n_heads, block_q=block_q,
                                     dropout_rate=dropout_rate,
                                     interpret=interpret)


def _vjp_fwd(q, k, v, pad_mask, seed, n_heads, dropout_rate, block_q,
             interpret):
    out = _fused_attention_fwd_impl(q, k, v, pad_mask, seed,
                                    n_heads=n_heads, block_q=block_q,
                                    dropout_rate=dropout_rate,
                                    interpret=interpret)
    return out, (q, k, v, pad_mask, seed)


def _vjp_bwd(n_heads, dropout_rate, block_q, interpret, residuals, g):
    q, k, v, pad_mask, seed = residuals
    if dropout_rate > 0.0:
        dq, dk, dv = _fused_attention_bwd_impl(
            q, k, v, pad_mask, seed, g, n_heads=n_heads,
            dropout_rate=dropout_rate, interpret=interpret)
        return dq, dk, dv, None, None
    # rate 0: plain XLA recompute (fuses well at these lengths)
    qh, kh, vh = (_split_heads(x.astype(jnp.float32), n_heads)
                  for x in (q, k, v))
    gh = _split_heads(g.astype(jnp.float32), n_heads)
    dh = qh.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
    if pad_mask is not None:
        scores = jnp.where(pad_mask[:, None, None, :] != 0, NEG_INF, scores)
    p = jax.nn.softmax(scores, axis=-1)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gh)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gh, vh)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kh) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qh) * scale
    return (dq.reshape(q.shape).astype(q.dtype),
            dk.reshape(k.shape).astype(k.dtype),
            dv.reshape(v.shape).astype(v.dtype), None, None)


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)

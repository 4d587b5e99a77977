"""Pallas TPU fused attention for the encoder hot paths.

The reference's FLOPs live in BGE attention over <=384-token chunks and ViT
attention over 197 tokens (SURVEY §3.2); at those lengths the win is not
streaming softmax over a huge sequence but never materializing the [L, L]
probability matrix in HBM: each kernel instance loads one query block plus the
full K/V for its (batch, head) into VMEM and does
QK^T -> mask -> softmax -> PV in one pass on the MXU/VPU.

Padded keys are masked via an int8 [B, L] pad mask (True/1 = pad), matching
the torch `key_padding_mask` convention used throughout the reference.

Backward runs as a custom VJP that recomputes the probabilities with plain
XLA ops — at L<=384 the recompute is cheap and XLA fuses it well; the forward
(the inference/eval hot path) stays fused in VMEM.
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


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    # q: [bq, dh]; k,v: [Lk, dh]; mask: [1, Lk] int8 (1 = pad); o: [bq, dh]
    # Matmuls run in the input dtype (bf16 in training) on the MXU with fp32
    # accumulation; only the softmax itself is fp32.
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    mask = mask_ref[0, 0, :]                    # [Lk] int8
    scores = jnp.where(mask[None, :] != 0, NEG_INF, scores)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0, 0, :, :] = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _fused_attention_fwd_impl(q, k, v, pad_mask, *, block_q: int,
                              interpret: bool = False):
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scale = 1.0 / math.sqrt(dh)
    if pad_mask is None:
        pad_mask = jnp.zeros((b, lk), jnp.int8)
    else:
        pad_mask = pad_mask.astype(jnp.int8)

    # Lane/sublane alignment: pad K/V length to a 128 multiple (padded keys
    # are masked out), pad Q length to the q-block size.
    pad_lk = -(-lk // 128) * 128
    if pad_lk != lk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_lk - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_lk - lk), (0, 0)))
        pad_mask = jnp.pad(pad_mask, ((0, 0), (0, pad_lk - lk)),
                           constant_values=1)
        lk = pad_lk

    bq = min(block_q, lq)
    nq = pl.cdiv(lq, bq)
    pad_lq = nq * bq
    if pad_lq != lq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_lq - lq), (0, 0)))

    grid = (b, h, nq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, dh), lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk, dh), lambda bi, hi, qi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk), lambda bi, hi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, dh),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, pad_lq, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * pad_lq * lk * dh,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * pad_lq * lk),
        interpret=interpret,
    )(q, k, v, pad_mask[:, None, :])
    if pad_lq != lq:
        out = out[:, :, :lq]
    return out


def _reference_attention(q, k, v, pad_mask):
    """Ground-truth XLA attention; also used for the backward recompute."""
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / math.sqrt(dh)
    if pad_mask is not None:
        scores = jnp.where(pad_mask[:, None, None, :] != 0, NEG_INF, scores)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q, k, v, pad_mask=None, block_q: int = 512,
                    interpret: bool = False):
    """Fused attention. q,k,v: [B, H, L, Dh]; pad_mask: [B, Lk] (1 = pad)."""
    return _fused_attention_fwd_impl(q, k, v, pad_mask, block_q=block_q,
                                     interpret=interpret)


def _fwd(q, k, v, pad_mask, block_q, interpret):
    out = _fused_attention_fwd_impl(q, k, v, pad_mask, block_q=block_q,
                                    interpret=interpret)
    return out, (q, k, v, pad_mask)


def _bwd(block_q, interpret, residuals, g):
    q, k, v, pad_mask = residuals
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(dh)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
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
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


flash_attention.defvjp(_fwd, _bwd)

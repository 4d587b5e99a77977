"""Fused LoRA-dropout thin matmul: ``t = (keep ⊙ h·inv) @ A`` as a Pallas
kernel that never materializes the dropped input.

Why this op exists (measured, BENCHMARKS.md "Round-5 experiment log"):
peft-style LoRA applies dropout to the PROJECTION INPUT before the thin
``A`` matmul (ref model.py:592-599 LoraConfig(dropout=0.1)).  Under XLA a
matmul operand must be materialized, so every training step writes the
full dropped ``[N·L, D]`` tensor to HBM — and under layer remat the
backward re-materializes it again for ``dA = drop(h)^T @ dt`` as
multi-output loop fusions that also re-run the murmur hash chain (4
serial u32 multiplies/element).  On the v5e bench shape those fusions
alone cost ~32 ms/step (two-tower) / ~48 ms/step (shared base): half VPU
integer-multiply time, half HBM writes of 151 MB tensors nothing else
ever reads.

The kernel fuses mask generation into the matmuls: the keep mask comes
from the TPU hardware PRNG (``pltpu.prng_seed``/``prng_random_bits``,
~1 VPU op/element — the same scheme as ops/flash_attention.py's
attention-weight dropout), seeded per (seed, row-block) so the forward,
the remat recompute, and both backward kernels regenerate bit-identical
streams without storing anything.  ``h`` is read exactly once per pass
and only the thin ``[M, R]`` product is written.

Three kernels under one ``jax.custom_vjp``:

  forward  t  = (keep ⊙ h·inv) @ A                      reads h, writes t
  bwd dA      = (keep ⊙ h·inv)^T @ dt   (f32 accum)     reads h, writes [D,R]
  bwd dh      = keep ⊙ (dt @ A^T)·inv                   reads dt, writes dh

Semantics: iid-Bernoulli(1-rate) dropout like models/layers.HashDropout —
the keep-mask STREAM differs (hw PRNG vs portable hash), which is the
same backend tradeoff the flash-attention kernel already makes for
attention-weight dropout.  Interpret mode (tests, CPU) uses the portable
murmur hash so a jnp reference can replicate masks bit-exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _threshold(rate: float):
    return jnp.uint32(min(max(rate, 0.0), 1.0) * 4294967295.0)


def _hash_bits(seed, base, shape):
    """Portable counter hash (murmur3-finalizer), identical on every
    backend — the interpret-mode / jnp-reference mask stream."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = base.astype(jnp.uint32) + rows * jnp.uint32(shape[1]) + cols
    x = x * jnp.uint32(2654435761) + seed.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _block_keep(seed, block_idx, shape, rate: float, use_prng: bool):
    """Keep mask for row-block `block_idx` of fixed shape (bm, D).

    The stream is keyed by (seed, block) only, so any kernel that walks
    the SAME block partition regenerates the same bits — the alignment
    contract between forward, remat recompute, dA and dh.
    """
    if use_prng:
        pltpu.prng_seed(seed, block_idx)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    else:
        # wrap in uint32 BEFORE the multiply so traced (int32 program_id)
        # and python-int callers produce identical bases
        base = jnp.asarray(block_idx, jnp.uint32) * \
            jnp.uint32(shape[0] * shape[1])
        bits = _hash_bits(seed, base, shape)
    return bits >= _threshold(rate)


def reference_keep_mask(seed, m: int, d: int, bm: int, rate: float):
    """jnp replica of the interpret-mode mask over the full [M, D] input —
    used by tests to verify the kernels against a plain-jnp computation."""
    blocks = [
        _block_keep(jnp.asarray(seed, jnp.int32), i, (bm, d), rate, False)
        for i in range(m // bm)
    ]
    return jnp.concatenate(blocks, axis=0)


def pick_block_rows(m: int) -> int | None:
    """Largest supported row-block size dividing M (None -> fall back to
    the plain-XLA path; production shapes are multiples of 256)."""
    for bm in (2048, 1024, 512, 256):
        if m % bm == 0:
            return bm
    return None


def lora_fused_ok(h, a) -> bool:
    """Shape/backend gate for the fused path: real TPU, lane-aligned D,
    block-partitionable rows, thin R."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    m = 1
    for s in h.shape[:-1]:
        m *= s
    d, r = h.shape[-1], a.shape[-1]
    return (on_tpu and d % _LANE == 0 and d <= 4096 and r <= 512
            and pick_block_rows(m) is not None)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, h_ref, a_ref, t_ref, *, rate: float,
                use_prng: bool):
    i = pl.program_id(0)
    keep = _block_keep(seed_ref[0], i, h_ref.shape, rate, use_prng)
    inv = jnp.asarray(1.0 / (1.0 - rate), h_ref.dtype)
    hm = jnp.where(keep, h_ref[...] * inv, jnp.zeros((), h_ref.dtype))
    t_ref[...] = jax.lax.dot_general(
        hm, a_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(t_ref.dtype)


def _da_kernel(seed_ref, h_ref, dt_ref, da_ref, *, rate: float,
               use_prng: bool):
    i = pl.program_id(0)
    keep = _block_keep(seed_ref[0], i, h_ref.shape, rate, use_prng)
    inv = jnp.asarray(1.0 / (1.0 - rate), h_ref.dtype)
    hm = jnp.where(keep, h_ref[...] * inv, jnp.zeros((), h_ref.dtype))
    part = jax.lax.dot_general(
        hm, dt_ref[...], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init():
        da_ref[...] = part

    @pl.when(i > 0)
    def _accum():
        da_ref[...] += part


def _dh_kernel(seed_ref, dt_ref, a_ref, dh_ref, *, rate: float,
               use_prng: bool):
    i = pl.program_id(0)
    g = jax.lax.dot_general(
        dt_ref[...], a_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    keep = _block_keep(seed_ref[0], i, dh_ref.shape, rate, use_prng)
    inv = jnp.asarray(1.0 / (1.0 - rate), jnp.float32)
    dh_ref[...] = jnp.where(keep, g * inv,
                            jnp.zeros((), jnp.float32)).astype(dh_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _fwd_impl(h, a, seed, rate: float, interpret: bool):
    m, d = h.shape
    r = a.shape[-1]
    bm = pick_block_rows(m)
    seed_arr = jnp.asarray([seed if seed is not None else 0], jnp.int32)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, use_prng=not interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // bm,),
            in_specs=[
                pl.BlockSpec((bm, d), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, r), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, r), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((m, r), h.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * d * r,
            bytes_accessed=(h.size * h.dtype.itemsize
                            + m * r * h.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(seed_arr, h, a)


def _da_impl(h, dt, seed, rate: float, interpret: bool):
    m, d = h.shape
    r = dt.shape[-1]
    bm = pick_block_rows(m)
    seed_arr = jnp.asarray([seed if seed is not None else 0], jnp.int32)
    da = pl.pallas_call(
        functools.partial(_da_kernel, rate=rate, use_prng=not interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // bm,),
            in_specs=[
                pl.BlockSpec((bm, d), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, r), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            # every grid step revisits the SAME [D, R] output block; grid
            # steps run sequentially on a TPU core, so the i>0 accumulate
            # in _da_kernel is well-defined
            out_specs=pl.BlockSpec((d, r), lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((d, r), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * d * r,
            bytes_accessed=(h.size * h.dtype.itemsize
                            + dt.size * dt.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(seed_arr, h, dt)
    return da


def _dh_impl(dt, a, seed, m: int, rate: float, out_dtype, interpret: bool):
    d, r = a.shape
    bm = pick_block_rows(m)
    seed_arr = jnp.asarray([seed if seed is not None else 0], jnp.int32)
    return pl.pallas_call(
        functools.partial(_dh_kernel, rate=rate, use_prng=not interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // bm,),
            in_specs=[
                pl.BlockSpec((bm, r), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, r), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, d), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((m, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * d * r,
            bytes_accessed=(dt.size * dt.dtype.itemsize
                            + m * d * jnp.dtype(out_dtype).itemsize),
            transcendentals=0),
        interpret=interpret,
    )(seed_arr, dt, a)


# ---------------------------------------------------------------------------
# custom_vjp
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lora_dropout_matmul(h, a, seed, rate: float = 0.1,
                        interpret: bool = False):
    """``t = (keep(seed) ⊙ h / (1-rate)) @ a`` without materializing the
    dropped ``h``.  h: [M, D]; a: [D, R]; seed: int32 scalar; returns
    [M, R] in h.dtype.  Gate call sites with :func:`lora_fused_ok`.
    """
    return _fwd_impl(h, a, seed, rate, interpret)


def _vjp_fwd(h, a, seed, rate, interpret):
    return _fwd_impl(h, a, seed, rate, interpret), (h, a, seed)


def _vjp_bwd(rate, interpret, residuals, dt):
    h, a, seed = residuals
    dt = dt.astype(h.dtype)
    da = _da_impl(h, dt, seed, rate, interpret).astype(a.dtype)
    dh = _dh_impl(dt, a, seed, h.shape[0], rate, h.dtype, interpret)
    return dh, da, None


lora_dropout_matmul.defvjp(_vjp_fwd, _vjp_bwd)

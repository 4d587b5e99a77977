"""Fused LoRA-dropout matmul (ops/lora_dropout.py): interpret-mode kernels
vs a plain-jnp reference that applies the SAME portable keep mask — forward,
both VJP legs (dh through the mask, dA through the dropped input), the
multi-block dA accumulation, and the keep-rate statistics.

The op replaces `drop(h) @ A` (peft LoRA input dropout, ref model.py:
592-599) without materializing drop(h); same iid-Bernoulli semantics,
in-kernel mask stream (see the module docstring for the measured why).
"""
import numpy as np
import jax
import jax.numpy as jnp

from mmoe_multimodal_rec_tpu.ops.lora_dropout import (
    lora_dropout_matmul, pick_block_rows, reference_keep_mask)

# 3 row blocks of 512 (1536 is not divisible by 1024/2048), so the dA
# accumulation across grid steps is exercised
M, D, R, RATE = 1536, 256, 32, 0.1


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


def _ref(h, a, seed, rate):
    """Plain-jnp replica: same mask (portable hash stream), same
    multiply-by-1/(1-rate) scaling, f32-accumulated dot."""
    bm = pick_block_rows(h.shape[0])
    keep = reference_keep_mask(seed, h.shape[0], h.shape[1], bm, rate)
    inv = jnp.asarray(1.0 / (1.0 - rate), h.dtype)
    hm = jnp.where(keep, h * inv, jnp.zeros((), h.dtype))
    return jax.lax.dot_general(
        hm, a, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(h.dtype)


def test_block_layout():
    assert pick_block_rows(M) == 512
    assert pick_block_rows(98304) == 2048   # bench shape: 256 chunks x 384
    assert pick_block_rows(1000) is None    # odd rows -> fallback path


def test_forward_matches_reference():
    h, a = _rand((M, D), 0), _rand((D, R), 1) * 0.1
    got = lora_dropout_matmul(h, a, 1234, RATE, True)
    want = _ref(h, a, 1234, RATE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)
    # a different seed must give a different mask
    other = lora_dropout_matmul(h, a, 77, RATE, True)
    assert not np.allclose(np.asarray(got), np.asarray(other))


def test_vjp_matches_reference():
    h, a = _rand((M, D), 2), _rand((D, R), 3) * 0.1
    co = _rand((M, R), 4)

    def loss_fused(h, a):
        return jnp.sum(lora_dropout_matmul(h, a, 99, RATE, True) * co)

    def loss_ref(h, a):
        return jnp.sum(_ref(h, a, 99, RATE) * co)

    (dh_f, da_f) = jax.grad(loss_fused, argnums=(0, 1))(h, a)
    (dh_r, da_r) = jax.grad(loss_ref, argnums=(0, 1))(h, a)
    np.testing.assert_allclose(np.asarray(dh_f), np.asarray(dh_r),
                               rtol=0, atol=2e-5)
    # dA accumulates across the 3 row blocks in one revisited output block
    np.testing.assert_allclose(np.asarray(da_f), np.asarray(da_r),
                               rtol=0, atol=2e-4)


def test_keep_rate_statistics():
    keep = np.asarray(reference_keep_mask(5, 4096, 256, 512, 0.25))
    assert abs(keep.mean() - 0.75) < 0.01
    # per-block rates hold too (each block draws its own stream)
    per_block = keep.reshape(8, -1).mean(axis=1)
    assert np.all(np.abs(per_block - 0.75) < 0.03)


def test_bf16_forward():
    h = _rand((M, D), 6).astype(jnp.bfloat16)
    a = (_rand((D, R), 7) * 0.1).astype(jnp.bfloat16)
    got = lora_dropout_matmul(h, a, 11, RATE, True)
    want = _ref(h, a, 11, RATE)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0, atol=0.05)

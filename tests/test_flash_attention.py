"""Pallas fused attention: interpret-mode numerics vs the XLA reference
implementation, including pad masks, unaligned lengths, and the VJP."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmoe_multimodal_rec_tpu.ops.flash_attention import (
    _reference_attention, flash_attention)


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


@pytest.mark.parametrize("lq,lk", [(384, 384), (197, 197), (64, 64),
                                   (128, 256)])
def test_flash_matches_reference(lq, lk):
    b, h, dh = 2, 4, 64
    q, k, v = _rand((b, h, lq, dh), 0), _rand((b, h, lk, dh), 1), \
        _rand((b, h, lk, dh), 2)
    mask = np.zeros((b, lk), np.int8)
    mask[0, -5:] = 1
    mask = jnp.asarray(mask)
    want = _reference_attention(q, k, v, mask)
    got = flash_attention(q, k, v, mask, 128, True)  # interpret=True
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_no_mask():
    q, k, v = _rand((1, 2, 128, 64), 0), _rand((1, 2, 128, 64), 1), \
        _rand((1, 2, 128, 64), 2)
    want = _reference_attention(q, k, v, None)
    got = flash_attention(q, k, v, None, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_all_masked_row_is_finite():
    b, h, l, dh = 1, 2, 128, 64
    q, k, v = _rand((b, h, l, dh), 0), _rand((b, h, l, dh), 1), \
        _rand((b, h, l, dh), 2)
    mask = jnp.ones((b, l), jnp.int8)  # everything padded
    got = flash_attention(q, k, v, mask, 128, True)
    assert bool(jnp.all(jnp.isfinite(got)))


def test_flash_vjp_matches_reference():
    b, h, l, dh = 1, 2, 128, 64
    q, k, v = _rand((b, h, l, dh), 0), _rand((b, h, l, dh), 1), \
        _rand((b, h, l, dh), 2)
    mask = np.zeros((b, l), np.int8)
    mask[0, -9:] = 1
    mask = jnp.asarray(mask)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, 128, True) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, mask) ** 2)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)

"""Pallas fused attention (packed [B, L, H*dh] layout): interpret-mode
numerics vs the XLA reference — pad masks, unaligned lengths, the VJP, and
hash dropout (forward and backward against einsum attention given the SAME
keep mask)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmoe_multimodal_rec_tpu.ops.flash_attention import (
    _reference_attention, _reference_attention_with_mask, dropout_keep_mask,
    flash_attention)

H = 4
DH = 64
D = H * DH


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


@pytest.mark.parametrize("lq,lk", [(384, 384), (197, 197), (64, 64),
                                   (128, 256)])
def test_flash_matches_reference(lq, lk):
    b = 2
    q, k, v = _rand((b, lq, D), 0), _rand((b, lk, D), 1), _rand((b, lk, D), 2)
    mask = np.zeros((b, lk), np.int8)
    mask[0, -5:] = 1
    mask = jnp.asarray(mask)
    want = _reference_attention(q, k, v, mask, H)
    got = flash_attention(q, k, v, mask, None, H, 0.0, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_no_mask():
    q, k, v = _rand((1, 128, D), 0), _rand((1, 128, D), 1), \
        _rand((1, 128, D), 2)
    want = _reference_attention(q, k, v, None, H)
    got = flash_attention(q, k, v, None, None, H, 0.0, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_all_masked_row_is_finite():
    b, l = 1, 128
    q, k, v = _rand((b, l, D), 0), _rand((b, l, D), 1), _rand((b, l, D), 2)
    mask = jnp.ones((b, l), jnp.int8)
    got = flash_attention(q, k, v, mask, None, H, 0.0, 128, True)
    assert bool(jnp.all(jnp.isfinite(got)))


def test_safe_softmax_large_scores(monkeypatch):
    """MMOE_SAFE_SOFTMAX escape hatch: scores far beyond the fast path's
    ±60 exp-clip (where the default kernel would silently flatten
    probabilities) must match the exact max-shifted reference, fwd and bwd."""
    import importlib
    fa = importlib.import_module(
        "mmoe_multimodal_rec_tpu.ops.flash_attention")
    monkeypatch.setattr(fa, "SAFE_SOFTMAX", True)
    b, l = 1, 128
    # scale q so scores reach |s| ~ 200 >> clip
    q = _rand((b, l, D), 0) * 25.0
    k, v = _rand((b, l, D), 1), _rand((b, l, D), 2)
    mask = np.zeros((b, l), np.int8)
    mask[0, -9:] = 1
    mask = jnp.asarray(mask)
    want = _reference_attention(q, k, v, mask, H)
    got = fa.flash_attention(q, k, v, mask, None, H, 0.0, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-5)
    # all-pad rows still degrade to finite uniform weights
    full = jnp.ones((b, l), jnp.int8)
    assert bool(jnp.all(jnp.isfinite(
        fa.flash_attention(q, k, v, full, None, H, 0.0, 128, True))))

    def f_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, mask, None, H, 0.0, 128,
                                          True) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, mask, H) ** 2)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_flash_vjp_matches_reference():
    b, l = 1, 128
    q, k, v = _rand((b, l, D), 0), _rand((b, l, D), 1), _rand((b, l, D), 2)
    mask = np.zeros((b, l), np.int8)
    mask[0, -9:] = 1
    mask = jnp.asarray(mask)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, None, H, 0.0, 128,
                                       True) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, mask, H) ** 2)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)


# ---------------------------------------------------------------------------
# in-kernel dropout
# ---------------------------------------------------------------------------

RATE = 0.3


def _dropout_setup(b=2, l=128, seed_val=1234):
    q, k, v = _rand((b, l, D), 0), _rand((b, l, D), 1), _rand((b, l, D), 2)
    mask = np.zeros((b, l), np.int8)
    mask[0, -4:] = 1
    mask = jnp.asarray(mask)
    seed = jnp.asarray(seed_val, jnp.int32)
    keep = dropout_keep_mask(seed_val, b, H, l, l, RATE)
    return q, k, v, mask, seed, keep


def test_flash_dropout_forward_matches_masked_einsum():
    q, k, v, mask, seed, keep = _dropout_setup()
    got = flash_attention(q, k, v, mask, seed, H, RATE, 512, True)
    want = _reference_attention_with_mask(q, k, v, mask, keep, RATE, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_flash_dropout_is_seed_deterministic():
    q, k, v, mask, seed, _ = _dropout_setup()
    a = flash_attention(q, k, v, mask, seed, H, RATE, 512, True)
    b_ = flash_attention(q, k, v, mask, seed, H, RATE, 512, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    c = flash_attention(q, k, v, mask, jnp.asarray(999, jnp.int32), H, RATE,
                        512, True)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_flash_dropout_keep_fraction_sane():
    _, _, _, _, _, keep = _dropout_setup(b=4, l=256)
    frac = float(np.asarray(keep).mean())
    assert abs(frac - (1 - RATE)) < 0.01


def test_flash_dropout_vjp_matches_masked_einsum():
    q, k, v, mask, seed, keep = _dropout_setup()

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, seed, H, RATE, 512,
                                       True) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_reference_attention_with_mask(q, k, v, mask, keep,
                                                      RATE, H) ** 2)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_flash_dropout_vjp_short_lq():
    """Regression: Lq < 8 pads the backward q block; the per-(batch,head)
    hash base must still stride by the forward's UNPADDED Lq*Lk or the
    regenerated keep masks desync for every (batch,head) after the first."""
    b, lq, lk, rate, seed = 3, 4, 128, 0.25, 11
    q, k, v = _rand((b, lq, D), 3), _rand((b, lk, D), 4), _rand((b, lk, D), 5)
    mask = jnp.zeros((b, lk), jnp.int8)
    keep = dropout_keep_mask(seed, b, H, lq, lk, rate)

    out = flash_attention(q, k, v, mask, seed, H, rate, 512, True)
    want = _reference_attention_with_mask(q, k, v, mask, keep, rate, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=5e-5)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, seed, H, rate, 512,
                                       True) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_reference_attention_with_mask(q, k, v, mask, keep,
                                                      rate, H) ** 2)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4)


def test_hash_dropout_module():
    from mmoe_multimodal_rec_tpu.models.layers import HashDropout
    x = jnp.ones((64, 256), jnp.float32)
    mod = HashDropout(0.25)
    out = mod.apply({}, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(0)})
    kept = np.asarray(out) > 0
    assert abs(kept.mean() - 0.75) < 0.03
    np.testing.assert_allclose(np.asarray(out)[kept], 1 / 0.75, rtol=1e-6)
    # deterministic flag passes through untouched
    out_det = mod.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_det), np.asarray(x))
    # same rng -> same mask; different rng -> different mask
    out2 = mod.apply({}, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = mod.apply({}, x, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.array_equal(np.asarray(out), np.asarray(out3))


# ---------------------------------------------------------------------------
# packed-qkv path (group-interleaved [B, L, 3D] in, packed cotangent out)
# ---------------------------------------------------------------------------

def _pack_qkv(q, k, v, hb):
    from mmoe_multimodal_rec_tpu.ops.flash_attention import pack_qkv_weights
    # pack along the last dim exactly like the weights are packed
    return pack_qkv_weights(q, k, v, n_heads=H, hb=hb)


@pytest.mark.parametrize("hb,lq", [(4, 384), (2, 256), (4, 197)])
def test_flash_packed_matches_reference(hb, lq):
    from mmoe_multimodal_rec_tpu.ops.flash_attention import (
        flash_attention_packed)
    b = 2
    q, k, v = _rand((b, lq, D), 0), _rand((b, lq, D), 1), _rand((b, lq, D), 2)
    mask = np.zeros((b, lq), np.int8)
    mask[0, -5:] = 1
    mask = jnp.asarray(mask)
    want = _reference_attention(q, k, v, mask, H)
    got = flash_attention_packed(_pack_qkv(q, k, v, hb), mask, None, H, hb,
                                 0.0, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_packed_vjp_matches_reference():
    from mmoe_multimodal_rec_tpu.ops.flash_attention import (
        flash_attention_packed)
    b, l, hb = 2, 256, 2
    q, k, v = _rand((b, l, D), 3), _rand((b, l, D), 4), _rand((b, l, D), 5)
    mask = jnp.asarray(np.zeros((b, l), np.int8))
    g = _rand((b, l, D), 6)

    def packed_loss(q, k, v):
        out = flash_attention_packed(_pack_qkv(q, k, v, hb), mask, None, H,
                                     hb, 0.0, True)
        return jnp.sum(out * g)

    def ref_loss(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, mask, H) * g)

    got = jax.grad(packed_loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for gg, ww in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww), atol=3e-4)


def test_flash_packed_dropout_matches_masked_einsum_fwd_and_bwd():
    from mmoe_multimodal_rec_tpu.ops.flash_attention import (
        flash_attention_packed)
    b, l, hb, rate, seed = 2, 128, 2, 0.25, 17
    q, k, v = _rand((b, l, D), 7), _rand((b, l, D), 8), _rand((b, l, D), 9)
    mask = jnp.asarray(np.zeros((b, l), np.int8))
    keep = dropout_keep_mask(seed, b, H, l, l, rate)
    g = _rand((b, l, D), 10)

    def packed_loss(q, k, v):
        out = flash_attention_packed(_pack_qkv(q, k, v, hb), mask, seed, H,
                                     hb, rate, True)
        return jnp.sum(out * g), out

    def ref_loss(q, k, v):
        out = _reference_attention_with_mask(q, k, v, mask, keep, rate, H)
        return jnp.sum(out * g), out

    (_, got_out), got = jax.value_and_grad(
        packed_loss, argnums=(0, 1, 2), has_aux=True)(q, k, v)
    (_, want_out), want = jax.value_and_grad(
        ref_loss, argnums=(0, 1, 2), has_aux=True)(q, k, v)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               atol=3e-5)
    for gg, ww in zip(got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww), atol=5e-4)

"""Tests for the "quant" remat policy (models/layers.quant_save).

The policy saves int8-quantized q/k/v projections and fc1 preactivations so
the rematerialized backward DEQUANTIZES instead of recomputing the producing
matmuls (the 7D^2/layer identified in BENCHMARKS.md "Roofline position").
Three properties must hold:

1. straight-through gradients: d quant_save(x)/dx == identity;
2. the compiled backward actually drops the recompute matmuls (measured via
   XLA cost analysis: the "quant" grad program must carry materially fewer
   FLOPs than the "attn" one — this is the DCE the design depends on);
3. training gradients under "quant" stay close to the exact-"attn" ones, and
   the deterministic (eval) forward is bit-identical (quantization is
   train-forward-only).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.flatten_util import ravel_pytree

from mmoe_multimodal_rec_tpu.config import TextEncoderConfig
from mmoe_multimodal_rec_tpu.models.bert import BertEncoder
from mmoe_multimodal_rec_tpu.models.layers import quant_save


def test_quant_save_value_and_gradient():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16)),
                    jnp.float32)

    def f(x):
        return quant_save(x, "t")

    y = f(x)
    # value == per-row int8 quantize/dequantize
    sc = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-12) / 127.
    expect = jnp.round(x / sc) * sc
    np.testing.assert_allclose(np.asarray(y), np.asarray(expect), atol=0)
    assert float(jnp.max(jnp.abs(y - x))) <= float(jnp.max(sc)) / 2 + 1e-7
    # straight-through: gradient is exactly identity
    g = jax.grad(lambda x: jnp.sum(f(x) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 3.0)


def _tiny_cfg():
    return TextEncoderConfig(
        vocab_size=97, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=48, lora_rank=2)


def _grad_fn(policy):
    cfg = _tiny_cfg()
    enc = BertEncoder(cfg, remat=True, remat_policy=policy)
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 48), 0, cfg.vocab_size)
    params = enc.init({"params": rng, "dropout": rng}, ids,
                      deterministic=False)["params"]

    def loss(params):
        out = enc.apply({"params": params}, ids, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(out ** 2)

    return params, loss


def _count_dot_generals(jaxpr):
    n = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            n += 1
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                n += _count_dot_generals(v.jaxpr)
            elif hasattr(v, "eqns"):
                n += _count_dot_generals(v)
    return n


def test_quant_policy_drops_recompute_matmuls():
    """The grad jaxpr under "quant" must carry materially fewer dot_general
    eqns than under "attn": the saved int8 q/k/v + fc1 preact replace their
    producing matmuls in the rematerialized backward (q/k/v base, fc1, and
    the wide LoRA dots — measured: 6 fewer per layer).  This is the
    DCE-through-custom_vjp property the whole design rests on — if a JAX
    upgrade regresses it (e.g. remat partial-eval stops DCE-ing unused
    custom_vjp primal inputs), this fails.  jaxpr-level counting is used
    because XLA:CPU's CSE merges recompute with forward at test scale,
    making compiled cost analysis blind to remat structure."""
    n_layers = 2
    dots = {}
    for policy in ("attn", "quant"):
        params, loss = _grad_fn(policy)
        dots[policy] = _count_dot_generals(
            jax.make_jaxpr(jax.grad(loss))(params).jaxpr)
    assert dots["attn"] - dots["quant"] >= 4 * n_layers, dots


def test_quant_grads_match_exact():
    params_a, loss_a = _grad_fn("attn")
    params_q, loss_q = _grad_fn("quant")
    ga = jax.jit(jax.grad(loss_a))(params_a)
    gq = jax.jit(jax.grad(loss_q))(params_q)
    fa, _ = ravel_pytree(ga)
    fq, _ = ravel_pytree(gq)
    cos = float(jnp.vdot(fa, fq) / (jnp.linalg.norm(fa) *
                                    jnp.linalg.norm(fq) + 1e-30))
    assert cos > 0.99, cos


def test_quant_eval_forward_bit_identical():
    cfg = _tiny_cfg()
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 48), 0, cfg.vocab_size)
    outs = {}
    for policy in ("attn", "quant"):
        enc = BertEncoder(cfg, remat=True, remat_policy=policy)
        params = enc.init(jax.random.PRNGKey(0), ids)["params"]
        outs[policy] = np.asarray(
            enc.apply({"params": params}, ids, deterministic=True))
    np.testing.assert_array_equal(outs["attn"], outs["quant"])


def test_quant_train_forward_close_to_exact():
    """The train forward consumes dequantized q/k/v + fc1 — the deviation it
    injects must stay tiny (this is the numerics half of the gated study)."""
    cfg = _tiny_cfg()
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 48), 0, cfg.vocab_size)
    outs = {}
    for policy in ("attn", "quant"):
        enc = BertEncoder(cfg, remat=True, remat_policy=policy)
        params = enc.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(0)}, ids,
                          deterministic=False)["params"]
        # dropout off via rate-0 rng determinism: compare with SAME rng
        outs[policy] = np.asarray(
            enc.apply({"params": params}, ids, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(7)}))
    scale = np.abs(outs["attn"]).max()
    dev = np.abs(outs["attn"] - outs["quant"]).max() / scale
    assert dev < 5e-2, dev


def test_quant4_pack_roundtrip_and_gradient():
    """int4 path of quant_save: value == per-row int4 quantize/dequantize
    (nibble packing is lossless for ints in [-7,7]); straight-through grad."""
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16)),
                    jnp.float32)

    def f(x):
        return quant_save(x, "t", bits=4)

    y = f(x)
    sc = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-12) / 7.
    expect = jnp.round(x / sc) * sc
    np.testing.assert_allclose(np.asarray(y), np.asarray(expect), atol=0)
    assert float(jnp.max(jnp.abs(y - x))) <= float(jnp.max(sc)) / 2 + 1e-7
    g = jax.grad(lambda x: jnp.sum(f(x) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 3.0)
    # the saved tensor really is half-width: check under jit that the packed
    # int8 exists at [.., n/2]
    jaxpr = jax.make_jaxpr(f)(x)
    i8_shapes = [v.aval.shape for eqn in jaxpr.eqns for v in eqn.outvars
                 if v.aval.dtype == jnp.int8]
    assert (4, 8) in i8_shapes, i8_shapes


def test_quant4_policy_drops_recompute_matmuls_and_saves_half():
    """quant4 keeps the full quant DCE (no recompute matmuls return) and its
    checkpoint residuals carry the fc1 save at HALF the int8 bytes."""
    n_layers = 2
    dots = {}
    for policy in ("attn", "quant", "quant4"):
        params, loss = _grad_fn(policy)
        dots[policy] = _count_dot_generals(
            jax.make_jaxpr(jax.grad(loss))(params).jaxpr)
    assert dots["quant4"] == dots["quant"], dots
    assert dots["attn"] - dots["quant4"] >= 4 * n_layers, dots


def test_quant4_grads_and_forward_close_to_exact():
    """int4 fc1 preact: gradient direction must stay aligned with the exact
    policy and the train forward deviation bounded (looser than int8 — the
    preact only feeds gelu, whose derivative is Lipschitz-bounded)."""
    params_a, loss_a = _grad_fn("attn")
    params_q, loss_q = _grad_fn("quant4")
    fa, _ = ravel_pytree(jax.jit(jax.grad(loss_a))(params_a))
    fq, _ = ravel_pytree(jax.jit(jax.grad(loss_q))(params_q))
    cos = float(jnp.vdot(fa, fq) / (jnp.linalg.norm(fa) *
                                    jnp.linalg.norm(fq) + 1e-30))
    assert cos > 0.98, cos

    cfg = _tiny_cfg()
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 48), 0, cfg.vocab_size)
    outs = {}
    for policy in ("attn", "quant4"):
        enc = BertEncoder(cfg, remat=True, remat_policy=policy)
        params = enc.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(0)}, ids,
                          deterministic=False)["params"]
        outs[policy] = np.asarray(
            enc.apply({"params": params}, ids, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(7)}))
    scale = np.abs(outs["attn"]).max()
    dev = np.abs(outs["attn"] - outs["quant4"]).max() / scale
    # int4 is ~18x coarser than int8 and tiny width (fc1 rows of 64) makes
    # the per-row error proportionally larger than at the production 3072;
    # the binding gate is the convergence test (test_quant_convergence.py)
    assert dev < 2e-1, dev
    # eval forward stays bit-identical (quantization is train-only)
    enc4 = BertEncoder(cfg, remat=True, remat_policy="quant4")
    enc_a = BertEncoder(cfg, remat=True, remat_policy="attn")
    p = enc_a.init(jax.random.PRNGKey(0), ids)["params"]
    np.testing.assert_array_equal(
        np.asarray(enc_a.apply({"params": p}, ids, deterministic=True)),
        np.asarray(enc4.apply({"params": p}, ids, deterministic=True)))

"""scan_layers: lax.scan-over-stacked-params text encoders must be exactly
the unrolled model (models/bert.py `_ScanBertLayer`, utils/scan_convert.py),
just with a smaller HLO.  Covers layout conversion both ways, whole-model
logit equality, TP sharding of stacked params, and a training step."""
import copy

import jax
import jax.numpy as jnp
import numpy as np

from util import tiny_config


def _models(variant="baseline"):
    from mmoe_multimodal_rec_tpu.models.mmoe import MMoERecModel
    cfg = tiny_config(variant, batch_size=4)
    scfg = copy.deepcopy(cfg)
    scfg.model.text.scan_layers = True
    return cfg, MMoERecModel(cfg.model), MMoERecModel(scfg.model), scfg


def test_scan_logits_equal_unrolled_baseline():
    from mmoe_multimodal_rec_tpu.train.loop import dummy_batch
    from mmoe_multimodal_rec_tpu.utils.scan_convert import (stack_layers,
                                                            unstack_layers)

    cfg, unrolled, scanned, _ = _models()
    batch = dummy_batch(cfg, batch_size=4)
    params = unrolled.init(jax.random.PRNGKey(0), batch)["params"]
    want = unrolled.apply({"params": params}, batch, deterministic=True)

    stacked = stack_layers(params)
    # structure must match a scan-model init exactly
    ref = jax.eval_shape(scanned.init, jax.random.PRNGKey(0), batch)["params"]
    assert jax.tree.map(lambda x: x.shape, ref) == \
        jax.tree.map(lambda x: np.shape(x), stacked)

    got = scanned.apply({"params": stacked}, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(want.logit_good),
                               np.asarray(got.logit_good), atol=1e-5)
    np.testing.assert_allclose(np.asarray(want.logit_best),
                               np.asarray(got.logit_best), atol=1e-5)

    # roundtrip back to the unrolled layout is exact
    back = unstack_layers(stacked)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_logits_equal_unrolled_home():
    from mmoe_multimodal_rec_tpu.train.loop import dummy_batch
    from mmoe_multimodal_rec_tpu.utils.scan_convert import stack_layers

    cfg, unrolled, scanned, _ = _models("home")
    batch = dummy_batch(cfg, batch_size=4)
    variables = unrolled.init(jax.random.PRNGKey(1), batch)
    want = unrolled.apply(variables, batch, deterministic=True)
    svars = {"params": stack_layers(variables["params"]), **{
        k: v for k, v in variables.items() if k != "params"}}
    got = scanned.apply(svars, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(want.logit_good),
                               np.asarray(got.logit_good), atol=1e-5)


def test_scan_lora_merge_composes():
    """merge_lora on a STACKED tree works batched ([L,D,r]@[L,r,D]) and the
    merged scan model equals the adapter scan model."""
    from mmoe_multimodal_rec_tpu.models.mmoe import MMoERecModel
    from mmoe_multimodal_rec_tpu.train.loop import dummy_batch
    from mmoe_multimodal_rec_tpu.utils.lora import (merge_lora,
                                                    merged_model_config)
    from mmoe_multimodal_rec_tpu.utils.scan_convert import stack_layers
    from flax import traverse_util

    cfg, unrolled, scanned, scfg = _models()
    batch = dummy_batch(cfg, batch_size=4)
    params = unrolled.init(jax.random.PRNGKey(0), batch)["params"]
    # non-zero lora so the merge is non-trivial
    flat = traverse_util.flatten_dict(params)
    rng = np.random.default_rng(5)
    flat = {k: (jnp.asarray(rng.normal(0, 0.05, np.shape(v)).astype("f"))
                if k[-1] in ("lora_a", "lora_b") else v)
            for k, v in flat.items()}
    params = traverse_util.unflatten_dict(flat)
    stacked = stack_layers(params)

    want = scanned.apply({"params": stacked}, batch, deterministic=True)
    merged = merge_lora(stacked, cfg.model.text.lora_alpha)
    mcfg = merged_model_config(scfg.model)
    assert mcfg.text.scan_layers
    got = MMoERecModel(mcfg).apply({"params": merged}, batch,
                                   deterministic=True)
    np.testing.assert_allclose(np.asarray(want.logit_good),
                               np.asarray(got.logit_good), atol=2e-5)


def test_stacked_param_shardings_shifted():
    from mmoe_multimodal_rec_tpu.parallel.mesh import _param_spec
    from jax.sharding import PartitionSpec as P

    # the spec is left-padded with None to the LEAF's rank (stacked layouts
    # only ever add leading, never-sharded axes: [num_layers] from
    # scan_layers, [2] sides from shared_text_base)
    k2, k3, k4 = np.zeros((3, 4)), np.zeros((2, 3, 4)), np.zeros((2, 2, 3, 4))

    # unrolled rules (reference behavior)
    assert _param_spec(("user_expert", "encoder", "layer_0", "attention",
                        "query", "base", "kernel"), k2, "model") == \
        P(None, "model")
    # stacked: same rule shifted right by the [num_layers] axis
    assert _param_spec(("user_expert", "encoder", "layers", "layer",
                        "attention", "query", "base", "kernel"), k3,
                       "model") == P(None, None, "model")
    assert _param_spec(("user_expert", "encoder", "layers", "layer", "mlp",
                        "fc2", "kernel"), k3, "model") == \
        P(None, "model", None)
    assert _param_spec(("user_expert", "encoder", "layers", "layer",
                        "attention", "query", "lora_b"), k3, "model") == \
        P(None, None, "model")
    # shared-base side-stacked LoRA ([2, r, D]), and scan+shared ([L, 2, r, D])
    assert _param_spec(("text_experts", "encoder", "layer_0", "attention",
                        "query", "lora_b"), k3, "model") == \
        P(None, None, "model")
    assert _param_spec(("text_experts", "encoder", "layers", "layer",
                        "attention", "query", "lora_b"), k4, "model") == \
        P(None, None, None, "model")


def test_scan_train_step_runs_and_learns_sign():
    """A Trainer with scan_layers takes finite steps and updates LoRA."""
    from mmoe_multimodal_rec_tpu.train.loop import Trainer
    from util import stacked_batch

    cfg = tiny_config("baseline", batch_size=4, accum=2)
    cfg.model.text.scan_layers = True
    cfg.train.optim.freeze_steps = 0
    cfg.train.optim.unfreeze_steps = 1
    trainer = Trainer(cfg)
    before = jax.tree.map(lambda x: np.asarray(x), trainer.state.trainable)
    batch = stacked_batch(cfg, seed=0)
    for _ in range(2):
        m = trainer.run_step(batch)
    assert np.isfinite(float(jax.device_get(m["loss"])))
    after = trainer.state.trainable
    moved = any(float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32)
                                      - jnp.asarray(b, jnp.float32)))) > 0
                for a, b in zip(jax.tree.leaves(before),
                                jax.tree.leaves(after)))
    assert moved

"""Shared-base dual text encoder (model.shared_text_base).

Exactness contract: with equal frozen base trees — the invariant of the
reference workflow (both towers load the same pretrained BGE and the base
is in no optimizer group, ref train.py:118-123, 151-186) — the merged
single-pass encoder (models/text_expert.DualTextExpert) computes EXACTLY
what the two-tower layout computes, for logits and for gradients, in both
param layouts' conversions (utils/shared_base.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from mmoe_multimodal_rec_tpu.models.mmoe import MMoERecModel
from mmoe_multimodal_rec_tpu.parallel.mesh import (make_mesh,
                                                   param_shardings)
from mmoe_multimodal_rec_tpu.train.loop import Trainer
from mmoe_multimodal_rec_tpu.train.optimizer import label_param
from mmoe_multimodal_rec_tpu.utils.shared_base import (is_shared_layout,
                                                       shared_to_two_tower,
                                                       two_tower_to_shared)

from util import packed_batch, stacked_batch, tiny_config


def _init_pair(variant="baseline", scan_layers=False):
    """Init the SHARED model (one base), expand to an equal-base two-tower
    tree, and return (cfg_shared, cfg_tower, vars_shared, vars_tower, batch).
    """
    cfg = tiny_config(variant)
    cfg.model.shared_text_base = True
    cfg.model.text.scan_layers = scan_layers
    cfg_tower = tiny_config(variant)
    cfg_tower.model.text.scan_layers = scan_layers
    batch = packed_batch(cfg, seed=0)
    shared_model = MMoERecModel(cfg.model)
    variables = shared_model.init(jax.random.key(0), batch)
    params = variables["params"]
    assert is_shared_layout(params)
    tower_params = shared_to_two_tower(params)
    vars_shared = dict(variables, params=params)
    vars_tower = dict(variables, params=tower_params)
    return cfg, cfg_tower, vars_shared, vars_tower, batch


@pytest.mark.parametrize("variant", ["baseline", "home"])
def test_forward_equality(variant):
    cfg, cfg_tower, vars_shared, vars_tower, batch = _init_pair(variant)
    out_s = MMoERecModel(cfg.model).apply(vars_shared, batch,
                                          deterministic=True)
    out_t = MMoERecModel(cfg_tower.model).apply(vars_tower, batch,
                                                deterministic=True)
    np.testing.assert_allclose(np.asarray(out_s.logit_good),
                               np.asarray(out_t.logit_good),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s.logit_best),
                               np.asarray(out_t.logit_best),
                               rtol=0, atol=1e-5)


def test_forward_equality_scan_layers():
    cfg, cfg_tower, vars_shared, vars_tower, batch = _init_pair(
        scan_layers=True)
    out_s = MMoERecModel(cfg.model).apply(vars_shared, batch,
                                          deterministic=True)
    out_t = MMoERecModel(cfg_tower.model).apply(vars_tower, batch,
                                                deterministic=True)
    np.testing.assert_allclose(np.asarray(out_s.logit_good),
                               np.asarray(out_t.logit_good),
                               rtol=0, atol=1e-5)


def test_gradient_equality():
    """d(loss)/d(lora) through the merged pass == through the two towers:
    shared lora_a[0] grads match user_expert's, [1] match item_expert's."""
    cfg, cfg_tower, vars_shared, vars_tower, batch = _init_pair()

    def loss_fn(params, variables, model_cfg):
        out = MMoERecModel(model_cfg).apply(
            dict(variables, params=params), batch, deterministic=True)
        return (jnp.sum(out.logit_good ** 2)
                + jnp.sum(out.logit_best ** 2)).astype(jnp.float32)

    g_s = traverse_util.flatten_dict(jax.grad(loss_fn)(
        vars_shared["params"], vars_shared, cfg.model))
    g_t = traverse_util.flatten_dict(jax.grad(loss_fn)(
        vars_tower["params"], vars_tower, cfg_tower.model))
    n_lora = 0
    for k, gv in g_s.items():
        if k[-1] not in ("lora_a", "lora_b") or k[0] != "text_experts":
            continue
        n_lora += 1
        for side, tower in ((0, "user_expert"), (1, "item_expert")):
            kt = (tower,) + k[1:]
            np.testing.assert_allclose(np.asarray(gv[side]),
                                       np.asarray(g_t[kt]),
                                       rtol=0, atol=1e-4,
                                       err_msg="/".join(k) + f" side {side}")
    assert n_lora == 2 * 2 * cfg.model.text.num_layers  # q+v per layer


def test_converter_roundtrip():
    cfg, _, vars_shared, vars_tower, _ = _init_pair()
    back = two_tower_to_shared(vars_tower["params"])
    flat_a = traverse_util.flatten_dict(vars_shared["params"])
    flat_b = traverse_util.flatten_dict(back)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        assert np.array_equal(np.asarray(flat_a[k]), np.asarray(flat_b[k])), k
    # and the other direction composes too
    again = shared_to_two_tower(back)
    flat_t = traverse_util.flatten_dict(vars_tower["params"])
    flat_g = traverse_util.flatten_dict(again)
    assert set(flat_t) == set(flat_g)


def test_diverged_base_raises():
    _, _, _, vars_tower, _ = _init_pair()
    flat = traverse_util.flatten_dict(vars_tower["params"])
    key = next(k for k in flat
               if k[0] == "item_expert" and k[-1] == "kernel"
               and "encoder" in k)
    flat[key] = flat[key] + 1.0
    bad = traverse_util.unflatten_dict(flat)
    with pytest.raises(ValueError, match="diverge"):
        two_tower_to_shared(bad)


def test_optimizer_labels_shared_tree():
    cfg, _, vars_shared, _, _ = _init_pair()
    flat = traverse_util.flatten_dict(vars_shared["params"])
    labels = {k: label_param(k, "baseline") for k in flat}
    lora = [k for k, v in labels.items() if v == "lora"]
    assert lora and all(k[0] == "text_experts" for k in lora)
    # the shared base and the per-side final norms stay frozen (the
    # reference quirk: baseline text norms are in no param group,
    # train.py:151-162)
    for k, v in labels.items():
        if k[0] == "text_experts" and k[-1] not in ("lora_a", "lora_b"):
            assert v == "frozen", k


def test_trainer_two_steps_shared():
    cfg = tiny_config("baseline")
    cfg.model.shared_text_base = True
    trainer = Trainer(cfg)
    m1 = trainer.run_step(stacked_batch(cfg, seed=0))
    m2 = trainer.run_step(stacked_batch(cfg, seed=1))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert int(trainer.state.step) == 2


def test_param_shardings_side_stacked_lora():
    cfg = tiny_config("baseline", data_parallel=4, model_parallel=2)
    cfg.model.shared_text_base = True
    batch = packed_batch(cfg, seed=0)
    params = jax.eval_shape(
        lambda: MMoERecModel(cfg.model).init(jax.random.key(0), batch)
    )["params"]
    mesh = make_mesh(cfg.train.mesh)
    sh = param_shardings(params, mesh)
    flat_p = traverse_util.flatten_dict(params)
    flat_s = traverse_util.flatten_dict(sh)
    for k, s in flat_s.items():
        spec = s.spec
        assert len(spec) <= flat_p[k].ndim, (k, spec)
        if k[0] == "text_experts" and k[-1] == "lora_b" \
                and k[-2] in ("query", "value"):
            # side-stacked [2, r, D]: model axis on the LAST dim only
            assert tuple(spec) == (None, None, "model"), (k, spec)

"""LoRA-merge serving path: W' = W + (alpha/r) A B must reproduce the
adapter forward exactly at deterministic inference (utils/lora.py), and the
merged tree must structurally match a lora_rank=0 init so the packed-qkv
attention path compiles against it."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from util import tiny_config, tiny_tokenizer


def _nonzero_lora(params, seed=7):
    """Init leaves lora_b at zeros (peft init) — randomize BOTH factors so
    the merge is exercised on a non-trivial delta, as after training."""
    from flax import traverse_util
    flat = traverse_util.flatten_dict(params)
    rng = np.random.default_rng(seed)
    out = {}
    for k, v in flat.items():
        if k[-1] in ("lora_a", "lora_b"):
            out[k] = jnp.asarray(
                rng.normal(0, 0.05, np.shape(v)).astype(np.float32))
        else:
            out[k] = v
    return traverse_util.unflatten_dict(out)


def test_merged_forward_equals_adapter_forward():
    from mmoe_multimodal_rec_tpu.models.mmoe import MMoERecModel
    from mmoe_multimodal_rec_tpu.train.loop import dummy_batch
    from mmoe_multimodal_rec_tpu.utils.lora import (merge_lora,
                                                    merged_model_config)

    cfg = tiny_config("baseline", batch_size=4)
    assert cfg.model.text.lora_rank > 0
    model = MMoERecModel(cfg.model)
    batch = dummy_batch(cfg, batch_size=4)
    params = _nonzero_lora(
        model.init(jax.random.PRNGKey(0), batch)["params"])
    want = model.apply({"params": params}, batch, deterministic=True)

    merged = merge_lora(params, cfg.model.text.lora_alpha)
    mcfg = merged_model_config(cfg.model)
    mmodel = MMoERecModel(mcfg)

    # structure == a rank-0 init (so checkpoint/apply layouts line up)
    ref = jax.eval_shape(mmodel.init, jax.random.PRNGKey(0), batch)["params"]
    assert jax.tree.map(lambda x: x.shape, ref) == \
        jax.tree.map(lambda x: np.shape(x), merged)

    got = mmodel.apply({"params": merged}, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(want.logit_good),
                               np.asarray(got.logit_good),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(want.logit_best),
                               np.asarray(got.logit_best),
                               rtol=0, atol=2e-5)


def test_merged_forward_equals_adapter_forward_home():
    from mmoe_multimodal_rec_tpu.models.mmoe import MMoERecModel
    from mmoe_multimodal_rec_tpu.train.loop import dummy_batch
    from mmoe_multimodal_rec_tpu.utils.lora import (merge_lora,
                                                    merged_model_config)

    cfg = tiny_config("home", batch_size=4)
    model = MMoERecModel(cfg.model)
    batch = dummy_batch(cfg, batch_size=4)
    variables = model.init(jax.random.PRNGKey(1), batch)
    params = _nonzero_lora(variables["params"], seed=11)
    stats = variables.get("batch_stats")
    vs = {"params": params, **({"batch_stats": stats} if stats else {})}
    want = model.apply(vs, batch, deterministic=True)

    merged = merge_lora(params, cfg.model.text.lora_alpha)
    mmodel = MMoERecModel(merged_model_config(cfg.model))
    mvs = {"params": merged, **({"batch_stats": stats} if stats else {})}
    got = mmodel.apply(mvs, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(want.logit_good),
                               np.asarray(got.logit_good),
                               rtol=0, atol=2e-5)


def test_merge_refuses_rank0_tree():
    from mmoe_multimodal_rec_tpu.models.mmoe import MMoERecModel
    from mmoe_multimodal_rec_tpu.train.loop import dummy_batch
    from mmoe_multimodal_rec_tpu.utils.lora import (merge_lora,
                                                    merged_model_config)

    cfg = tiny_config("baseline", batch_size=2)
    mcfg = merged_model_config(cfg.model)
    model = MMoERecModel(mcfg)
    params = model.init(jax.random.PRNGKey(0),
                        dummy_batch(cfg, batch_size=2))["params"]
    with pytest.raises(ValueError, match="no LoRA"):
        merge_lora(params, cfg.model.text.lora_alpha)


def test_predictor_merges_by_default():
    from mmoe_multimodal_rec_tpu.eval.predict import Predictor
    from mmoe_multimodal_rec_tpu.models.mmoe import MMoERecModel
    from mmoe_multimodal_rec_tpu.train import split_trainable
    from mmoe_multimodal_rec_tpu.train.loop import dummy_batch

    cfg = tiny_config("baseline", batch_size=4)
    model = MMoERecModel(cfg.model)
    params = _nonzero_lora(
        model.init(jax.random.PRNGKey(0),
                   dummy_batch(cfg, batch_size=4))["params"], seed=3)
    trainable, frozen = split_trainable(params, "baseline")
    tok = tiny_tokenizer(cfg)
    texts_u = ["Great bike, highly recommend.", "Bad helmet."]
    texts_i = ["Mountain bike with solid frame.", "Cheap helmet."]
    merged = Predictor(cfg, trainable, frozen, batch_size=4, tokenizer=tok)
    plain = Predictor(cfg, trainable, frozen, batch_size=4, tokenizer=tok,
                      merge_lora=False)
    assert merged.model.cfg.text.lora_rank == 0
    assert plain.model.cfg.text.lora_rank > 0
    a = merged.predict(texts_u, texts_i)
    b = plain.predict(texts_u, texts_i)
    np.testing.assert_allclose(a["prob_good"], b["prob_good"], atol=2e-5)
    np.testing.assert_allclose(a["prob_best"], b["prob_best"], atol=2e-5)


def test_merge_shared_base_tree():
    """A shared-base tree (model.shared_text_base) merges by first expanding
    to two towers (one base kernel cannot hold two merged deltas) — the
    merged forward must equal the shared adapter forward, and the layout
    must match merged_model_config (shared off, rank 0)."""
    from mmoe_multimodal_rec_tpu.models.mmoe import MMoERecModel
    from mmoe_multimodal_rec_tpu.train.loop import dummy_batch
    from mmoe_multimodal_rec_tpu.utils.lora import (merge_lora,
                                                    merged_model_config)

    cfg = tiny_config("baseline", batch_size=4)
    cfg.model.shared_text_base = True
    model = MMoERecModel(cfg.model)
    batch = dummy_batch(cfg, batch_size=4)
    params = _nonzero_lora(
        model.init(jax.random.PRNGKey(0), batch)["params"])
    want = model.apply({"params": params}, batch, deterministic=True)

    merged = merge_lora(params, cfg.model.text.lora_alpha)
    mcfg = merged_model_config(cfg.model)
    assert mcfg.shared_text_base is False and mcfg.text.lora_rank == 0
    mmodel = MMoERecModel(mcfg)
    ref = jax.eval_shape(mmodel.init, jax.random.PRNGKey(0), batch)["params"]
    assert jax.tree.map(lambda x: x.shape, ref) == \
        jax.tree.map(lambda x: np.shape(x), merged)

    got = mmodel.apply({"params": merged}, batch, deterministic=True)
    np.testing.assert_allclose(np.asarray(want.logit_good),
                               np.asarray(got.logit_good),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(want.logit_best),
                               np.asarray(got.logit_best),
                               rtol=0, atol=2e-5)

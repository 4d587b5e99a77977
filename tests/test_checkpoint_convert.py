"""Whole-checkpoint conversion: a synthetic reference-layout torch-style
state dict (exact reference key names/shapes, random values) must convert
into params that drive the full model forward — validating every converter
key path without network access.  Also exercises the serving Predictor."""
import numpy as np
import pytest

from mmoe_multimodal_rec_tpu.utils import hf_convert
from util import tiny_config


def _linear(rng, i, o):
    return {"weight": rng.normal(size=(o, i)).astype(np.float32),
            "bias": rng.normal(size=(o,)).astype(np.float32)}


def _ln(rng, d):
    return {"weight": rng.normal(size=(d,)).astype(np.float32),
            "bias": rng.normal(size=(d,)).astype(np.float32)}


def _flat(prefix, tree, out):
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            _flat(key, v, out)
        else:
            out[key] = v
    return out


def _bert_sd(rng, cfg, lora=True):
    d, ff, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    sd = {
        "embeddings.word_embeddings.weight":
            rng.normal(size=(cfg.vocab_size, d)).astype(np.float32),
        "embeddings.position_embeddings.weight":
            rng.normal(size=(cfg.max_position_embeddings, d)).astype(np.float32),
        "embeddings.token_type_embeddings.weight":
            rng.normal(size=(2, d)).astype(np.float32),
    }
    _flat("embeddings.LayerNorm", _ln(rng, d), sd)
    for i in range(L):
        p = f"encoder.layer.{i}"
        for name in ("query", "key", "value"):
            if lora and name in ("query", "value"):
                _flat(f"{p}.attention.self.{name}.base_layer",
                      _linear(rng, d, d), sd)
                sd[f"{p}.attention.self.{name}.lora_A.default.weight"] = \
                    rng.normal(size=(cfg.lora_rank, d)).astype(np.float32)
                sd[f"{p}.attention.self.{name}.lora_B.default.weight"] = \
                    rng.normal(size=(d, cfg.lora_rank)).astype(np.float32)
            else:
                _flat(f"{p}.attention.self.{name}", _linear(rng, d, d), sd)
        _flat(f"{p}.attention.output.dense", _linear(rng, d, d), sd)
        _flat(f"{p}.attention.output.LayerNorm", _ln(rng, d), sd)
        _flat(f"{p}.intermediate.dense", _linear(rng, d, ff), sd)
        _flat(f"{p}.output.dense", _linear(rng, ff, d), sd)
        _flat(f"{p}.output.LayerNorm", _ln(rng, d), sd)
    return sd


def _vit_sd(rng, cfg):
    d, ff, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    sd = {
        "embeddings.cls_token": rng.normal(size=(1, 1, d)).astype(np.float32),
        "embeddings.position_embeddings":
            rng.normal(size=(1, cfg.num_patches + 1, d)).astype(np.float32),
        "embeddings.patch_embeddings.projection.weight":
            rng.normal(size=(d, 3, 16, 16)).astype(np.float32),
        "embeddings.patch_embeddings.projection.bias":
            rng.normal(size=(d,)).astype(np.float32),
    }
    _flat("layernorm", _ln(rng, d), sd)
    for i in range(L):
        p = f"encoder.layer.{i}"
        for name in ("query", "key", "value"):
            _flat(f"{p}.attention.attention.{name}", _linear(rng, d, d), sd)
        _flat(f"{p}.attention.output.dense", _linear(rng, d, d), sd)
        _flat(f"{p}.layernorm_before", _ln(rng, d), sd)
        _flat(f"{p}.layernorm_after", _ln(rng, d), sd)
        _flat(f"{p}.intermediate.dense", _linear(rng, d, ff), sd)
        _flat(f"{p}.output.dense", _linear(rng, ff, d), sd)
    return sd


def _prenorm_sd(rng, prefix, d, sd):
    w = rng.normal(size=(3 * d, d)).astype(np.float32)
    b = rng.normal(size=(3 * d,)).astype(np.float32)
    sd[f"{prefix}.self_attn.in_proj_weight"] = w
    sd[f"{prefix}.self_attn.in_proj_bias"] = b
    _flat(f"{prefix}.self_attn.out_proj", _linear(rng, d, d), sd)
    _flat(f"{prefix}.norm1", _ln(rng, d), sd)
    _flat(f"{prefix}.norm2", _ln(rng, d), sd)
    _flat(f"{prefix}.linear1", _linear(rng, d, 4 * d), sd)
    _flat(f"{prefix}.linear2", _linear(rng, 4 * d, d), sd)


def _cross_sd(rng, d, final=True):
    sd = {}
    for i in range(2):
        _prenorm_sd(rng, f"self_user.{i}", d, sd)
        _prenorm_sd(rng, f"self_item.{i}", d, sd)
    sd["cross_attn.in_proj_weight"] = rng.normal(size=(3 * d, d)).astype(np.float32)
    sd["cross_attn.in_proj_bias"] = rng.normal(size=(3 * d,)).astype(np.float32)
    _flat("cross_attn.out_proj", _linear(rng, d, d), sd)
    sd["gate"] = np.array([0.5], np.float32)
    sd["pool.query"] = rng.normal(size=(1, 1, d)).astype(np.float32)
    if final:
        _flat("norm", _ln(rng, d), sd)
        _flat("mlp.0", _linear(rng, d, 4 * d), sd)
        _flat("mlp.3", _linear(rng, 4 * d, d), sd)
    return sd


def _fuse_sd(rng, d, final=True):
    sd = {}
    for i in range(2):
        _prenorm_sd(rng, f"layers.{i}", d, sd)
    _flat("res_proj.0", _linear(rng, 2 * d, d), sd)
    _flat("res_proj.1", _ln(rng, d), sd)
    _flat("gate.0", _linear(rng, 2 * d, d // 2), sd)
    _flat("gate.2", _linear(rng, d // 2, 1), sd)
    if final:
        _flat("proj.0", _ln(rng, d), sd)
        _flat("proj.1", _linear(rng, d, d), sd)
    return sd


def _head_sd(rng, d, hidden=16):
    sd = {}
    _flat("gate_good.fc", _linear(rng, d, 6), sd)
    _flat("gate_best.fc", _linear(rng, d, 6), sd)
    for t in ("tower_good", "tower_best"):
        _flat(f"{t}.0", _ln(rng, d), sd)
        _flat(f"{t}.1", _linear(rng, d, hidden), sd)
        _flat(f"{t}.4", _linear(rng, hidden, hidden // 2), sd)
        _flat(f"{t}.7", _linear(rng, hidden // 2, 1), sd)
    return sd


def test_convert_reference_checkpoint_baseline_runs():
    import jax
    cfg = tiny_config("baseline")
    mc = cfg.model
    rng = np.random.default_rng(0)
    d = mc.d
    ckpt = {
        "user": {"encoder." + k: v
                 for k, v in _bert_sd(rng, mc.text).items()},
        "item": {"encoder." + k: v
                 for k, v in _bert_sd(rng, mc.text).items()},
        "img": ({"backbone." + k: v for k, v in _vit_sd(rng, mc.image).items()}
                | _flat("norm", _ln(rng, d), {})),
        "cross_ui": _cross_sd(rng, d),
        "concat_ui": _fuse_sd(rng, d),
        "concat_ti": _fuse_sd(rng, d),
        "head": _head_sd(rng, d, mc.tower_hidden),
    }
    # text expert norm lives beside the encoder (model.py:220)
    for side in ("user", "item"):
        _flat("norm", _ln(rng, d), ckpt[side])

    params, stats = hf_convert.convert_reference_checkpoint(ckpt, mc)
    assert stats is None

    # converted params must structurally match the model init exactly
    from mmoe_multimodal_rec_tpu.models.mmoe import MMoERecModel
    from mmoe_multimodal_rec_tpu.train.loop import dummy_batch
    model = MMoERecModel(mc)
    batch = dummy_batch(cfg, batch_size=2)
    ref = model.init(jax.random.PRNGKey(0), batch)["params"]
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: np.shape(x), params)
    assert ref_shapes == got_shapes

    out = model.apply({"params": params}, batch)
    assert np.all(np.isfinite(np.asarray(out.logit_good)))


def test_predictor_serving_path():
    import jax
    from mmoe_multimodal_rec_tpu.eval.predict import Predictor
    from mmoe_multimodal_rec_tpu.models.mmoe import MMoERecModel
    from mmoe_multimodal_rec_tpu.train import split_trainable
    from mmoe_multimodal_rec_tpu.train.loop import dummy_batch
    from util import tiny_tokenizer

    cfg = tiny_config("baseline", batch_size=4)
    model = MMoERecModel(cfg.model)
    params = model.init(jax.random.PRNGKey(0),
                        dummy_batch(cfg, batch_size=4))["params"]
    trainable, frozen = split_trainable(params, "baseline")
    pred = Predictor(cfg, trainable, frozen, batch_size=4,
                     tokenizer=tiny_tokenizer(cfg))
    out = pred.predict(
        ["Great bike, highly recommend.", "Bad helmet."],
        ["Mountain bike with solid frame.", "Cheap helmet."])
    assert out["prob_good"].shape == (2,)
    assert np.all((out["prob_good"] >= 0) & (out["prob_good"] <= 1))
    # padded entries must not affect the real rows
    out3 = pred.predict(
        ["Great bike, highly recommend.", "Bad helmet.", "Meh."],
        ["Mountain bike with solid frame.", "Cheap helmet.", "Thing."])
    np.testing.assert_allclose(out["prob_good"], out3["prob_good"][:2],
                               atol=1e-5)


@pytest.mark.slow
def test_cli_eval_with_reference_torch_checkpoint(tmp_path, capsys):
    """torch.save a reference-layout checkpoint -> `eval --reference-ckpt`
    converts it and produces AUCs over synthetic shards (the switch-over
    path for users holding reference checkpoints)."""
    import json
    import torch
    from mmoe_multimodal_rec_tpu.cli import main as cli_main
    from mmoe_multimodal_rec_tpu.data.synthetic import write_synthetic_shards

    cfg = tiny_config("baseline")
    mc = cfg.model
    rng = np.random.default_rng(1)
    d = mc.d
    ckpt = {
        "epoch": 3,
        "user": {"encoder." + k: v
                 for k, v in _bert_sd(rng, mc.text).items()},
        "item": {"encoder." + k: v
                 for k, v in _bert_sd(rng, mc.text).items()},
        "img": ({"backbone." + k: v
                 for k, v in _vit_sd(rng, mc.image).items()}
                | _flat("norm", _ln(rng, d), {})),
        "cross_ui": _cross_sd(rng, d),
        "concat_ui": _fuse_sd(rng, d),
        "concat_ti": _fuse_sd(rng, d),
        "head": _head_sd(rng, d, mc.tower_hidden),
    }
    for side in ("user", "item"):
        _flat("norm", _ln(rng, d), ckpt[side])
    ckpt = {k: ({kk: torch.tensor(vv) for kk, vv in v.items()}
                if isinstance(v, dict) else v) for k, v in ckpt.items()}
    pt_path = str(tmp_path / "ref_ckpt.pt")
    torch.save(ckpt, pt_path)

    shards = tmp_path / "wds"
    write_synthetic_shards(str(shards), n_samples=16, samples_per_shard=8)
    flags = [
        f"--data.valid_pattern={shards}/*.tar.gz",
        f"--train.checkpoint_dir={tmp_path}/ckpt",
        f"--train.output_dir={tmp_path}/out",
        "--train.batch_size=4", "--train.mesh.data_parallel=2",
        "--model.d=32", "--model.compute_dtype=float32",
        "--model.use_flash_attention=false",
        "--model.cross_heads=4", "--model.fuse_heads=4",
        "--model.tower_hidden=16",
        "--model.text.vocab_size=201", "--model.text.hidden_size=32",
        "--model.text.num_layers=2", "--model.text.num_heads=4",
        "--model.text.intermediate_size=64",
        "--model.text.max_position_embeddings=48",
        "--model.text.lora_rank=2",
        "--model.image.hidden_size=32", "--model.image.num_layers=2",
        "--model.image.num_heads=4", "--model.image.intermediate_size=64",
        "--model.packer.max_tok=24",
        "--model.packer.max_chunks_per_sample=2",
        "--model.packer.fixed_sent_count=6",
        "--reference-ckpt", pt_path,
    ]
    assert cli_main(["eval"] + flags) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    res = json.loads(lines[-1])
    assert res["n"] == 16
    report = "\n".join(lines)
    assert "missing" in report  # load report printed


def test_convert_reference_checkpoint_shared_base():
    """model.shared_text_base: the converter merges the two (equal-base)
    towers into the text_experts layout; diverged bases raise."""
    import copy

    import jax
    cfg = tiny_config("baseline")
    mc = cfg.model
    mc.shared_text_base = True
    rng = np.random.default_rng(0)
    d = mc.d
    user_sd = {"encoder." + k: v for k, v in _bert_sd(rng, mc.text).items()}
    # same frozen base (the reference invariant), fresh per-side LoRA
    item_sd = copy.deepcopy(user_sd)
    for k in item_sd:
        if "lora_A" in k or "lora_B" in k:
            item_sd[k] = rng.normal(size=item_sd[k].shape).astype(np.float32)
    ckpt = {
        "user": user_sd,
        "item": item_sd,
        "img": ({"backbone." + k: v for k, v in _vit_sd(rng, mc.image).items()}
                | _flat("norm", _ln(rng, d), {})),
        "cross_ui": _cross_sd(rng, d),
        "concat_ui": _fuse_sd(rng, d),
        "concat_ti": _fuse_sd(rng, d),
        "head": _head_sd(rng, d, mc.tower_hidden),
    }
    for side in ("user", "item"):
        _flat("norm", _ln(rng, d), ckpt[side])

    params, stats = hf_convert.convert_reference_checkpoint(ckpt, mc)
    assert stats is None

    from mmoe_multimodal_rec_tpu.models.mmoe import MMoERecModel
    from mmoe_multimodal_rec_tpu.train.loop import dummy_batch
    model = MMoERecModel(mc)
    batch = dummy_batch(cfg, batch_size=2)
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0), batch)["params"]
    assert jax.tree.map(lambda x: x.shape, ref) == \
        jax.tree.map(lambda x: np.shape(x), params)
    out = model.apply({"params": params}, batch)
    assert np.all(np.isfinite(np.asarray(out.logit_good)))

    # a checkpoint whose bases diverge must refuse the shared layout
    ckpt["item"]["encoder.embeddings.word_embeddings.weight"] = \
        ckpt["item"]["encoder.embeddings.word_embeddings.weight"] + 1.0
    with pytest.raises(ValueError, match="diverge"):
        hf_convert.convert_reference_checkpoint(ckpt, mc)

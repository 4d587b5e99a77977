"""Full-scale converter proof (VERDICT r3 next#3).

Builds a RANDOM-INIT torch checkpoint in the exact reference layout at FULL
size — BGE-base dims (12 layers, d=768, 30522+1 vocab incl. the <SENT> row,
peft LoRA r=8 on query/value) x2 text experts, ViT-base, the cross/fuse
experts and the task head, saved as the dict train.py:351-363 /
train_HoME.py:432-449 write — then proves the WHOLE offline conversion
recipe on it:

  1. `utils/hf_convert.convert_reference_checkpoint` + `load_into` against
     the full-size model's init tree: ZERO missing / ZERO unexpected keys
     (shape mismatches count as unexpected);
  2. conversion wall-clock + peak RSS + checkpoint file size, so the
     published-checkpoint recipe has measured costs for every step but the
     download itself;
  3. optionally (--eval) the real CLI: `eval --reference-ckpt ckpt.pt` over
     synthetic shards, asserting a finite AUC end to end.

The reference classes are IMPORTED AND EXECUTED from /root/reference (same
technique as tests/test_parity_full_model.py), so the state-dict key layout
is the reference's own, not a transcription.

Run: python tools/convert_fullsize_check.py [--variant both] [--eval]
Prints one JSON line per variant; BENCHMARKS.md quotes the results.
"""
from __future__ import annotations

import argparse
import importlib.machinery
import importlib.util
import json
import os
import resource
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_DIR = "/root/reference"
sys.path.insert(0, REPO)


class _AnyModule(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        val = type(name, (), {})
        setattr(self, name, val)
        return val


def _stub_missing(names):
    for name in names:
        if name in sys.modules:
            continue
        try:
            if importlib.util.find_spec(name) is not None:
                continue
        except (ImportError, ModuleNotFoundError, ValueError):
            pass
        mod = _AnyModule(name)
        mod.__path__ = []
        sys.modules[name] = mod


def load_reference_module(filename: str, modname: str = None):
    """Import /root/reference/<filename>, stubbing deps absent from this
    image (webdataset, nltk, emoji...; torch/transformers/peft are real)."""
    modname = modname or "ref_" + filename.replace(".", "_")
    if modname in sys.modules:
        return sys.modules[modname]
    _stub_missing(["webdataset", "nltk", "nltk.tokenize", "emoji",
                   "sklearn", "sklearn.metrics", "matplotlib",
                   "matplotlib.pyplot", "httpx", "apache_beam",
                   "google", "google.cloud", "google.cloud.storage"])
    path = os.path.join(REFERENCE_DIR, filename)
    loader = importlib.machinery.SourceFileLoader(modname, path)
    spec = importlib.util.spec_from_loader(modname, loader)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


class _Tok:
    pad_token_id = 0


def _full_bert(tcfg):
    """BGE-base-shaped BertModel (random init) + resize for <SENT> + peft
    LoRA, in the reference factory's order (ref model.py:593-600)."""
    import torch
    from transformers import BertConfig, BertModel
    from peft import LoraConfig, TaskType, get_peft_model
    bc = BertConfig(
        vocab_size=tcfg.vocab_size - 1,  # 30522; +1 <SENT> row via resize
        hidden_size=tcfg.hidden_size, num_hidden_layers=tcfg.num_layers,
        num_attention_heads=tcfg.num_heads,
        intermediate_size=tcfg.intermediate_size,
        max_position_embeddings=tcfg.max_position_embeddings,
        type_vocab_size=tcfg.type_vocab_size, pad_token_id=0,
        layer_norm_eps=tcfg.layer_norm_eps)
    enc = BertModel(bc)
    enc.resize_token_embeddings(tcfg.vocab_size)
    lc = LoraConfig(task_type=TaskType.FEATURE_EXTRACTION,
                    r=tcfg.lora_rank, lora_alpha=int(tcfg.lora_alpha),
                    lora_dropout=tcfg.lora_dropout,
                    target_modules=list(tcfg.lora_targets))
    enc = get_peft_model(enc, lc)
    for name, p in enc.named_parameters():
        if "lora_" in name:  # fresh peft B=0 would hide conversion bugs
            torch.nn.init.normal_(p, std=0.02)
    return enc


def _full_vit(icfg):
    from transformers import ViTConfig, ViTModel
    vc = ViTConfig(
        hidden_size=icfg.hidden_size, num_hidden_layers=icfg.num_layers,
        num_attention_heads=icfg.num_heads,
        intermediate_size=icfg.intermediate_size,
        image_size=224, patch_size=16, layer_norm_eps=icfg.layer_norm_eps)
    return ViTModel(vc, add_pooling_layer=False)


def build_fullsize_ckpt(variant: str) -> dict:
    """Random-init torch checkpoint dict in the exact reference layout
    (ref train.py:351-363 baseline / train_HoME.py:432-449 HoME)."""
    import torch
    from mmoe_multimodal_rec_tpu.config import Config
    cfg = Config()
    cfg.model.variant = variant
    m = cfg.model
    ref = (load_reference_module("model_HoME.py", "model_HoME")
           if variant == "home" else load_reference_module("model.py"))
    torch.manual_seed(0)
    user = ref.TextExpert(_full_bert(m.text), _Tok(),
                          max_tok=m.packer.max_tok, d=m.d)
    item = ref.TextExpert(_full_bert(m.text), _Tok(),
                          max_tok=m.packer.max_tok, d=m.d)
    cross_ui = ref.RobustTextCrossExpert(d=m.d, n_layer=m.cross_layers,
                                         n_head=m.cross_heads,
                                         dropout=m.dropout)
    concat_ui = ref.EnhancedCrossFuse(d=m.d, n_head=m.fuse_heads,
                                      depth=m.fuse_depth, dropout=m.dropout)
    concat_ti = ref.EnhancedCrossFuse(d=m.d, n_head=m.fuse_heads,
                                      depth=m.fuse_depth, dropout=m.dropout)
    modules = dict(user=user, item=item, cross_ui=cross_ui,
                   concat_ui=concat_ui, concat_ti=concat_ti)
    if variant == "home":
        ref_train = load_reference_module("train_HoME.py")
        modules["img"] = ref.ImageExpertWithProjection(
            _full_vit(m.image), expert_dim=m.d, projection_dim=m.d)
        modules["head"] = ref.HOME_MMoE_Complete(
            num_input_experts=m.n_experts, expert_dim=m.d,
            n_shared_experts=m.home_shared_experts,
            n_task_experts=m.home_task_experts,
            tower_hidden=m.home_tower_hidden)
        for name in ("u_doc_wrapper", "i_doc_wrapper", "img_vec_wrapper",
                     "ui_vec_wrapper", "xui_wrapper", "xti_wrapper"):
            modules[name] = ref_train.HomeExpertWrapper(m.d,
                                                        dropout_p=m.dropout)
    else:
        modules["img"] = ref.ItemImageExpert(_full_vit(m.image),
                                             pool_type=m.image.pool_type,
                                             dropout_p=m.dropout)
        modules["head"] = ref.TwoTaskMMoE(expert_dim=m.d,
                                          n_expert=m.n_experts,
                                          tower_hidden=m.tower_hidden,
                                          tower_dropout=m.tower_dropout)
    # randomize norm/BN params (ones/zeros init would hide scale/bias swaps)
    import torch.nn as nn
    for mod in modules.values():
        for sub in mod.modules():
            if isinstance(sub, (nn.LayerNorm, nn.BatchNorm1d)):
                sub.weight.data.uniform_(0.5, 1.5)
                sub.bias.data.normal_(0, 0.2)
            if isinstance(sub, nn.BatchNorm1d):
                sub.running_mean.normal_(0, 0.3)
                sub.running_var.uniform_(0.5, 1.5)
    ckpt = {"epoch": 0, "optimizer": {}, "scheduler": {}}
    ckpt.update({k: v.state_dict() for k, v in modules.items()})
    return ckpt


def check_conversion(variant: str, ckpt: dict) -> dict:
    """Convert at full size and merge over the full-size init tree built
    via jax.eval_shape (structure only — no XLA compile, no FLOPs)."""
    import jax
    import numpy as np
    from mmoe_multimodal_rec_tpu.config import Config
    from mmoe_multimodal_rec_tpu.models.mmoe import MMoERecModel
    from mmoe_multimodal_rec_tpu.train.loop import dummy_batch
    from mmoe_multimodal_rec_tpu.utils import hf_convert

    cfg = Config()
    cfg.model.variant = variant
    cfg.train.batch_size = 4
    cfg.model.packer.chunk_budget = 8
    model = MMoERecModel(cfg.model)
    batch = dummy_batch(cfg, batch_size=4)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), batch)
    init = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)

    t0 = time.perf_counter()
    conv_params, conv_stats = hf_convert.convert_reference_checkpoint(
        ckpt, cfg.model)
    merged, missing, unexpected = hf_convert.load_into(
        init["params"], conv_params)
    report = {"convert_wall_s": round(time.perf_counter() - t0, 2),
              "missing": missing, "unexpected": unexpected}
    if variant == "home":
        assert conv_stats is not None
        _, s_missing, s_unexpected = hf_convert.load_into(
            init["batch_stats"], conv_stats)
        report["missing"] += s_missing
        report["unexpected"] += s_unexpected
    n_params = sum(int(np.size(x)) for x in jax.tree.leaves(merged))
    report["n_params"] = n_params
    return report


def run_cli_eval(variant: str, ckpt_path: str, tmp: str) -> dict:
    """The real user recipe: `eval --reference-ckpt` over synthetic shards."""
    import subprocess
    from mmoe_multimodal_rec_tpu.data.synthetic import write_synthetic_shards
    shards_dir = os.path.join(tmp, "shards")
    write_synthetic_shards(shards_dir, n_samples=16, samples_per_shard=8)
    cmd = [sys.executable, "-m", "mmoe_multimodal_rec_tpu", "eval",
           "--reference-ckpt", ckpt_path,
           f"--data.valid_pattern={shards_dir}/*.tar.gz",
           "--data.allow_hash_tokenizer=true",
           f"--model.variant={variant}",
           "--train.batch_size=8", "--model.packer.chunk_budget=16",
           f"--train.output_dir={os.path.join(tmp, 'out')}"]
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError(f"eval failed rc={proc.returncode}:\n"
                           f"{proc.stderr[-2000:]}")
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert 0.0 <= out["auc_good"] <= 1.0, out
    assert 0.0 <= out["auc_best"] <= 1.0, out
    return {"eval_wall_s": round(wall, 1), **out}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="both",
                    choices=["both", "baseline", "home"])
    ap.add_argument("--eval", action="store_true",
                    help="also run the real CLI eval --reference-ckpt "
                         "(full-size forward; minutes of compile)")
    ap.add_argument("--out", default=None,
                    help="keep artifacts here instead of a temp dir")
    args = ap.parse_args()
    import tempfile
    import torch

    variants = (["baseline", "home"] if args.variant == "both"
                else [args.variant])
    for variant in variants:
        tmp = args.out or tempfile.mkdtemp(prefix=f"fullconv_{variant}_")
        os.makedirs(tmp, exist_ok=True)
        t0 = time.perf_counter()
        ckpt = build_fullsize_ckpt(variant)
        build_s = time.perf_counter() - t0
        path = os.path.join(tmp, f"ckpt_{variant}.pt")
        t0 = time.perf_counter()
        torch.save(ckpt, path)
        save_s = time.perf_counter() - t0
        report = check_conversion(variant, ckpt)
        assert not report["missing"], report["missing"][:20]
        assert not report["unexpected"], report["unexpected"][:20]
        result = {
            "variant": variant,
            "ckpt_file_mb": round(os.path.getsize(path) / 2**20, 1),
            "build_wall_s": round(build_s, 1),
            "torch_save_wall_s": round(save_s, 1),
            "convert_wall_s": report["convert_wall_s"],
            "n_params_merged": report["n_params"],
            "missing_keys": 0, "unexpected_keys": 0,
            "peak_rss_gb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20,
                2),
        }
        if args.eval:
            result.update(run_cli_eval(variant, path, tmp))
        print(json.dumps(result), flush=True)
        if not args.out:
            import shutil
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

"""AUC-LEVEL parity vs the reference's executed eval pipeline (VERDICT r2 #3).

test_parity_full_model pins fp32 *logit* parity on one batch; this test pins
the quantity the whole project is gated on — the AUC — end to end from tar
shard bytes:

  reference side: the eval loop of inference_and_auc.py:130-182 with every
  reference-owned stage EXECUTED — model.py's decode_sample (image
  reconstruction + ImageNet normalize), preprocess_batch, the module
  forwards, sigmoid accumulation, and the very `roc_auc_score` symbol the
  reference imports (real sklearn, resolved by executing its own import).
  Only the WebDataset DataLoader shell is replicated inline (the package is
  absent in this image): iterate tar members -> decode_sample -> drop None ->
  fixed-size batches with a short trailing batch, exactly
  make_eval_loader's stream (inference_and_auc.py:25-42).

  our side: the real `evaluate()` entry (eval/evaluate.py) over the same
  shard files — threaded loader, padded trailing batch + valid mask, jit
  eval steps, streaming AUC (eval/auc.py).

Weights flow reference -> ours through utils/hf_convert (the same converter
used for the published checkpoints), so this also covers the converter at
full pipeline depth.  Rank stability is asserted (min pairwise prob gap >>
fp32 logit tolerance), which makes AUC equality exact, not approximate.
"""
import numpy as np
import pytest
import torch

import jax

from util import (HFTokenizerShim, load_reference_module, tiny_config)

from mmoe_multimodal_rec_tpu.data.packer import TextPacker
from mmoe_multimodal_rec_tpu.data.sentence import split_sentences
from mmoe_multimodal_rec_tpu.data.synthetic import write_synthetic_shards
from mmoe_multimodal_rec_tpu.data.tar_io import iter_shard
from mmoe_multimodal_rec_tpu.data.wordpiece import HashTokenizer
from mmoe_multimodal_rec_tpu.eval import evaluate
from mmoe_multimodal_rec_tpu.models.mmoe import MMoERecModel
from mmoe_multimodal_rec_tpu.train import split_trainable
from mmoe_multimodal_rec_tpu.utils import hf_convert

from test_parity_full_model import _Tok, _randomize_norms, _small_bert

torch.manual_seed(0)

N_SAMPLES = 40
BATCH = 7            # 40 = 5*7 + 5 -> short trailing batch on both sides


def _vit224(icfg):
    """Tiny-hidden ViT over REAL 224x224/16 geometry (196 patches), so the
    shards' full-size patch rows exercise the production image path."""
    from transformers import ViTConfig, ViTModel
    vc = ViTConfig(
        hidden_size=icfg.hidden_size, num_hidden_layers=icfg.num_layers,
        num_attention_heads=icfg.num_heads,
        intermediate_size=icfg.intermediate_size,
        image_size=224, patch_size=16, layer_norm_eps=icfg.layer_norm_eps)
    return ViTModel(vc, add_pooling_layer=False)


def _build_reference_modules(ref, cfg):
    m = cfg.model
    d = m.d
    mods = dict(
        user=ref.TextExpert(_small_bert(m.text), _Tok(),
                            max_tok=m.packer.max_tok, d=d),
        item=ref.TextExpert(_small_bert(m.text), _Tok(),
                            max_tok=m.packer.max_tok, d=d),
        img=ref.ItemImageExpert(_vit224(m.image), pool_type="mean",
                                dropout_p=m.dropout),
        cross_ui=ref.RobustTextCrossExpert(d=d, n_layer=m.cross_layers,
                                           n_head=m.cross_heads,
                                           dropout=m.dropout),
        concat_ui=ref.EnhancedCrossFuse(d=d, n_head=m.fuse_heads,
                                        depth=m.fuse_depth,
                                        dropout=m.dropout),
        concat_ti=ref.EnhancedCrossFuse(d=d, n_head=m.fuse_heads,
                                        depth=m.fuse_depth,
                                        dropout=m.dropout),
        head=ref.TwoTaskMMoE(expert_dim=d, n_expert=m.n_experts,
                             tower_hidden=m.tower_hidden,
                             tower_dropout=m.tower_dropout),
    )
    for mod in mods.values():
        _randomize_norms(mod)
        mod.eval()
    # spread the logits: random tiny-dim weights give a near-degenerate
    # ~1e-5 prob spread, which would make AUC-rank stability hostage to
    # float noise; inflating the tower linears restores O(1e-2) gaps
    with torch.no_grad():
        for lin in [mm for mm in mods["head"].modules()
                    if isinstance(mm, torch.nn.Linear)]:
            lin.weight *= 4.0
            lin.bias.normal_(0, 0.5)
    return mods


def _reference_eval(ref, refmod_auc, mods, shards, tokenizer, max_tok,
                    fixed_sent_count, max_chunks):
    """inference_and_auc.py:130-182, executed stage by stage (see module
    docstring for the one replicated shell)."""
    decoded = []
    for path in shards:
        for raw in iter_shard(path):
            s = ref.decode_sample(raw)           # executed reference decode
            if s is not None:
                decoded.append(s)
    preds_g, labels_g, preds_b, labels_b = [], [], [], []
    logits_g, logits_b = [], []
    for i in range(0, len(decoded), BATCH):
        batch = decoded[i:i + BATCH]
        with torch.no_grad():
            texts_u = [b["user_text"] for b in batch]
            texts_i = [b["item_text"] for b in batch]
            patches = torch.stack([b["patch"] for b in batch])
            y_good = torch.tensor([b["label_good"] for b in batch])
            y_best = torch.tensor([b["label_best"] for b in batch])
            in_u, c2s_u, pos_u, max_s_u = ref.preprocess_batch(
                texts_u, tokenizer, max_tok=max_tok,
                max_chunks_per_sample=max_chunks,
                fixed_sent_count=fixed_sent_count)
            in_i, c2s_i, pos_i, max_s_i = ref.preprocess_batch(
                texts_i, tokenizer, max_tok=max_tok,
                max_chunks_per_sample=max_chunks,
                fixed_sent_count=fixed_sent_count)
            u_sent, u_mask, u_doc = mods["user"](in_u, c2s_u, pos_u, max_s_u,
                                                 trainable=False)
            i_sent, i_mask, i_doc = mods["item"](in_i, c2s_i, pos_i, max_s_i,
                                                 trainable=False)
            img_vec = mods["img"](patches, trainable=False)
            ui_vec = mods["cross_ui"](u_sent, u_mask, i_sent, i_mask)
            xui = mods["concat_ui"](u_doc, img_vec)
            xti = mods["concat_ti"](i_doc, img_vec)
            expert_vecs = torch.stack(
                [u_doc, i_doc, img_vec, ui_vec, xui, xti], dim=1)
            logit_g, logit_b = mods["head"](expert_vecs)
        preds_g.append(torch.sigmoid(logit_g).numpy())
        labels_g.append(y_good.numpy())
        preds_b.append(torch.sigmoid(logit_b).numpy())
        labels_b.append(y_best.numpy())
        logits_g.append(logit_g.numpy())
        logits_b.append(logit_b.numpy())
    pg, lg = np.concatenate(preds_g), np.concatenate(labels_g)
    pb, lb = np.concatenate(preds_b), np.concatenate(labels_b)
    # the reference's own roc_auc_score symbol (real sklearn)
    auc_g = refmod_auc.roc_auc_score(lg, pg)
    auc_b = refmod_auc.roc_auc_score(lb, pb)
    return dict(auc_good=float(auc_g), auc_best=float(auc_b),
                logits_good=np.concatenate(logits_g),
                logits_best=np.concatenate(logits_b), n=len(pg))


@pytest.mark.slow
def test_auc_parity_baseline(tmp_path):
    import sys
    ref = load_reference_module("model.py")
    # inference_and_auc.py does `from model import ...` — alias the loaded
    # reference module under that name for the duration of its import
    sys.modules.setdefault("model", ref)
    try:
        refmod_auc = load_reference_module("inference_and_auc.py")
    finally:
        if sys.modules.get("model") is ref:
            del sys.modules["model"]
    assert "sklearn" in refmod_auc.roc_auc_score.__module__

    cfg = tiny_config("baseline")
    cfg.model.use_flash_attention = False
    cfg.model.compute_dtype = "float32"
    m = cfg.model

    shards = write_synthetic_shards(str(tmp_path / "shards"),
                                    n_samples=N_SAMPLES,
                                    samples_per_shard=16, seed=11)
    tok = HashTokenizer(vocab_size=m.text.vocab_size - 1)

    mods = _build_reference_modules(ref, cfg)
    # punkt data is absent -> inject our splitter into the executed module,
    # identically to what the packer uses below
    orig_split = ref.nltk_sentence_split
    ref.nltk_sentence_split = split_sentences
    try:
        want = _reference_eval(ref, refmod_auc, mods, shards,
                               HFTokenizerShim(tok), m.packer.max_tok,
                               m.packer.fixed_sent_count,
                               m.packer.max_chunks_per_sample)
    finally:
        ref.nltk_sentence_split = orig_split
    assert want["n"] == N_SAMPLES

    # rank-stability guard (in LOGIT space — sigmoid is strictly monotone,
    # so AUC ranks are logit ranks, and ~1e-4 is the fp32 cross-framework
    # logit tolerance test_parity_full_model pins): require every pairwise
    # gap far above the tolerance so AUC equality is exact by construction
    # rather than luck
    for key in ("logits_good", "logits_best"):
        z = np.sort(want[key])
        min_gap = np.min(np.diff(z))
        assert min_gap > 1e-3, f"{key}: min pairwise logit gap {min_gap:.2e}"

    ckpt = {k: v.state_dict() for k, v in mods.items()}
    model = MMoERecModel(m)
    packer = TextPacker(tok, m.packer, splitter=split_sentences)

    conv_params, conv_stats = hf_convert.convert_reference_checkpoint(
        ckpt, m)
    # template init on a real batch
    from mmoe_multimodal_rec_tpu.train.loop import dummy_batch
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    dummy_batch(cfg, batch_size=BATCH))
    params, missing, unexpected = hf_convert.load_into(
        variables["params"], conv_params)
    assert not missing and not unexpected, (missing, unexpected)
    trainable, frozen = split_trainable(params, "baseline")

    got = evaluate(cfg, model, trainable, frozen, {}, shards,
                   packer=packer, batch_size=BATCH)
    assert got["n"] == N_SAMPLES
    assert abs(got["good"] - want["auc_good"]) < 1e-9, \
        (got["good"], want["auc_good"])
    assert abs(got["best"] - want["auc_best"]) < 1e-9, \
        (got["best"], want["auc_best"])

"""WHOLE-MODEL parity vs the reference's own executed code.

Imports the actual reference classes from /root/reference/model.py /
model_HoME.py / train_HoME.py (via tests/util.load_reference_module), builds
them at tiny dims with random torch weights, runs the reference's real
forward — including its python chunk->sample bucket loop
(model.py:302-327) — converts every state_dict through utils/hf_convert, and
asserts fp32 logit parity for BOTH variants on the same decoded batch.

This is the strongest AUC-parity evidence obtainable offline: if the full
forward graph matches the reference's executed code at the logit level for
random weights, the published checkpoints produce the same AUC up to
numerics (ref model.py:227-338, 527-577; model_HoME.py:530-638;
train.py:242-251; train_HoME.py:344-357).
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from util import load_reference_module, tiny_config, tiny_tokenizer

from mmoe_multimodal_rec_tpu.data.packer import TextPacker
from mmoe_multimodal_rec_tpu.models.mmoe import MMoERecModel
from mmoe_multimodal_rec_tpu.utils import hf_convert

torch.manual_seed(0)

GRID = 2      # tiny ViT: 2x2 grid of 16x16 patches (image_size=32)
N_PATCH = GRID * GRID


# ---------------------------------------------------------------------------
# batch construction (shared by both variants)
# ---------------------------------------------------------------------------

USER_TEXTS = [
    "the quick brown fox jumps. it was a sunny day. great product overall.",
    "terrible fit and bad seams. returned it twice. would not buy again. "
    "customer service was slow to respond with updates.",
    "short review.",
    "love the colors and the stitching quality. arrived early. "
    "my kids use it daily for soccer practice. holds up well in rain. "
    "the straps are adjustable and comfortable.",
]
ITEM_TEXTS = [
    "waterproof hiking backpack with padded straps. fits laptops.",
    "running shoes with breathable mesh. lightweight design for racing.",
    "yoga mat.",
    "camping tent for four people. easy setup in five minutes. "
    "includes rain fly and stakes. compact when folded.",
]


def _make_batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    b = len(USER_TEXTS)
    packer = TextPacker(tiny_tokenizer(cfg), cfg.model.packer)
    budget = b * cfg.model.packer.max_chunks_per_sample
    user = packer.pack(USER_TEXTS, budget)
    item = packer.pack(ITEM_TEXTS, budget)
    patches = rng.integers(0, 256, (b, N_PATCH, 768)).astype(np.uint8)
    has_image = np.array([1, 1, 0, 1], np.int32)
    return {
        "user_tokens": user.tokens, "user_sent_chunk": user.sent_chunk,
        "user_sent_tok": user.sent_tok,
        "item_tokens": item.tokens, "item_sent_chunk": item.sent_chunk,
        "item_sent_tok": item.sent_tok,
        "patches": patches, "has_image": has_image,
        "label_good": np.zeros(b, np.float32),
        "label_best": np.zeros(b, np.float32),
    }


def _static_to_dynamic(tokens, sent_chunk, sent_tok, pad_id=0):
    """Convert the packer's static routing tensors into the reference
    preprocess_batch output format (input_ids, chunk2sample, sent_pos)."""
    n, _ = tokens.shape
    b, s = sent_chunk.shape
    owner = {}
    per_chunk_pos = {}
    for bi in range(b):
        for si in range(s):
            c = int(sent_chunk[bi, si])
            if c < 0:
                continue
            owner[c] = bi
            per_chunk_pos.setdefault(c, []).append(int(sent_tok[bi, si]))
    used = sorted(owner)
    # the packer assigns chunk rows sample-major, matching the reference's
    # append order (model.py:68-94)
    assert used == list(range(len(used)))
    input_ids = [tokens[c].tolist() for c in used]
    chunk2sample = [owner[c] for c in used]
    max_sents = max(len(per_chunk_pos[c]) for c in used)
    sent_pos = [per_chunk_pos[c] + [-1] * (max_sents - len(per_chunk_pos[c]))
                for c in used]
    return input_ids, chunk2sample, sent_pos


def _patch_rows_to_images(patches, has_image, grid=GRID, p=16):
    """Reference image path: reconstruct [B,3,gp,gp] from patch rows and apply
    decode_sample's /255 + ImageNet normalization for has_image rows
    (model.py:161-174); zero image otherwise."""
    mean = np.array([0.485, 0.456, 0.406], np.float32).reshape(3, 1, 1)
    std = np.array([0.229, 0.224, 0.225], np.float32).reshape(3, 1, 1)
    out = []
    for rows, h in zip(patches, has_image):
        if not h:
            out.append(np.zeros((3, grid * p, grid * p), np.float32))
            continue
        img = rows.reshape(grid * grid, 3, p, p).astype(np.float32)
        img = img.reshape(grid, grid, 3, p, p).transpose(2, 0, 3, 1, 4)
        img = img.reshape(3, grid * p, grid * p) / 255.0
        out.append((img - mean) / std)
    return torch.tensor(np.stack(out))


# ---------------------------------------------------------------------------
# reference module builders
# ---------------------------------------------------------------------------

class _Tok:
    pad_token_id = 0


def _small_bert(tcfg):
    from transformers import BertConfig, BertModel
    from peft import LoraConfig, TaskType, get_peft_model
    bc = BertConfig(
        vocab_size=tcfg.vocab_size, hidden_size=tcfg.hidden_size,
        num_hidden_layers=tcfg.num_layers,
        num_attention_heads=tcfg.num_heads,
        intermediate_size=tcfg.intermediate_size,
        max_position_embeddings=tcfg.max_position_embeddings,
        type_vocab_size=tcfg.type_vocab_size, pad_token_id=0,
        layer_norm_eps=tcfg.layer_norm_eps)
    enc = BertModel(bc)
    lc = LoraConfig(task_type=TaskType.FEATURE_EXTRACTION,
                    r=tcfg.lora_rank, lora_alpha=int(tcfg.lora_alpha),
                    lora_dropout=tcfg.lora_dropout,
                    target_modules=list(tcfg.lora_targets))
    enc = get_peft_model(enc, lc)
    # exercise the LoRA path: fresh peft has B = 0 which would contribute
    # nothing — randomize both factors
    for name, p in enc.named_parameters():
        if "lora_" in name:
            torch.nn.init.normal_(p, std=0.2)
    return enc


def _small_vit(icfg):
    from transformers import ViTConfig, ViTModel
    vc = ViTConfig(
        hidden_size=icfg.hidden_size, num_hidden_layers=icfg.num_layers,
        num_attention_heads=icfg.num_heads,
        intermediate_size=icfg.intermediate_size,
        image_size=GRID * 16, patch_size=16,
        layer_norm_eps=icfg.layer_norm_eps)
    return ViTModel(vc, add_pooling_layer=False)


def _randomize_norms(module):
    """LayerNorm/BatchNorm weights init to ones/zeros, which would hide
    scale/bias swap bugs in conversion — randomize them (and BN running
    stats)."""
    for m in module.modules():
        if isinstance(m, (torch.nn.LayerNorm, torch.nn.BatchNorm1d)):
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.normal_(0, 0.2)
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 1.5)


def _run_our_model(cfg, batch, ckpt, batch_stats_conv=None):
    model = MMoERecModel(cfg.model)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(jax.random.PRNGKey(0), jb)
    conv_params, conv_stats = hf_convert.convert_reference_checkpoint(
        ckpt, cfg.model)
    params, missing, unexpected = hf_convert.load_into(
        variables["params"], conv_params)
    assert not missing, missing
    assert not unexpected, unexpected
    vars_in = {"params": params}
    if conv_stats is not None:
        stats, s_missing, s_unexpected = hf_convert.load_into(
            variables["batch_stats"], conv_stats)
        assert not s_missing and not s_unexpected, (s_missing, s_unexpected)
        vars_in["batch_stats"] = stats
    out = model.apply(vars_in, jb, deterministic=True)
    return np.asarray(out.logit_good), np.asarray(out.logit_best)


# ---------------------------------------------------------------------------
# baseline variant (model.py + train.py:242-251 wiring)
# ---------------------------------------------------------------------------

def test_full_model_parity_baseline():
    ref = load_reference_module("model.py")
    cfg = tiny_config("baseline")
    cfg.model.use_flash_attention = False
    cfg.model.compute_dtype = "float32"
    cfg.model.image.num_patches = N_PATCH
    tcfg, icfg, m = cfg.model.text, cfg.model.image, cfg.model
    d, S = m.d, m.packer.fixed_sent_count
    batch = _make_batch(cfg)

    user_expert = ref.TextExpert(_small_bert(tcfg), _Tok(),
                                 max_tok=m.packer.max_tok, d=d)
    item_expert = ref.TextExpert(_small_bert(tcfg), _Tok(),
                                 max_tok=m.packer.max_tok, d=d)
    img_expert = ref.ItemImageExpert(_small_vit(icfg), pool_type="mean",
                                     dropout_p=m.dropout)
    cross_ui = ref.RobustTextCrossExpert(d=d, n_layer=m.cross_layers,
                                         n_head=m.cross_heads,
                                         dropout=m.dropout)
    concat_ui = ref.EnhancedCrossFuse(d=d, n_head=m.fuse_heads,
                                      depth=m.fuse_depth, dropout=m.dropout)
    concat_ti = ref.EnhancedCrossFuse(d=d, n_head=m.fuse_heads,
                                      depth=m.fuse_depth, dropout=m.dropout)
    head = ref.TwoTaskMMoE(expert_dim=d, n_expert=m.n_experts,
                           tower_hidden=m.tower_hidden,
                           tower_dropout=m.tower_dropout)
    modules = dict(user=user_expert, item=item_expert, img=img_expert,
                   cross_ui=cross_ui, concat_ui=concat_ui,
                   concat_ti=concat_ti, head=head)
    for mod in modules.values():
        _randomize_norms(mod)
        mod.eval()

    with torch.no_grad():
        ids_u, c2s_u, pos_u = _static_to_dynamic(
            batch["user_tokens"], batch["user_sent_chunk"],
            batch["user_sent_tok"])
        ids_i, c2s_i, pos_i = _static_to_dynamic(
            batch["item_tokens"], batch["item_sent_chunk"],
            batch["item_sent_tok"])
        u_sent, u_mask, u_doc = user_expert(ids_u, c2s_u, pos_u, S)
        i_sent, i_mask, i_doc = item_expert(ids_i, c2s_i, pos_i, S)
        images = _patch_rows_to_images(batch["patches"], batch["has_image"])
        img_vec = img_expert(images)
        ui_vec = cross_ui(u_sent, u_mask, i_sent, i_mask)
        xui = concat_ui(u_doc, img_vec)
        xti = concat_ti(i_doc, img_vec)
        expert_vecs = torch.stack([u_doc, i_doc, img_vec, ui_vec, xui, xti],
                                  dim=1)
        want_good, want_best = head(expert_vecs)

    ckpt = {k: v.state_dict() for k, v in modules.items()}
    got_good, got_best = _run_our_model(cfg, batch, ckpt)
    np.testing.assert_allclose(got_good, want_good.numpy(), atol=1e-4)
    np.testing.assert_allclose(got_best, want_best.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# HoME variant (model_HoME.py + train_HoME.py:344-357 wiring incl. BN wrappers)
# ---------------------------------------------------------------------------

def test_full_model_parity_home():
    ref = load_reference_module("model_HoME.py", modname="model_HoME")
    ref_train = load_reference_module("train_HoME.py")
    cfg = tiny_config("home")
    cfg.model.use_flash_attention = False
    cfg.model.compute_dtype = "float32"
    cfg.model.image.num_patches = N_PATCH
    # the reference ExpertMLP hardcodes hidden=1024 (model_HoME.py:28-35)
    cfg.model.home_expert_hidden = 1024
    tcfg, icfg, m = cfg.model.text, cfg.model.image, cfg.model
    d, S = m.d, m.packer.fixed_sent_count
    batch = _make_batch(cfg, seed=1)

    user_expert = ref.TextExpert(_small_bert(tcfg), _Tok(),
                                 max_tok=m.packer.max_tok, d=d)
    item_expert = ref.TextExpert(_small_bert(tcfg), _Tok(),
                                 max_tok=m.packer.max_tok, d=d)
    img_expert = ref.ImageExpertWithProjection(_small_vit(icfg),
                                               expert_dim=d,
                                               projection_dim=d)
    cross_ui = ref.RobustTextCrossExpert(d=d, n_layer=m.cross_layers,
                                         n_head=m.cross_heads,
                                         dropout=m.dropout)
    concat_ui = ref.EnhancedCrossFuse(d=d, n_head=m.fuse_heads,
                                      depth=m.fuse_depth, dropout=m.dropout)
    concat_ti = ref.EnhancedCrossFuse(d=d, n_head=m.fuse_heads,
                                      depth=m.fuse_depth, dropout=m.dropout)
    head = ref.HOME_MMoE_Complete(num_input_experts=m.n_experts,
                                  expert_dim=d,
                                  n_shared_experts=m.home_shared_experts,
                                  n_task_experts=m.home_task_experts,
                                  tower_hidden=m.home_tower_hidden)
    wrappers = {name: ref_train.HomeExpertWrapper(d, dropout_p=m.dropout)
                for name in ("u_doc_wrapper", "i_doc_wrapper",
                             "img_vec_wrapper", "ui_vec_wrapper",
                             "xui_wrapper", "xti_wrapper")}
    modules = dict(user=user_expert, item=item_expert, img=img_expert,
                   cross_ui=cross_ui, concat_ui=concat_ui,
                   concat_ti=concat_ti, head=head, **wrappers)
    for mod in modules.values():
        _randomize_norms(mod)
        mod.eval()

    with torch.no_grad():
        ids_u, c2s_u, pos_u = _static_to_dynamic(
            batch["user_tokens"], batch["user_sent_chunk"],
            batch["user_sent_tok"])
        ids_i, c2s_i, pos_i = _static_to_dynamic(
            batch["item_tokens"], batch["item_sent_chunk"],
            batch["item_sent_tok"])
        u_sent, u_mask, u_doc = user_expert(ids_u, c2s_u, pos_u, S)
        i_sent, i_mask, i_doc = item_expert(ids_i, c2s_i, pos_i, S)
        images = _patch_rows_to_images(batch["patches"], batch["has_image"])
        img_vec, _projected = img_expert(images)
        ui_vec = cross_ui(u_sent, u_mask, i_sent, i_mask)
        xui = concat_ui(u_doc, img_vec)
        xti = concat_ti(i_doc, img_vec)
        vecs = dict(u_doc_wrapper=u_doc, i_doc_wrapper=i_doc,
                    img_vec_wrapper=img_vec, ui_vec_wrapper=ui_vec,
                    xui_wrapper=xui, xti_wrapper=xti)
        expert_vecs = torch.stack(
            [wrappers[k](vecs[k]) for k in vecs], dim=1)
        want_good, want_best = head(expert_vecs)

    ckpt = {k: v.state_dict() for k, v in modules.items()}
    got_good, got_best = _run_our_model(cfg, batch, ckpt)
    np.testing.assert_allclose(got_good, want_good.numpy(), atol=1e-4)
    np.testing.assert_allclose(got_best, want_best.numpy(), atol=1e-4)

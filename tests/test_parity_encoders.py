"""Golden parity tests: our flax modules vs random-init torch/HF references.

No network needed — `transformers` models are built from small *configs* with
random weights, converted via utils/hf_convert.py, and compared at fp32.
This validates both the model math and the checkpoint-conversion path
(SURVEY §7.4: golden-parity tests vs reference activations).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from mmoe_multimodal_rec_tpu.config import ImageEncoderConfig, TextEncoderConfig
from mmoe_multimodal_rec_tpu.models import (Attention, BatchNorm1D,
                                            BertEncoder, LoRADense,
                                            PreNormBlock, ViTEncoder)
from mmoe_multimodal_rec_tpu.utils import hf_convert

torch.manual_seed(0)


def _to_jax(x):
    return jnp.asarray(x.detach().numpy())


# ---------------------------------------------------------------------------
# torch nn.MultiheadAttention parity
# ---------------------------------------------------------------------------

def test_attention_matches_torch_mha():
    d, h, b, l = 32, 4, 3, 10
    mha = torch.nn.MultiheadAttention(d, h, dropout=0.0, batch_first=True)
    mha.eval()
    q = torch.randn(b, l, d)
    kv = torch.randn(b, l + 2, d)
    pad = torch.zeros(b, l + 2, dtype=torch.bool)
    pad[:, -3:] = True
    with torch.no_grad():
        want, _ = mha(q, kv, kv, key_padding_mask=pad)

    params = hf_convert._mha(
        {f"x.{k}": v for k, v in mha.state_dict().items()}, "x")
    mod = Attention(num_heads=h, dropout=0.0)
    got = mod.apply({"params": params}, _to_jax(q), _to_jax(kv), _to_jax(kv),
                    jnp.asarray(pad.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# torch TransformerEncoderLayer(norm_first=True) parity (cross/fuse experts)
# ---------------------------------------------------------------------------

def test_prenorm_block_matches_torch_encoder_layer():
    d, h, b, l = 32, 4, 2, 7
    layer = torch.nn.TransformerEncoderLayer(
        d_model=d, nhead=h, dim_feedforward=4 * d, dropout=0.0,
        batch_first=True, norm_first=True)
    layer.eval()
    x = torch.randn(b, l, d)
    pad = torch.zeros(b, l, dtype=torch.bool)
    pad[1, -2:] = True
    with torch.no_grad():
        want = layer(x, src_key_padding_mask=pad)

    sd = {f"blk.{k}": v for k, v in layer.state_dict().items()}
    params = hf_convert._prenorm_block(sd, "blk")
    mod = PreNormBlock(num_heads=h, dropout=0.0)
    got = mod.apply({"params": params}, _to_jax(x), jnp.asarray(pad.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


# ---------------------------------------------------------------------------
# HF BertModel parity (BGE-base architecture)
# ---------------------------------------------------------------------------

def test_bert_encoder_matches_hf():
    from transformers import BertConfig, BertModel
    hf_cfg = BertConfig(vocab_size=120, hidden_size=48, num_hidden_layers=3,
                        num_attention_heads=4, intermediate_size=96,
                        max_position_embeddings=64, type_vocab_size=2,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    hf = BertModel(hf_cfg, add_pooling_layer=False)
    hf.eval()

    cfg = TextEncoderConfig(vocab_size=120, hidden_size=48, num_layers=3,
                            num_heads=4, intermediate_size=96,
                            max_position_embeddings=64, hidden_dropout=0.0,
                            attention_dropout=0.0, lora_rank=0)
    ids = torch.randint(1, 120, (4, 13))
    mask = torch.ones(4, 13, dtype=torch.long)
    mask[0, -4:] = 0
    mask[2, -1:] = 0
    ids[mask == 0] = 0
    with torch.no_grad():
        want = hf(input_ids=ids, attention_mask=mask,
                  token_type_ids=torch.zeros_like(ids),
                  position_ids=torch.arange(13)[None].expand(4, -1)
                  ).last_hidden_state

    params = hf_convert.convert_bert(hf.state_dict(), cfg)
    mod = BertEncoder(cfg)
    got = mod.apply({"params": params}, jnp.asarray(ids.numpy()),
                    jnp.asarray((mask == 0).numpy()))
    # Only compare non-pad positions: HF computes values at pad slots too but
    # downstream never reads them (sentence gather skips pads).
    m = mask.numpy().astype(bool)
    np.testing.assert_allclose(np.asarray(got)[m], want.numpy()[m], atol=3e-5)


def test_bert_with_zeroed_lora_matches_base():
    """LoRA B=0 at init -> encoder output must equal the no-LoRA output."""
    from transformers import BertConfig, BertModel
    hf = BertModel(BertConfig(vocab_size=60, hidden_size=32,
                              num_hidden_layers=2, num_attention_heads=4,
                              intermediate_size=64,
                              max_position_embeddings=32,
                              hidden_dropout_prob=0.0,
                              attention_probs_dropout_prob=0.0),
                   add_pooling_layer=False)
    hf.eval()
    base_cfg = TextEncoderConfig(vocab_size=60, hidden_size=32, num_layers=2,
                                 num_heads=4, intermediate_size=64,
                                 max_position_embeddings=32,
                                 hidden_dropout=0.0, attention_dropout=0.0,
                                 lora_rank=0)
    lora_cfg = TextEncoderConfig(**{**base_cfg.__dict__, "lora_rank": 4})

    ids = jnp.asarray(torch.randint(1, 60, (2, 9)).numpy())
    p0 = hf_convert.convert_bert(hf.state_dict(), base_cfg)
    out0 = BertEncoder(base_cfg).apply({"params": p0}, ids)

    mod = BertEncoder(lora_cfg)
    p1 = mod.init(jax.random.PRNGKey(0), ids)["params"]
    # splice converted base weights under LoRA layout
    conv = hf_convert.convert_bert(hf.state_dict(), lora_cfg)

    def merge(init_p, conv_p):
        out = {}
        for k, v in init_p.items():
            cv = conv_p.get(k) if isinstance(conv_p, dict) else None
            if isinstance(v, dict):
                out[k] = merge(v, cv or {})
            elif cv is not None and np.shape(cv) == np.shape(v):
                out[k] = jnp.asarray(np.asarray(cv, np.float32))
            else:
                out[k] = v  # keep random lora_a (b is zeros -> no effect)
        return out

    out1 = BertEncoder(lora_cfg).apply({"params": merge(p1, conv)}, ids)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), atol=2e-5)


# ---------------------------------------------------------------------------
# HF ViTModel parity, consuming native patch rows
# ---------------------------------------------------------------------------

def _patch_rows_to_image(rows: np.ndarray, grid: int, p: int = 16):
    """Inverse of newpatch.py:102-104: [grid*grid, 3*p*p] -> [3, grid*p, grid*p]."""
    x = rows.reshape(grid, grid, 3, p, p).transpose(2, 0, 3, 1, 4)
    return x.reshape(3, grid * p, grid * p)


def test_vit_encoder_matches_hf_on_patch_rows():
    from transformers import ViTConfig, ViTModel
    grid, p = 2, 16
    hf_cfg = ViTConfig(hidden_size=48, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=96,
                       image_size=grid * p, patch_size=p,
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    hf = ViTModel(hf_cfg, add_pooling_layer=False)
    hf.eval()

    cfg = ImageEncoderConfig(hidden_size=48, num_layers=2, num_heads=4,
                             intermediate_size=96, num_patches=grid * grid,
                             patch_dim=3 * p * p, hidden_dropout=0.0,
                             attention_dropout=0.0)
    rows = np.random.default_rng(0).normal(size=(3, grid * grid, 3 * p * p)
                                           ).astype(np.float32)
    imgs = np.stack([_patch_rows_to_image(r, grid, p) for r in rows])
    with torch.no_grad():
        want = hf(pixel_values=torch.from_numpy(imgs)).last_hidden_state

    params = hf_convert.convert_vit(hf.state_dict(), cfg)
    got = ViTEncoder(cfg).apply({"params": params}, jnp.asarray(rows))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=3e-5)


# ---------------------------------------------------------------------------
# BatchNorm parity vs torch BatchNorm1d (HoME wrappers)
# ---------------------------------------------------------------------------

def test_batchnorm_matches_torch_train_and_eval():
    d = 16
    tbn = torch.nn.BatchNorm1d(d)
    mod = BatchNorm1D()
    x1 = torch.randn(32, d) * 2 + 1
    x2 = torch.randn(32, d) * 0.5 - 3

    variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((4, d)),
                         use_running_average=False)
    params = variables["params"]
    stats = variables["batch_stats"]

    tbn.train()
    for x in (x1, x2):
        want = tbn(x).detach().numpy()
        got, mut = mod.apply({"params": params, "batch_stats": stats},
                             jnp.asarray(x.numpy()),
                             use_running_average=False,
                             mutable=["batch_stats"])
        stats = mut["batch_stats"]
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               tbn.running_var.numpy(), atol=1e-5)

    tbn.eval()
    x3 = torch.randn(8, d)
    want = tbn(x3).detach().numpy()
    got = mod.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x3.numpy()), use_running_average=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


# ---------------------------------------------------------------------------
# LoRA semantics
# ---------------------------------------------------------------------------

def test_lora_dense_matches_manual_formula():
    d_in, d_out, r = 8, 12, 4
    mod = LoRADense(d_out, rank=r, alpha=32.0, dropout=0.0)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(5, d_in)),
                    jnp.float32)
    p = mod.init(jax.random.PRNGKey(0), x)["params"]
    # B starts at zero -> output == base
    base = x @ p["base"]["kernel"] + p["base"]["bias"]
    np.testing.assert_allclose(np.asarray(mod.apply({"params": p}, x)),
                               np.asarray(base), atol=1e-6)
    # nonzero B -> base + (alpha/r) x A B
    p = jax.tree.map(np.asarray, p)
    p["lora_b"] = np.random.default_rng(2).normal(
        size=p["lora_b"].shape).astype(np.float32)
    want = base + (32.0 / r) * (x @ p["lora_a"] @ p["lora_b"])
    np.testing.assert_allclose(np.asarray(mod.apply({"params": p}, x)),
                               np.asarray(want), atol=1e-5)

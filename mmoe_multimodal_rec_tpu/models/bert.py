"""BGE-base / BERT-base text encoder in flax, with LoRA on query/value.

Replaces the reference's HF `AutoModel.from_pretrained("BAAI/bge-base-en-v1.5")
+ peft` stack (ref model.py:585-620).  BGE-base is a standard 12-layer
post-LayerNorm BERT; weights convert from an HF torch state_dict via
utils/hf_convert.py (the vocab grows by one row for "<SENT>",
ref train.py:103 + resize_token_embeddings model.py:598).

TPU notes: the encoder runs on a static [N_chunks, max_tok] batch (see
data/packer.py) in bfloat16 with fp32 LayerNorms; attention optionally uses
the Pallas flash kernel.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from jax.ad_checkpoint import checkpoint_name

from ..config import TextEncoderConfig
from .layers import (Attention, Array, HashDropout, Mlp,
                     resolve_remat_policy, gelu_exact)


class BertLayer(nn.Module):
    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    # int8-save q/k/v and/or the fc1 preact under the "quant"/"quant_fc1"
    # remat policies: the backward dequantizes instead of recomputing the
    # producing matmuls (see models/layers.resolve_remat_policy / quant_save)
    quant_save_qkv: bool = False
    quant_save_fc1: bool = False
    quant_fc1_bits: int = 8
    # shared-base dual-adapter mode (see layers.Attention.lora_sides)
    lora_sides: int = 1
    lora_split: int = 0

    @nn.compact
    def __call__(self, x: Array, pad_mask: Optional[Array],
                 deterministic: bool = True) -> Array:
        cfg = self.cfg
        h = Attention(cfg.num_heads, dropout=cfg.attention_dropout,
                      use_flash=self.use_flash, dtype=self.dtype,
                      param_dtype=self.param_dtype,
                      lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                      lora_dropout=cfg.lora_dropout,
                      lora_targets=cfg.lora_targets,
                      lora_sides=self.lora_sides,
                      lora_split=self.lora_split,
                      lora_fused_dropout=cfg.lora_fused_dropout,
                      quant_save=self.quant_save_qkv,
                      name="attention")(x, x, x, pad_mask,
                                        deterministic=deterministic)
        h = HashDropout(cfg.hidden_dropout)(h, deterministic=deterministic)
        # Post-LN residual (BERT style).  The residual is checkpoint-named so
        # the "attn" remat policy can save it (see resolve_remat_policy).
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="attention_norm")(
            checkpoint_name(x + h.astype(x.dtype), "attn_res"))
        h = Mlp(cfg.intermediate_size, cfg.hidden_size, activation=gelu_exact,
                dropout=0.0, out_dropout=cfg.hidden_dropout,
                dtype=self.dtype, param_dtype=self.param_dtype,
                quant_save=self.quant_save_fc1,
                quant_bits=self.quant_fc1_bits,
                name="mlp")(x.astype(self.dtype), deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="output_norm")(x + h.astype(x.dtype))


class _ScanBertLayer(nn.Module):
    """nn.scan body: BertLayer with the (carry, ()) signature scan wants.
    The inner scope is named "layer", so stacked params live at
    `encoder/layers/layer/...` with a leading [num_layers] axis
    (utils/scan_convert.py translates to/from the unrolled
    `encoder/layer_{i}/...` layout)."""
    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    quant_save_qkv: bool = False
    quant_save_fc1: bool = False
    quant_fc1_bits: int = 8
    lora_sides: int = 1
    lora_split: int = 0

    @nn.compact
    def __call__(self, x: Array, pad_mask: Optional[Array],
                 deterministic: bool = True):
        y = BertLayer(self.cfg, dtype=self.dtype,
                      param_dtype=self.param_dtype, use_flash=self.use_flash,
                      quant_save_qkv=self.quant_save_qkv,
                      quant_save_fc1=self.quant_save_fc1,
                      quant_fc1_bits=self.quant_fc1_bits,
                      lora_sides=self.lora_sides,
                      lora_split=self.lora_split,
                      name="layer")(x, pad_mask, deterministic)
        return y, ()


class BertEncoder(nn.Module):
    """[N, L] token ids -> [N, L, D] hidden states (== last_hidden_state)."""
    cfg: TextEncoderConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    remat: bool = False
    remat_policy: str = "dots"
    # shared-base dual-adapter mode: rows [0, lora_split) of the merged
    # chunk batch use side 0's LoRA, the rest side 1's (DualTextExpert)
    lora_sides: int = 1
    lora_split: int = 0

    @nn.compact
    def __call__(self, input_ids: Array,
                 pad_mask: Optional[Array] = None, *,
                 deterministic: bool = True) -> Array:
        cfg = self.cfg
        n, l = input_ids.shape
        if pad_mask is None:
            pad_mask = input_ids == cfg.pad_token_id

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="word_embeddings")(input_ids)
        # The reference always passes explicit position_ids = arange and
        # token_type_ids = zeros (ref model.py:256-257).
        pos_ids = jnp.arange(l, dtype=jnp.int32)[None, :]
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="position_embeddings")(pos_ids)
        tok_type = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name="token_type_embeddings")(
                                jnp.zeros((1, l), jnp.int32))
        x = word + pos + tok_type
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="embeddings_norm")(x)
        x = HashDropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        x = x.astype(self.dtype)
        # jax.checkpoint per layer trades recompute for HBM when training
        # full-size encoders; see resolve_remat_policy for the policies.
        qkv_s = self.remat and self.remat_policy in ("quant", "quant4")
        fc1_s = self.remat and self.remat_policy in ("quant", "quant4",
                                                     "quant_fc1")
        fc1_bits = 4 if self.remat_policy == "quant4" else 8
        if cfg.scan_layers:
            # ONE compiled layer body driven by lax.scan over stacked
            # [num_layers, ...] params, instead of num_layers unrolled
            # copies: same math (tests/test_scan_layers.py asserts logit
            # equality vs the unrolled encoder on converted params), much
            # smaller HLO -> faster cold compile.  remat composes: the
            # policy's named saves ("attn_res", "*_q8"/"*_sc") apply per
            # scan iteration.
            body = _ScanBertLayer
            if self.remat:
                body = nn.remat(_ScanBertLayer, static_argnums=(3,),
                                policy=resolve_remat_policy(
                                    self.remat_policy))
            scan = nn.scan(body, variable_axes={"params": 0},
                           split_rngs={"params": True, "dropout": True},
                           in_axes=(nn.broadcast, nn.broadcast),
                           length=cfg.num_layers)
            x, _ = scan(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                        use_flash=self.use_flash, quant_save_qkv=qkv_s,
                        quant_save_fc1=fc1_s, quant_fc1_bits=fc1_bits,
                        lora_sides=self.lora_sides,
                        lora_split=self.lora_split,
                        name="layers")(x, pad_mask, deterministic)
            return x
        layer_cls = BertLayer
        if self.remat:
            layer_cls = nn.remat(BertLayer, static_argnums=(3,),
                                 policy=resolve_remat_policy(
                                     self.remat_policy))
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                          use_flash=self.use_flash, quant_save_qkv=qkv_s,
                          quant_save_fc1=fc1_s, quant_fc1_bits=fc1_bits,
                          lora_sides=self.lora_sides,
                          lora_split=self.lora_split,
                          name=f"layer_{i}")(x, pad_mask, deterministic)
        return x

"""ViT-base image encoder operating natively on pre-computed patch rows.

Replaces HF `ViTModel.from_pretrained("google/vit-base-patch16-224-in21k")`
(ref model.py:623-628).  The offline pipeline already stores each image as 196
rows of 768 bytes — (14*14 patch grid, C*16*16) in (C, ph, pw) row-major order
(ref newpatch.py:102-104).  The HF ViT patch-embedding Conv2d(3, 768, 16, 16)
applied to the reconstructed image computes, per patch location, exactly
`flatten(C,ph,pw) . flatten(kernel)`, so on TPU the conv collapses to one
Dense over the stored patch rows and the reference's
patches -> full image -> re-patchify round trip (ref model.py:168-171)
disappears from the device graph entirely.  utils/hf_convert.py reshapes the
HF conv kernel into this Dense.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from jax.ad_checkpoint import checkpoint_name

from ..config import ImageEncoderConfig
from .layers import (Array, Attention, HashDropout, Mlp,
                     resolve_remat_policy, gelu_exact)


class ViTLayer(nn.Module):
    cfg: ImageEncoderConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    # int8-save qkv and/or fc1 preact under the "quant"/"quant_fc1" remat
    # policies (only the HoME variant trains ViT layers; frozen layers DCE
    # their backward)
    quant_save_qkv: bool = False
    quant_save_fc1: bool = False
    quant_fc1_bits: int = 8

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="norm1")(x)
        h = Attention(cfg.num_heads, dropout=cfg.attention_dropout,
                      use_flash=self.use_flash, dtype=self.dtype,
                      param_dtype=self.param_dtype,
                      quant_save=self.quant_save_qkv,
                      name="attention")(h.astype(self.dtype), h.astype(self.dtype),
                                        h.astype(self.dtype), None,
                                        deterministic=deterministic)
        h = HashDropout(cfg.hidden_dropout)(h, deterministic=deterministic)
        # named for the "attn" remat policy (see resolve_remat_policy)
        x = checkpoint_name(x + h.astype(x.dtype), "attn_res")
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="norm2")(x)
        h = Mlp(cfg.intermediate_size, cfg.hidden_size, activation=gelu_exact,
                dropout=cfg.hidden_dropout, out_dropout=cfg.hidden_dropout,
                dtype=self.dtype, param_dtype=self.param_dtype,
                quant_save=self.quant_save_fc1,
                quant_bits=self.quant_fc1_bits,
                name="mlp")(h.astype(self.dtype), deterministic=deterministic)
        return x + h.astype(x.dtype)


class ViTEncoder(nn.Module):
    """[B, 196, 768] normalized patch rows -> [B, 197, D] token states
    (CLS prepended), post final LayerNorm (== HF last_hidden_state)."""
    cfg: ImageEncoderConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    remat: bool = False
    remat_policy: str = "dots"

    @nn.compact
    def __call__(self, patches: Array, *, deterministic: bool = True) -> Array:
        cfg = self.cfg
        b = patches.shape[0]
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                     param_dtype=self.param_dtype,
                     name="patch_embed")(patches.astype(self.dtype))
        # HF ViT inits cls/pos with trunc-normal(0.02) — NOT zeros; a zero
        # init would map zero-image samples to exactly-zero CLS vectors.
        cls = self.param("cls_token",
                         nn.initializers.truncated_normal(0.02),
                         (1, 1, cfg.hidden_size), self.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, cfg.hidden_size)), x],
            axis=1)
        pos = self.param("pos_embed",
                         nn.initializers.truncated_normal(0.02),
                         (1, cfg.num_patches + 1, cfg.hidden_size),
                         self.param_dtype)
        x = x + pos.astype(x.dtype)
        x = HashDropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        layer_cls = ViTLayer
        if self.remat:
            layer_cls = nn.remat(ViTLayer, static_argnums=(2,),
                                 policy=resolve_remat_policy(
                                     self.remat_policy))
        qkv_s = self.remat and self.remat_policy in ("quant", "quant4")
        fc1_s = self.remat and self.remat_policy in ("quant", "quant4",
                                                     "quant_fc1")
        fc1_bits = 4 if self.remat_policy == "quant4" else 8
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                          use_flash=self.use_flash, quant_save_qkv=qkv_s,
                          quant_save_fc1=fc1_s, quant_fc1_bits=fc1_bits,
                          name=f"layer_{i}")(x, deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="final_norm")(x)

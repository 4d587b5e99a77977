"""Image experts over native patch rows.

Reference: ItemImageExpert model.py:343-385 (baseline, frozen ViT + pool +
LN + dropout) and ImageExpertWithProjection model_HoME.py:373-399 (CLS pool +
trainable projection head for contrastive learning).

ImageNet normalization happens on device, fused into the same XLA graph: the
stored patch rows are uint8 in (C, ph, pw) row-major order (newpatch.py:95-104)
so per-channel mean/std expand to per-element vectors of length 768.  Samples
with has_image=0 enter the ViT as exact zeros, matching decode_sample's
zero-image fallback (model.py:161, which skips normalization for them).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import ImageEncoderConfig
from .layers import Array, Mlp, HashDropout, gelu_exact
from .vit import ViTEncoder

# ImageNet stats (ref model.py:172-173), expanded to the (C, 16, 16) row.
_IMAGENET_MEAN = np.repeat(np.array([0.485, 0.456, 0.406], np.float32), 256)
_IMAGENET_STD = np.repeat(np.array([0.229, 0.224, 0.225], np.float32), 256)


def normalize_patches(patches_u8: Array, has_image: Array) -> Array:
    """[B, 196, 768] uint8 + [B] {0,1} -> normalized float32 patch rows."""
    x = patches_u8.astype(jnp.float32) / 255.0
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    return jnp.where(has_image[:, None, None] > 0, x, 0.0)


class ItemImageExpert(nn.Module):
    """Baseline: ViT -> mean/cls pool -> LN -> dropout (model.py:343-385)."""
    cfg: ImageEncoderConfig
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    remat: bool = False
    remat_policy: str = "dots"

    @nn.compact
    def __call__(self, patches: Array, *, deterministic: bool = True) -> Array:
        tokens = ViTEncoder(self.cfg, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            use_flash=self.use_flash, remat=self.remat,
                            remat_policy=self.remat_policy,
                            name="backbone")(patches,
                                             deterministic=deterministic)
        if self.cfg.pool_type == "mean":
            vec = jnp.mean(tokens, axis=1)
        else:
            vec = tokens[:, 0]
        vec = nn.LayerNorm(dtype=self.dtype, name="norm")(vec)
        vec = HashDropout(self.dropout)(vec.astype(self.dtype),
                                       deterministic=deterministic)
        return vec


class ImageExpertWithProjection(nn.Module):
    """HoME: CLS vec + trainable projection head 768->1536->GELU->768
    (model_HoME.py:373-399); projection feeds only the contrastive losses."""
    cfg: ImageEncoderConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    remat: bool = False
    remat_policy: str = "dots"

    @nn.compact
    def __call__(self, patches: Array, *, deterministic: bool = True
                 ) -> Tuple[Array, Array]:
        tokens = ViTEncoder(self.cfg, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            use_flash=self.use_flash, remat=self.remat,
                            remat_policy=self.remat_policy,
                            name="backbone")(patches,
                                             deterministic=deterministic)
        img_vec = tokens[:, 0]
        projected = Mlp(2 * self.cfg.hidden_size, self.cfg.hidden_size,
                        activation=gelu_exact, dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name="projection_head")(img_vec,
                                                deterministic=deterministic)
        return img_vec, projected

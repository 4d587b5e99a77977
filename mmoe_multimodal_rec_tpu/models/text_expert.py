"""TextExpert: BGE encoder over packed chunks + sentence gather + doc pooling.

Reference: model.py:214-338 (baseline) / model_HoME.py:256-369 (HoME).

TPU-native redesign of the ragged parts:
- The reference encodes dynamic [N_chunks, max_chunk_len] then runs a *python
  loop over GPU tensors* to bucket chunks back to samples (model.py:302-327, a
  per-step host sync).  Here the packer (data/packer.py) emits static-shape
  sentence routing tensors `sent_chunk [B, S]` (global chunk row) and
  `sent_tok [B, S]` (token position inside that chunk), so the whole
  gather-and-regroup is one `jnp.take` on device — no host round trip, no
  recompilation.
- Padded sentences carry index -1 and gather to exact zeros, reproducing the
  reference's masked_fill (model.py:298) + F.pad (model.py:325) semantics.
- `sent_mask` is computed from the *values* (all-zero row == padded), exactly
  like the reference (model.py:328) — including its quirk that a genuinely
  all-zero sentence vector would be masked too.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config import TextEncoderConfig
from .bert import BertEncoder
from .layers import Array, HashDropout


class TextExpert(nn.Module):
    cfg: TextEncoderConfig
    fixed_sent_count: int = 64
    dropout: float = 0.1
    final_norm: bool = True      # baseline: LN+dropout on outputs
                                 # (model.py:335-336); HoME disables
                                 # (model_HoME.py:366-367)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    remat: bool = False
    remat_policy: str = "dots"

    @nn.compact
    def __call__(self, tokens: Array, sent_chunk: Array, sent_tok: Array, *,
                 deterministic: bool = True
                 ) -> Tuple[Array, Array, Array]:
        """tokens [N, L] int32 (pad rows = all pad_id);
        sent_chunk [B, S] int32 global chunk row of each sentence (-1 pad);
        sent_tok [B, S] int32 token position of its <SENT> marker (-1 pad).

        Returns (sent_vecs [B, S, D], sent_mask [B, S] True=pad,
        doc_vecs [B, D]).
        """
        n, l = tokens.shape
        b, s = sent_chunk.shape
        h = BertEncoder(self.cfg, dtype=self.dtype,
                        param_dtype=self.param_dtype, use_flash=self.use_flash,
                        remat=self.remat, remat_policy=self.remat_policy,
                        name="encoder")(tokens, deterministic=deterministic)
        d = h.shape[-1]

        # One-shot sentence gather (replaces model.py:288-327).
        valid = (sent_chunk >= 0) & (sent_tok >= 0)
        flat_idx = jnp.clip(sent_chunk, 0, n - 1) * l + jnp.clip(sent_tok, 0, l - 1)
        sent_vecs = jnp.take(h.reshape(n * l, d), flat_idx.reshape(-1), axis=0)
        sent_vecs = sent_vecs.reshape(b, s, d)
        sent_vecs = jnp.where(valid[..., None], sent_vecs, 0.0)

        # Pad-row mask from values (ref model.py:328).
        sent_mask = jnp.sum(jnp.abs(sent_vecs.astype(jnp.float32)), axis=-1) == 0.0

        # Doc vec = masked mean (ref model.py:331-332).
        lens = jnp.sum((~sent_mask).astype(jnp.float32), axis=1, keepdims=True)
        doc_vecs = jnp.sum(sent_vecs.astype(jnp.float32), axis=1) / jnp.maximum(lens, 1.0)
        doc_vecs = doc_vecs.astype(self.dtype)

        if self.final_norm:
            norm = nn.LayerNorm(dtype=self.dtype, name="norm")
            drop = HashDropout(self.dropout)
            sent_vecs = drop(norm(sent_vecs).astype(self.dtype),
                             deterministic=deterministic)
            doc_vecs = drop(norm(doc_vecs).astype(self.dtype),
                            deterministic=deterministic)
        return sent_vecs, sent_mask, doc_vecs

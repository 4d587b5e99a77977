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

`DualTextExpert` is the shared-base restructuring (model.shared_text_base):
the reference instantiates TWO full BGE copies whose base weights are (a)
loaded from the same pretrained checkpoint (ref train.py:118-123 /
model.py:585-620) and (b) frozen for the whole run — only the LoRA adapters
and externals train (ref train.py:151-186; here train/optimizer.label_param
puts text base weights in no param group).  The two encoder passes therefore
run IDENTICAL weights on different rows, so they merge exactly into ONE pass
over the concatenated [user; item] chunk batch with per-side LoRA deltas —
halving the matmul launch count and doubling M per matmul (the [M,768]x
[768,768] projections measure 134.7 -> 163.6 TF/s at 2x M on v5e, see
BENCHMARKS.md "shared text base").  Exactness vs the two-tower layout is
asserted in tests/test_shared_base.py; utils/shared_base.py converts
checkpoints in both directions.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config import TextEncoderConfig
from .bert import BertEncoder
from .layers import Array, HashDropout


def gather_sentences(h: Array, sent_chunk: Array, sent_tok: Array
                     ) -> Tuple[Array, Array, Array]:
    """One-shot sentence gather + value-mask + masked-mean doc pooling
    (replaces the reference's host bucket loop, model.py:288-332).

    h [N, L, D] encoder hidden states; sent_chunk/sent_tok [B, S] int32
    (-1 = padded sentence).  Returns (sent_vecs [B, S, D] — fp32-exact
    zeros at pads, sent_mask [B, S] True=pad, doc_vecs [B, D] fp32).
    """
    n, l, d = h.shape
    b, s = sent_chunk.shape
    valid = (sent_chunk >= 0) & (sent_tok >= 0)
    flat_idx = jnp.clip(sent_chunk, 0, n - 1) * l + jnp.clip(sent_tok, 0, l - 1)
    sent_vecs = jnp.take(h.reshape(n * l, d), flat_idx.reshape(-1), axis=0)
    sent_vecs = sent_vecs.reshape(b, s, d)
    sent_vecs = jnp.where(valid[..., None], sent_vecs, 0.0)

    # Pad-row mask from values (ref model.py:328).
    sent_mask = jnp.sum(jnp.abs(sent_vecs.astype(jnp.float32)), axis=-1) == 0.0

    # Doc vec = masked mean (ref model.py:331-332).
    lens = jnp.sum((~sent_mask).astype(jnp.float32), axis=1, keepdims=True)
    doc_vecs = jnp.sum(sent_vecs.astype(jnp.float32), axis=1) \
        / jnp.maximum(lens, 1.0)
    return sent_vecs, sent_mask, doc_vecs


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
        h = BertEncoder(self.cfg, dtype=self.dtype,
                        param_dtype=self.param_dtype, use_flash=self.use_flash,
                        remat=self.remat, remat_policy=self.remat_policy,
                        name="encoder")(tokens, deterministic=deterministic)
        sent_vecs, sent_mask, doc_vecs = gather_sentences(
            h, sent_chunk, sent_tok)
        doc_vecs = doc_vecs.astype(self.dtype)

        if self.final_norm:
            norm = nn.LayerNorm(dtype=self.dtype, name="norm")
            drop = HashDropout(self.dropout)
            sent_vecs = drop(norm(sent_vecs).astype(self.dtype),
                             deterministic=deterministic)
            doc_vecs = drop(norm(doc_vecs).astype(self.dtype),
                            deterministic=deterministic)
        return sent_vecs, sent_mask, doc_vecs


class DualTextExpert(nn.Module):
    """Both text experts as ONE encoder pass over the concatenated
    [user; item] chunk batch: shared frozen base, per-side LoRA adapters
    (layers.ProjParams lora_sides=2), per-side final LayerNorms.

    Mathematically identical to two TextExperts whose base trees are equal
    — which is the invariant of the reference workflow: both towers load
    the same pretrained BGE and the base is in no optimizer group (ref
    train.py:118-123, 151-186).  Param tree:
      text_experts/encoder/...          (one base; lora_a/lora_b gain a
                                         leading [2] side axis: 0=user, 1=item)
      text_experts/norm_user|norm_item  (baseline only; frozen-at-init like
                                         the two-tower norms, ref train.py:151-162)
    """
    cfg: TextEncoderConfig
    fixed_sent_count: int = 64
    dropout: float = 0.1
    final_norm: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    remat: bool = False
    remat_policy: str = "dots"

    @nn.compact
    def __call__(self, user_tokens: Array, item_tokens: Array,
                 user_sent_chunk: Array, user_sent_tok: Array,
                 item_sent_chunk: Array, item_sent_tok: Array, *,
                 deterministic: bool = True):
        """Returns ((u_sent, u_mask, u_doc), (i_sent, i_mask, i_doc)),
        each triple exactly what TextExpert returns for its side."""
        nu = user_tokens.shape[0]
        tokens = jnp.concatenate([user_tokens, item_tokens], axis=0)
        h = BertEncoder(self.cfg, dtype=self.dtype,
                        param_dtype=self.param_dtype, use_flash=self.use_flash,
                        remat=self.remat, remat_policy=self.remat_policy,
                        lora_sides=2, lora_split=nu,
                        name="encoder")(tokens, deterministic=deterministic)

        outs = []
        for side, hs, sc, st in (
                ("user", h[:nu], user_sent_chunk, user_sent_tok),
                ("item", h[nu:], item_sent_chunk, item_sent_tok)):
            sent_vecs, sent_mask, doc_vecs = gather_sentences(hs, sc, st)
            doc_vecs = doc_vecs.astype(self.dtype)
            if self.final_norm:
                norm = nn.LayerNorm(dtype=self.dtype, name=f"norm_{side}")
                drop = HashDropout(self.dropout)
                sent_vecs = drop(norm(sent_vecs).astype(self.dtype),
                                 deterministic=deterministic)
                doc_vecs = drop(norm(doc_vecs).astype(self.dtype),
                                deterministic=deterministic)
            outs.append((sent_vecs, sent_mask, doc_vecs))
        return tuple(outs)

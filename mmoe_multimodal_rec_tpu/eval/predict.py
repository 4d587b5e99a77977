"""Serving-path predictor: raw (user_text, item_text, patch) -> scores.

The reference has no serving story beyond the batch eval scripts; this wraps
the jit forward for production inference:

- fixed-shape compiled program (one compile per batch size; callers pick a
  small set of bucket sizes), padding short batches with a valid mask;
- host tokenization through the native WordPiece path;
- scores returned as probabilities (sigmoid of the two task logits), matching
  the eval scripts' outputs (ref inference_and_auc.py:150-151).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np

from ..config import Config
from ..data.decode import PATCH_SHAPE
from ..data.packer import TextPacker, packer_from_config
from ..models.mmoe import MMoERecModel
from ..train.optimizer import merge_params


class Predictor:
    def __init__(self, cfg: Config, trainable, frozen, batch_stats=None,
                 batch_size: Optional[int] = None,
                 tokenizer=None, merge_lora: bool = True,
                 buckets: Optional[Sequence[int]] = None):
        """merge_lora: fold the trained LoRA adapters into the base kernels
        (exact at deterministic inference — utils/lora.py) so the text
        attention layers take the packed-qkv kernel path.

        buckets: ascending batch-size buckets (e.g. [4, 16, 64]); each
        predict() pads to the smallest bucket >= n, so low-traffic
        requests don't pay full-batch compute.  One jit serves all
        buckets (XLA caches one executable per shape); warmup() compiles
        them ahead of traffic.  Default: the single [batch_size] bucket."""
        self.cfg = cfg
        model_cfg = cfg.model
        base = batch_size or cfg.train.batch_size
        # an explicit batch_size is a capacity promise — union it into the
        # buckets rather than silently capping at buckets[-1]
        self.buckets = (sorted(set(buckets) | ({base} if batch_size else
                                               set()))
                        if buckets else [base])
        self.batch_size = self.buckets[-1]
        # per-sample chunk allowance (train chunk_budget covers
        # train.batch_size samples; CEIL so no bucket ever packs with a
        # smaller per-sample budget than offline eval used)
        cb = cfg.model.packer.chunk_budget
        self._chunks_per_sample = (
            -(-cb // cfg.train.batch_size) if cb
            else cfg.model.packer.max_chunks_per_sample)
        self.packer = (TextPacker(tokenizer, cfg.model.packer) if tokenizer
                       else packer_from_config(cfg))
        params = merge_params(trainable, frozen)
        if merge_lora and cfg.model.text.lora_rank > 0:
            from ..utils.lora import merge_lora as _merge, merged_model_config
            params = _merge(params, cfg.model.text.lora_alpha)
            model_cfg = merged_model_config(cfg.model)
        self.model = MMoERecModel(model_cfg)
        self._variables = {"params": params}
        if batch_stats:
            self._variables["batch_stats"] = batch_stats

        def fwd(variables, batch):
            out = self.model.apply(variables, batch, deterministic=True)
            return (jax.nn.sigmoid(out.logit_good),
                    jax.nn.sigmoid(out.logit_best))

        self._fwd = jax.jit(fwd,
                            compiler_options=cfg.train.compiler_options)

    @classmethod
    def from_state(cls, cfg: Config, state, **kw) -> "Predictor":
        return cls(cfg, state.trainable, state.frozen, state.batch_stats,
                   **kw)

    def warmup(self) -> None:
        """Compile every bucket shape before accepting traffic."""
        for b in self.buckets:
            self.predict(["warmup"] * b, ["warmup"] * b)

    def predict(self, user_texts: Sequence[str], item_texts: Sequence[str],
                patches: Optional[np.ndarray] = None,
                has_image: Optional[np.ndarray] = None
                ) -> Dict[str, np.ndarray]:
        """Score up to batch_size pairs; inputs pad to the smallest bucket
        >= n and the padding is discarded from the result."""
        n = len(user_texts)
        assert len(item_texts) == n
        assert n <= self.batch_size, (n, self.batch_size)
        b = next(s for s in self.buckets if s >= n)
        pad = b - n
        user_texts = list(user_texts) + [""] * pad
        item_texts = list(item_texts) + [""] * pad
        if patches is None:
            patches = np.zeros((n, *PATCH_SHAPE), np.uint8)
            has_image = np.zeros(n, np.int32)
        if has_image is None:
            has_image = np.ones(n, np.int32)
        patches = np.concatenate(
            [patches, np.zeros((pad, *PATCH_SHAPE), np.uint8)], axis=0)
        has_image = np.concatenate([has_image.astype(np.int32),
                                    np.zeros(pad, np.int32)])

        budget = b * self._chunks_per_sample
        u = self.packer.pack(user_texts, budget)
        i = self.packer.pack(item_texts, budget)
        batch = {
            "user_tokens": u.tokens, "user_sent_chunk": u.sent_chunk,
            "user_sent_tok": u.sent_tok,
            "item_tokens": i.tokens, "item_sent_chunk": i.sent_chunk,
            "item_sent_tok": i.sent_tok,
            "patches": patches, "has_image": has_image,
        }
        pg, pb = self._fwd(self._variables, batch)
        return {"prob_good": np.asarray(pg)[:n],
                "prob_best": np.asarray(pb)[:n]}

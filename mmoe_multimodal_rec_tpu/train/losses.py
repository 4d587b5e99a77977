"""Loss functions.

- `weighted_bce_with_logits` == torch BCEWithLogitsLoss(pos_weight=...)
  (ref train.py:189-192), in the numerically stable log-sigmoid form.
- `contrastive_loss` == calculate_contrastive_loss (ref train_HoME.py:43-51):
  L2-normalize, in-batch similarity matrix / temperature, cross-entropy
  against the diagonal.
- `total_loss` assembles the task losses (+ HoME contrastive terms) exactly
  as the trainers do (train.py:253-258, train_HoME.py:358-374).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import LossConfig

Array = jax.Array


def weighted_bce_with_logits(logits: Array, labels: Array,
                             pos_weight: float,
                             valid: Optional[Array] = None) -> Array:
    """mean( -[pw*y*log σ(x) + (1-y)*log(1-σ(x))] ), optionally masked."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    per = -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)
    if valid is None:
        return jnp.mean(per)
    w = valid.astype(jnp.float32)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


def contrastive_loss(anchor: Array, positive: Array,
                     temperature: float = 0.07) -> Array:
    """In-batch InfoNCE with the diagonal as positives."""
    a = anchor.astype(jnp.float32)
    p = positive.astype(jnp.float32)
    # rsqrt(sum^2 + eps) instead of /max(norm, eps): the latter has a NaN
    # gradient at exactly-zero rows (d||x||/dx = x/||x|| = 0/0).
    a = a * jax.lax.rsqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-12)
    p = p * jax.lax.rsqrt(jnp.sum(p * p, axis=1, keepdims=True) + 1e-12)
    sim = (a @ p.T) / temperature
    labels = jnp.arange(sim.shape[0])
    logz = jax.nn.logsumexp(sim, axis=1)
    return jnp.mean(logz - sim[labels, labels])


class LossParts(NamedTuple):
    total: Array
    main: Array
    contrastive: Array


def total_loss(logit_good: Array, logit_best: Array, labels_good: Array,
               labels_best: Array, cfg: LossConfig,
               aux: Optional[Dict[str, Array]] = None,
               home: bool = False,
               valid: Optional[Array] = None) -> LossParts:
    main = (weighted_bce_with_logits(logit_good, labels_good,
                                     cfg.pos_weight_good, valid)
            + weighted_bce_with_logits(logit_best, labels_best,
                                       cfg.pos_weight_best, valid))
    cl = jnp.zeros((), jnp.float32)
    if aux is not None and "gate_balance" in aux:
        # nonzero only under top-k gating (heads.TopKGate); dense gates
        # contribute a constant 0 so reference-parity losses are unchanged
        main = main + cfg.lambda_gate_balance * aux["gate_balance"]
    if home and aux is not None:
        # RAW expert vectors feed the contrastive terms (train_HoME.py:360-364)
        cl = (cfg.lambda_cross
              * contrastive_loss(aux["ui_vec"], aux["i_doc"], cfg.temperature)
              + cfg.lambda_user_img
              * contrastive_loss(aux["u_doc"], aux["projected_img"],
                                 cfg.temperature)
              + cfg.lambda_item_img
              * contrastive_loss(aux["i_doc"], aux["projected_img"],
                                 cfg.temperature))
    return LossParts(main + cl, main, cl)

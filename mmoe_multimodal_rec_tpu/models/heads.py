"""Dense-gated two-task MMoE head (ref model.py:513-577).

Once jitted with the experts this whole head fuses into the same XLA graph —
gate matmul, softmax, weighted expert sum and the two towers become a handful
of fused MXU/VPU ops; there is nothing to hand-schedule (SURVEY §7.8).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Array, HashDropout, gelu_exact


class DenseGate(nn.Module):
    """softmax(Linear(d -> n_expert)) — dense, no top-k, no load-balancing
    bias (ref model.py:513-524; README lists sparse routing as future work)."""
    n_expert: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        logits = nn.Dense(self.n_expert, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="fc")(x)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


class TopKGate(nn.Module):
    """Sparse top-k gate + Switch-style load-balance loss — the sparse
    routing the reference README (:672) lists as future work, OPT-IN via
    model.gate_type="topk" (DenseGate stays the checkpoint-parity default).

    Weights: softmax probs masked to the per-row top-k and renormalized —
    static shapes, no gather/scatter, so the "routing" is a masked einsum
    the MXU eats whole (the expert count is 6; dispatch-style EP routing
    would only add latency at this scale).

    Aux loss (Shazeer'17 / Fedus'21 Switch): n * sum_i f_i * P_i where
    f_i = fraction of rows routing to expert i (top-k mask mean / k) and
    P_i = mean softmax prob; minimized at uniform routing (value 1).
    """
    n_expert: int
    k: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        logits = nn.Dense(self.n_expert, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="fc")(x)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        k = min(self.k, self.n_expert)
        _, idx = jax.lax.top_k(probs, k)                       # [B, k]
        mask = jnp.sum(jax.nn.one_hot(idx, self.n_expert,
                                      dtype=jnp.float32), axis=1)  # [B, n]
        w = probs * mask
        w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
        frac = jnp.mean(mask, axis=0) / k                      # sums to 1
        mean_p = jnp.mean(probs, axis=0)
        balance = self.n_expert * jnp.sum(frac * mean_p)
        return w, balance


def make_gates(gate_type: str, n_expert: int, topk: int, names, dtype,
               param_dtype, query: Array):
    """Per-task gate weights + summed load-balance aux (0 for dense)."""
    weights, balance = [], jnp.zeros((), jnp.float32)
    for name in names:
        if gate_type == "topk":
            w, b = TopKGate(n_expert, k=topk, dtype=dtype,
                            param_dtype=param_dtype, name=name)(query)
            balance = balance + b
        else:
            w = DenseGate(n_expert, dtype=dtype, param_dtype=param_dtype,
                          name=name)(query)
        weights.append(w)
    return weights, balance


class Tower(nn.Module):
    """LN -> d -> hidden -> GELU -> drop -> hidden/2 -> GELU -> drop -> 1
    (ref model.py:546-557)."""
    hidden: int = 256
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x).astype(self.dtype)
        x = nn.Dense(self.hidden, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        x = gelu_exact(x)
        x = HashDropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.hidden // 2, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc2")(x)
        x = gelu_exact(x)
        x = HashDropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(1, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc3")(x)
        return jnp.squeeze(x, -1)


class TwoTaskMMoE(nn.Module):
    """expert_vecs [B, N, D] -> (logit_good [B], logit_best [B], balance)
    (ref model.py:527-577; balance is the top-k load-balance aux, 0 under
    the default dense gating)."""
    n_expert: int = 6
    tower_hidden: int = 256
    tower_dropout: float = 0.0
    gate_type: str = "dense"
    gate_topk: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, expert_vecs: Array, *,
                 deterministic: bool = True) -> Tuple[Array, Array, Array]:
        query = jnp.mean(expert_vecs, axis=1)          # [B, D] (model.py:564)
        (w_good, w_best), balance = make_gates(
            self.gate_type, self.n_expert, self.gate_topk,
            ("gate_good", "gate_best"), self.dtype, self.param_dtype, query)
        fused_good = jnp.einsum("bn,bnd->bd", w_good.astype(expert_vecs.dtype),
                                expert_vecs)
        fused_best = jnp.einsum("bn,bnd->bd", w_best.astype(expert_vecs.dtype),
                                expert_vecs)
        logit_good = Tower(self.tower_hidden, self.tower_dropout,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="tower_good")(fused_good,
                                              deterministic=deterministic)
        logit_best = Tower(self.tower_hidden, self.tower_dropout,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="tower_best")(fused_best,
                                              deterministic=deterministic)
        return logit_good, logit_best, balance

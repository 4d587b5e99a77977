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
    """expert_vecs [B, N, D] -> (logit_good [B], logit_best [B])
    (ref model.py:527-577)."""
    n_expert: int = 6
    tower_hidden: int = 256
    tower_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, expert_vecs: Array, *,
                 deterministic: bool = True) -> Tuple[Array, Array]:
        query = jnp.mean(expert_vecs, axis=1)          # [B, D] (model.py:564)
        w_good = DenseGate(self.n_expert, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name="gate_good")(query)
        w_best = DenseGate(self.n_expert, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name="gate_best")(query)
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
        return logit_good, logit_best

"""HoME hierarchical-expert head and its helper gates.

Reference: model_HoME.py:28-35 (ExpertMLP), :224-243 (FeatureGate/SelfGate),
:530-638 (HOME_MMoE_Complete), train_HoME.py:100-116 (HomeExpertWrapper,
the BatchNorm+SiLU+Dropout wrapper applied to each of the six expert vectors).

BatchNorm under data parallelism: the SPMD step sees logically-GLOBAL
arrays, so each micro-batch's BN statistics are computed over the whole
global micro-batch (XLA inserts the data-axis psums; verified in the
dryrun HLO).  This deliberately DIFFERS from the reference's DDP, where
each GPU normalizes only its local share and keeps its own running stats
(train_HoME.py:100-116 under DDP) — global-batch statistics are lower
variance, and at 1 device the two coincide (the tested parity case).
Either way eval parity is recovered by the BN-recalibration pass
(eval/evaluate.py, ref infer_auc_HoME:64-125), which refreshes running
stats in a single stream.  Pinned by tests/test_home_bn.py::
test_bn_stats_are_global_batch_under_dp; see also the analogous
contrastive-pool note in docs/DESIGN.md.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Array, BatchNorm1D, Mlp, HashDropout, gelu_exact


class FeatureGate(nn.Module):
    """Private per-expert inputs: x[:,None] * 2*sigmoid(Linear(d -> d*n))
    (ref model_HoME.py:224-234)."""
    n_experts: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        g = nn.Dense(d * self.n_experts, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="gate")(x)
        g = g.reshape(x.shape[0], self.n_experts, d)
        return x[:, None, :] * (2.0 * jax.nn.sigmoid(g))


class SelfGate(nn.Module):
    """Gated residual: x + sigmoid(Linear(x)) * expert(x)
    (ref model_HoME.py:236-243)."""
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_original: Array, x_processed: Array) -> Array:
        d = x_original.shape[-1]
        g = jax.nn.sigmoid(nn.Dense(d, dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    name="gate")(x_original))
        return x_original + g * x_processed


class HomeTower(nn.Module):
    """LN -> Linear(d, hidden) -> GELU -> Dropout(0.1) -> Linear(hidden, 1)
    (ref model_HoME.py:581-588)."""
    hidden: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x).astype(self.dtype)
        x = nn.Dense(self.hidden, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        x = gelu_exact(x)
        x = HashDropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(1, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc2")(x)
        return jnp.squeeze(x, -1)


class HomeMMoEHead(nn.Module):
    """HOME_MMoE_Complete (ref model_HoME.py:530-638).

    [B, 6, D] -> flatten -> input projection + mean residual = shared_input;
    FeatureGate-private inputs through 4 shared + 2x2 task ExpertMLPs;
    SelfGate enhancement; per-task dense gate over (shared + task) experts;
    weighted sum; task towers.
    """
    num_input_experts: int = 6
    n_shared_experts: int = 4
    n_task_experts: int = 2
    expert_hidden: int = 1024
    expert_dropout: float = 0.1
    tower_hidden: int = 512      # trainer override (ref train_HoME.py:180)
    tower_dropout: float = 0.1
    gate_type: str = "dense"
    gate_topk: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, expert_vecs: Array, *,
                 deterministic: bool = True) -> Tuple[Array, Array, Array]:
        b, n, d = expert_vecs.shape
        flat = expert_vecs.reshape(b, n * d)
        proj = nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="input_projection")(flat)
        proj = nn.LayerNorm(dtype=self.dtype, name="input_norm")(proj)
        proj = gelu_exact(proj.astype(self.dtype))
        shared_input = proj + jnp.mean(expert_vecs, axis=1)

        def expert_mlp(name):
            return Mlp(self.expert_hidden, d, activation=gelu_exact,
                       dropout=self.expert_dropout, dtype=self.dtype,
                       param_dtype=self.param_dtype, name=name)

        meta_inputs = FeatureGate(self.n_shared_experts, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="fg_meta")(shared_input)
        good_inputs = FeatureGate(self.n_task_experts, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="fg_good")(shared_input)
        best_inputs = FeatureGate(self.n_task_experts, dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="fg_best")(shared_input)

        meta_out = [expert_mlp(f"meta_expert_{i}")(
            meta_inputs[:, i], deterministic=deterministic)
            for i in range(self.n_shared_experts)]
        good_out = [expert_mlp(f"good_expert_{i}")(
            good_inputs[:, i], deterministic=deterministic)
            for i in range(self.n_task_experts)]
        best_out = [expert_mlp(f"best_expert_{i}")(
            best_inputs[:, i], deterministic=deterministic)
            for i in range(self.n_task_experts)]

        sg_meta = SelfGate(dtype=self.dtype, param_dtype=self.param_dtype,
                           name="sg_meta")
        sg_good = SelfGate(dtype=self.dtype, param_dtype=self.param_dtype,
                           name="sg_good")
        sg_best = SelfGate(dtype=self.dtype, param_dtype=self.param_dtype,
                           name="sg_best")
        meta_enh = [sg_meta(shared_input, o) for o in meta_out]
        good_enh = [sg_good(shared_input, o) for o in good_out]
        best_enh = [sg_best(shared_input, o) for o in best_out]

        experts_good = jnp.stack(meta_enh + good_enh, axis=1)
        experts_best = jnp.stack(meta_enh + best_enh, axis=1)

        from .heads import make_gates
        n_pool = self.n_shared_experts + self.n_task_experts
        (w_good, w_best), balance = make_gates(
            self.gate_type, n_pool, self.gate_topk,
            ("gate_good", "gate_best"), self.dtype, self.param_dtype,
            shared_input)
        fused_good = jnp.einsum("bn,bnd->bd",
                                w_good.astype(experts_good.dtype), experts_good)
        fused_best = jnp.einsum("bn,bnd->bd",
                                w_best.astype(experts_best.dtype), experts_best)

        logit_good = HomeTower(self.tower_hidden, self.tower_dropout,
                               dtype=self.dtype, param_dtype=self.param_dtype,
                               name="tower_good")(fused_good,
                                                  deterministic=deterministic)
        logit_best = HomeTower(self.tower_hidden, self.tower_dropout,
                               dtype=self.dtype, param_dtype=self.param_dtype,
                               name="tower_best")(fused_best,
                                                  deterministic=deterministic)
        return logit_good, logit_best, balance


class HomeExpertWrapper(nn.Module):
    """BatchNorm1d -> SiLU -> Dropout(0.1) on an expert vector, handling
    (B, D) and (B, L, D) inputs (ref train_HoME.py:100-116)."""
    dropout: float = 0.1
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True,
                 use_running_average: bool = True) -> Array:
        shape = x.shape
        d = shape[-1]
        flat = x.reshape(-1, d)
        y = BatchNorm1D(momentum=self.bn_momentum, eps=self.bn_eps,
                        dtype=self.dtype, name="norm")(
            flat, use_running_average=use_running_average)
        y = jax.nn.silu(y)
        y = HashDropout(self.dropout)(y, deterministic=deterministic)
        return y.reshape(shape)

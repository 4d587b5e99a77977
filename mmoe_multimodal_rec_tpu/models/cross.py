"""Cross-interaction experts.

- RobustTextCrossExpert (ref model.py:386-451 / model_HoME.py:401-466):
  per-side pre-norm self-attention over sentence vectors, user->item cross
  attention, learnable scalar-gated residual blend, attention pooling, and
  (baseline only) LN + residual MLP output head.
- EnhancedCrossFuse (ref model.py:454-507 / model_HoME.py:469-522): two CLS
  vectors stacked as a length-2 sequence through pre-norm transformer layers,
  scalar-gate blend, residual projection; baseline adds a final LN/Linear/GELU
  projection, HoME returns the raw residual sum.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Array, AttnPool1D, Attention, Mlp, PreNormBlock, HashDropout, gelu_exact


class RobustTextCrossExpert(nn.Module):
    n_layers: int = 2
    n_heads: int = 8
    dropout: float = 0.1
    final_mlp: bool = True       # baseline True (model.py:450-451);
                                 # HoME returns raw pooled (model_HoME.py:466)
    pool_nan_guard: bool = False # HoME adds the all-masked-row guard
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, user_vecs: Array, user_mask: Array,
                 item_vecs: Array, item_mask: Array, *,
                 deterministic: bool = True) -> Array:
        d = user_vecs.shape[-1]
        for i in range(self.n_layers):
            user_vecs = PreNormBlock(self.n_heads, dropout=self.dropout,
                                     use_flash=self.use_flash,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name=f"self_user_{i}")(
                user_vecs, user_mask, deterministic=deterministic)
        for i in range(self.n_layers):
            item_vecs = PreNormBlock(self.n_heads, dropout=self.dropout,
                                     use_flash=self.use_flash,
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     name=f"self_item_{i}")(
                item_vecs, item_mask, deterministic=deterministic)

        cross_out = Attention(self.n_heads, dropout=self.dropout,
                              use_flash=self.use_flash, dtype=self.dtype,
                              param_dtype=self.param_dtype,
                              name="cross_attn")(
            user_vecs, item_vecs, item_vecs, item_mask,
            deterministic=deterministic)

        # Learnable scalar gate, init 0.5 pre-sigmoid (model.py:411,443-444).
        gate = self.param("gate", nn.initializers.constant(0.5), (1,),
                          self.param_dtype)
        alpha = jax.nn.sigmoid(gate.astype(jnp.float32)).astype(user_vecs.dtype)
        fused = alpha * user_vecs + (1.0 - alpha) * cross_out.astype(user_vecs.dtype)

        pooled = AttnPool1D(dropout=self.dropout,
                            nan_guard=self.pool_nan_guard, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="pool")(fused, user_mask,
                                         deterministic=deterministic)
        if not self.final_mlp:
            return pooled
        normed = nn.LayerNorm(dtype=self.dtype, name="norm")(pooled)
        normed = normed.astype(self.dtype)
        mlp_out = Mlp(4 * d, d, activation=gelu_exact, dropout=self.dropout,
                      out_dropout=self.dropout, dtype=self.dtype,
                      param_dtype=self.param_dtype,
                      name="mlp")(normed, deterministic=deterministic)
        return normed + mlp_out


class EnhancedCrossFuse(nn.Module):
    depth: int = 2
    n_heads: int = 8
    dropout: float = 0.1
    final_proj: bool = True      # baseline True (model.py:507);
                                 # HoME returns fused+identity (model_HoME.py:522)
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, v_cls: Array, t_cls: Array, *,
                 deterministic: bool = True) -> Array:
        d = v_cls.shape[-1]
        cat = jnp.concatenate([v_cls, t_cls], axis=-1)
        identity = nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                            name="res_proj")(cat)
        identity = nn.LayerNorm(dtype=self.dtype,
                                name="res_norm")(identity).astype(self.dtype)

        x = jnp.stack([v_cls, t_cls], axis=1)  # [B, 2, D]
        for i in range(self.depth):
            x = PreNormBlock(self.n_heads, dropout=self.dropout,
                             dtype=self.dtype, param_dtype=self.param_dtype,
                             name=f"layer_{i}")(x, None,
                                                deterministic=deterministic)
        v_fused, t_fused = x[:, 0], x[:, 1]

        # Gate MLP: Linear(2d, d/2) -> GELU -> Linear(d/2, 1, bias=0.5)
        # -> sigmoid (model.py:475-481).
        g = nn.Dense(d // 2, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="gate_fc1")(jnp.concatenate([v_fused, t_fused], -1))
        g = gelu_exact(g)
        g = nn.Dense(1, dtype=self.dtype, param_dtype=self.param_dtype,
                     bias_init=nn.initializers.constant(0.5),
                     name="gate_fc2")(g)
        g = jax.nn.sigmoid(g)
        fused = g * v_fused + (1.0 - g) * t_fused

        if not self.final_proj:
            return fused + identity
        out = nn.LayerNorm(dtype=self.dtype,
                           name="proj_norm")(fused + identity)
        out = nn.Dense(d, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="proj_fc")(out.astype(self.dtype))
        out = gelu_exact(out)
        return HashDropout(self.dropout)(out, deterministic=deterministic)

"""jit-compiled train / eval / BN-recalibration steps.

One optimizer step == one XLA program: a `lax.scan` over `grad_accum`
micro-batches accumulates gradients on-device, then a single optimizer
update runs — under a data mesh XLA emits one COMBINED gradient psum per
micro-batch over ICI (<1% of step time at this scale; measured HLO
analysis in docs/DESIGN.md "Gradient collectives under grad
accumulation"), the TPU-native analogue of the reference's DDP bucketed
allreduce + `no_sync` accumulation (train.py:266-277).

NaN handling is in-graph (replaces the host-side has_nan checks,
train.py:194-200,232-261): a micro-batch whose loss is non-finite contributes
zero gradient and is counted; if every micro-batch was bad the whole update
is skipped (params/opt_state carried through unchanged).  Because the whole
step is one SPMD program, every replica takes the same decision by
construction — the reference needed an explicit all_reduce(MAX) skip-vote for
this (train_HoME.py:329-336).
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..models.mmoe import MMoERecModel
from .losses import total_loss
from .optimizer import merge_params


class TrainState(struct.PyTreeNode):
    step: jax.Array                     # optimizer steps taken
    trainable: Any                      # flat {path-tuple: leaf}
    frozen: Any                         # flat {path-tuple: leaf}
    batch_stats: Any                    # nested (possibly empty) dict
    opt_state: Any


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def make_train_step(cfg: Config, model: MMoERecModel,
                    tx: optax.GradientTransformation
                    ) -> Callable[[TrainState, Dict, jax.Array],
                                  Tuple[TrainState, Dict]]:
    home = cfg.model.variant == "home"
    loss_cfg = cfg.train.loss
    accum = cfg.train.optim.grad_accum

    def micro_loss(trainable, frozen, batch_stats, micro, rng):
        params = merge_params(trainable, frozen)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out, mutated = model.apply(
            variables, micro, deterministic=False,
            bn_use_running_average=False, rngs={"dropout": rng},
            mutable=["batch_stats"] if batch_stats else [])
        parts = total_loss(out.logit_good, out.logit_best,
                           micro["label_good"], micro["label_best"],
                           loss_cfg, aux=out.aux, home=home)
        new_stats = mutated.get("batch_stats", batch_stats) if batch_stats \
            else batch_stats
        return parts.total, (parts, new_stats)

    grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

    def train_step(state: TrainState, batch: Dict[str, jax.Array],
                   dropout_rng: jax.Array) -> Tuple[TrainState, Dict]:
        """batch arrays are stacked micro-batches: [accum, ...]."""
        zero_grads = jax.tree.map(jnp.zeros_like, state.trainable)

        def body(carry, idx):
            grads_acc, stats, n_good, main_acc, cl_acc = carry
            micro = jax.tree.map(lambda x: x[idx], batch)
            rng = jax.random.fold_in(dropout_rng, idx)
            (loss, (parts, new_stats)), grads = grad_fn(
                state.trainable, state.frozen, stats, micro, rng)
            ok = jnp.isfinite(loss)
            grads_acc = jax.tree.map(
                lambda acc, g: acc + jnp.where(ok, g, 0.0), grads_acc, grads)
            stats = _tree_where(ok, new_stats, stats) if stats else stats
            return ((grads_acc, stats, n_good + ok.astype(jnp.int32),
                     main_acc + jnp.where(ok, parts.main, 0.0),
                     cl_acc + jnp.where(ok, parts.contrastive, 0.0)), None)

        init = (zero_grads, state.batch_stats, jnp.zeros((), jnp.int32),
                jnp.zeros(()), jnp.zeros(()))
        if accum == 1:
            # no scan wrapper: lets XLA fuse across the whole step
            (grads, stats, n_good, main_sum, cl_sum), _ = body(init, 0)
        else:
            (grads, stats, n_good, main_sum, cl_sum), _ = jax.lax.scan(
                body, init, jnp.arange(accum))

        # Reference divides every micro-loss by ACCUM regardless of skips
        # (train.py:258) — grads scale likewise.
        grads = jax.tree.map(lambda g: g / accum, grads)
        grad_norm = optax.global_norm(grads)

        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.trainable)
        new_trainable = optax.apply_updates(state.trainable, updates)

        any_good = n_good > 0
        new_state = state.replace(
            step=state.step + any_good.astype(state.step.dtype),
            trainable=_tree_where(any_good, new_trainable, state.trainable),
            batch_stats=stats,
            opt_state=_tree_where(any_good, new_opt_state, state.opt_state),
        )
        denom = jnp.maximum(n_good, 1).astype(jnp.float32)
        metrics = {
            "loss": main_sum / denom + cl_sum / denom,
            "main_loss": main_sum / denom,
            "contrastive_loss": cl_sum / denom,
            "grad_norm": grad_norm,
            "skipped_micro": accum - n_good,
        }
        return new_state, metrics

    return train_step


def make_eval_step(cfg: Config, model: MMoERecModel):
    """Deterministic forward -> sigmoid probabilities (ref
    inference_and_auc.py:130-156)."""

    def eval_step(trainable, frozen, batch_stats,
                  batch: Dict[str, jax.Array]):
        params = merge_params(trainable, frozen)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, batch, deterministic=True)
        return {
            "prob_good": jax.nn.sigmoid(out.logit_good),
            "prob_best": jax.nn.sigmoid(out.logit_best),
            "label_good": batch["label_good"],
            "label_best": batch["label_best"],
            "valid": batch["valid"],
        }

    return eval_step


def make_bn_recalibration_step(cfg: Config, model: MMoERecModel):
    """Full forward with ONLY BatchNorm running stats updating (weights
    untouched, dropout off) == recalibrate_bn (ref infer_auc_HoME:64-125)."""

    def recal_step(trainable, frozen, batch_stats,
                   batch: Dict[str, jax.Array]):
        params = merge_params(trainable, frozen)
        _, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch,
            deterministic=True, bn_use_running_average=False,
            mutable=["batch_stats"])
        return mutated["batch_stats"]

    return recal_step


def init_model_variables(cfg: Config, model: MMoERecModel, rng: jax.Array,
                         sample_batch: Dict[str, jax.Array]):
    # jit the init: eager init dispatches hundreds of tiny ops, which is
    # pathological over a remote-device transport.
    variables = jax.jit(model.init)(rng, sample_batch)
    return variables["params"], variables.get("batch_stats", {})

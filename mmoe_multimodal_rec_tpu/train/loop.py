"""Trainer: builds model/optimizer/state, jit-compiles the step over the
mesh, and drives the epoch loop with logging, checkpointing and resume.

Replaces train.py:77-424 / train_HoME.py:118-536.  Key structural changes:
- ONE jit step per optimizer update (scan-accumulated micro-batches) instead
  of `accum` python iterations with DDP no_sync bookkeeping;
- host tokenization runs in parallel loader threads, overlapped with device
  compute; `device_prefetch` keeps batches device-resident ahead of time;
- the step loop never blocks on the device: metrics are fetched in bulk
  every `log_every` steps, so step N+1 dispatches while N executes (the
  reference synchronizes every step to print, train.py:307-310);
- per-step dropout RNG = fold_in(base_key, host_step) — a pure function of
  the step index, so resume needs no RNG state, only the counter;
- params/opt-state live sharded on the mesh (replicated under pure DP,
  TP-sharded when model_parallel > 1);
- per-epoch checkpoints + loss curves (reference artifact parity) PLUS
  mid-epoch orbax checkpoints (train.checkpoint_every) carrying the exact
  resume position {epoch, opt_step_in_epoch, host_step}; the deterministic
  loader fast-forwards by host_step*accum batches on restore.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.loader import device_prefetch, make_train_loader
from ..data.packer import packer_from_config
from ..models.mmoe import MMoERecModel
from ..parallel.mesh import batch_shardings, make_mesh, param_shardings, replicated
from ..utils.metrics import MetricsLogger, Throughput
from ..utils.plotting import plot_epoch_losses, plot_loss_curves
from .checkpoint import CheckpointManager
from .optimizer import make_optimizer, label_param, split_trainable
from .preemption import PreemptionGuard
from .step import TrainState, init_model_variables, make_train_step


def dummy_batch(cfg: Config, batch_size: Optional[int] = None,
                accum: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Zero batch with the training shapes (for init/compile)."""
    b = batch_size or cfg.train.batch_size
    pk = cfg.model.packer
    n = pk.chunk_budget or b * pk.max_chunks_per_sample
    s = pk.fixed_sent_count
    img = cfg.model.image
    batch = {
        "user_tokens": np.zeros((n, pk.max_tok), np.int32),
        "user_sent_chunk": np.full((b, s), -1, np.int32),
        "user_sent_tok": np.full((b, s), -1, np.int32),
        "item_tokens": np.zeros((n, pk.max_tok), np.int32),
        "item_sent_chunk": np.full((b, s), -1, np.int32),
        "item_sent_tok": np.full((b, s), -1, np.int32),
        "patches": np.zeros((b, img.num_patches, img.patch_dim), np.uint8),
        "has_image": np.zeros((b,), np.int32),
        "label_good": np.zeros((b,), np.float32),
        "label_best": np.zeros((b,), np.float32),
    }
    if accum:
        batch = {k: np.broadcast_to(v, (accum,) + v.shape).copy()
                 for k, v in batch.items()}
    return batch


def stack_micro_batches(batches) -> Dict[str, np.ndarray]:
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]
            if k != "valid"}


class Trainer:
    def __init__(self, cfg: Config, mesh=None, init_rng: Optional[jax.Array] = None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.train.mesh)
        self.model = MMoERecModel(cfg.model)
        variant = cfg.model.variant

        rng = init_rng if init_rng is not None else \
            jax.random.PRNGKey(cfg.train.seed)
        sample = dummy_batch(cfg, batch_size=cfg.train.batch_size)
        params, batch_stats = init_model_variables(cfg, self.model, rng, sample)
        trainable, frozen = split_trainable(params, variant)
        labels = {k: label_param(k, variant) for k in trainable}
        self.tx = make_optimizer(cfg.train.optim, variant, labels)

        # --- shard state onto the mesh -----------------------------------
        # Params get explicit TP/replicated placements; the optimizer state
        # is initialized from the already-sharded params (zeros_like etc.
        # inherit shardings), and jit propagates placements from there.
        rep = replicated(self.mesh)
        self._train_shard = param_shardings(trainable, self.mesh)
        self._frozen_shard = param_shardings(frozen, self.mesh)
        trainable = jax.device_put(trainable, self._train_shard)
        frozen = jax.device_put(frozen, self._frozen_shard)
        batch_stats = jax.device_put(batch_stats,
                                     jax.tree.map(lambda _: rep, batch_stats))
        opt_state = jax.jit(self.tx.init)(trainable)
        # Leaves NOT derived from the sharded params (the Adam `count`
        # scalars) come out of init uncommitted; the compiled step returns
        # them mesh-committed, so the 2nd step call would see different
        # input types and silently RECOMPILE the whole program (~minutes at
        # full size, caught via jax_explain_cache_misses).  Commit them to
        # the mesh up front.
        def commit(x):
            s = getattr(x, "sharding", None)
            if isinstance(s, jax.sharding.NamedSharding) and \
                    s.mesh == self.mesh:
                return x
            return jax.device_put(x, rep)
        opt_state = jax.tree.map(commit, opt_state)
        self.state = TrainState(
            step=jax.device_put(jnp.zeros((), jnp.int32), rep),
            trainable=trainable, frozen=frozen, batch_stats=batch_stats,
            opt_state=opt_state)

        step_fn = make_train_step(cfg, self.model, self.tx)
        accum_batch = dummy_batch(cfg, accum=cfg.train.optim.grad_accum)
        self._batch_sharding = batch_shardings(accum_batch, self.mesh,
                                               accum_dim=True)
        self.train_step = jax.jit(step_fn, donate_argnums=(0,),
                                  compiler_options=cfg.train.compiler_options)
        self._dropout_rng = jax.random.key(cfg.train.seed + 1,
                                           impl=cfg.train.rng_impl)
        # host-side optimizer-step counter: drives the per-step dropout
        # stream (fold_in) and the resume position; unlike state.step it
        # also counts NaN-skipped steps, so the RNG/data streams of a
        # resumed run line up even across skips
        self.host_step = 0

    # ------------------------------------------------------------------
    def run_step(self, stacked_batch, *, device_resident: bool = False
                 ) -> Dict[str, Any]:
        if not device_resident:
            stacked_batch = jax.device_put(stacked_batch,
                                           self._batch_sharding)
        sub = jax.random.fold_in(self._dropout_rng, self.host_step)
        self.host_step += 1
        self.state, metrics = self.train_step(self.state, stacked_batch, sub)
        return metrics

    def fit(self, loader_iter: Iterator[Dict[str, np.ndarray]],
            epochs: Optional[int] = None,
            steps_per_epoch: Optional[int] = None,
            logger: Optional[MetricsLogger] = None,
            ckpt: Optional[CheckpointManager] = None,
            start_epoch: int = 0, start_opt_step: int = 0,
            preempt: Optional["PreemptionGuard"] = None,
            eval_fn=None) -> Dict[str, Any]:
        """eval_fn(state) -> {'good': auc, 'best': auc, 'n': int}: called
        every train.eval_every optimizer steps for mid-training validation
        monitoring (train_from_config wires eval/evaluate over
        data.valid_pattern; the reference has no in-training eval)."""
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.train.epochs
        accum = cfg.train.optim.grad_accum
        micro_steps = steps_per_epoch if steps_per_epoch is not None else (
            cfg.train.home_steps_per_epoch if cfg.model.variant == "home"
            else cfg.train.steps_per_epoch)
        opt_steps = micro_steps // accum
        logger = logger or MetricsLogger(
            os.path.join(cfg.train.output_dir, "metrics.jsonl"))
        meter = Throughput()
        history = {"step": [], "loss": [], "main_loss": [],
                   "contrastive_loss": []}
        epoch_losses = {"total": [], "main": [], "contrastive": []}
        global_examples = accum * cfg.train.batch_size

        # host->device pipeline: stack micro-batches and stage them on the
        # mesh `num_prefetch` steps ahead of the compute stream
        it = iter(loader_iter)

        def stacked_iter():
            while True:
                micro = []
                try:
                    for _ in range(accum):
                        micro.append(next(it))
                except StopIteration:
                    # finite stream ended mid-epoch: stop cleanly (a bare
                    # next() here would surface as PEP-479 RuntimeError)
                    return
                yield stack_micro_batches(micro)

        staged = device_prefetch(stacked_iter(), n=cfg.data.num_prefetch,
                                 sharding=self._batch_sharding)

        ep_state = {"main": 0.0, "cl": 0.0, "n": 0}
        pending = []  # [(opt_step_idx, device-metrics dict)]

        def flush():
            if not pending:
                return None
            fetched = jax.device_get([m for _, m in pending])
            for (sidx, _), m in zip(pending, fetched):
                history["step"].append(sidx)
                for k in ("loss", "main_loss", "contrastive_loss"):
                    history[k].append(float(m[k]))
                ep_state["main"] += float(m["main_loss"])
                ep_state["cl"] += float(m["contrastive_loss"])
                ep_state["n"] += 1
            last = fetched[-1]
            pending.clear()
            return last

        profiling = False
        exhausted = False
        preempted = False
        total_opt_steps = 0
        for epoch in range(start_epoch, epochs):
            ep_state.update(main=0.0, cl=0.0, n=0)
            first = start_opt_step if epoch == start_epoch else 0
            for opt_step in range(first, opt_steps):
                if preempt is not None and preempt.requested:
                    # SIGTERM arrived (preemptible VM shutdown notice):
                    # drain pending metrics, write a durable checkpoint at
                    # the exact resume position, and return cleanly.  The
                    # completed work is opt steps < opt_step of this epoch.
                    # A periodic/epoch save may already sit at this exact
                    # host_step — orbax refuses to re-save an existing step
                    # (StepAlreadyExistsError), and that checkpoint already
                    # holds the right position, so skip in that case.
                    flush()
                    if ckpt is not None and \
                            ckpt.latest_step() != self.host_step:
                        ckpt.save(self.host_step, self.state,
                                  extra=self._resume_extra(epoch, opt_step),
                                  wait=True)
                    preempted = True
                    break
                if cfg.train.profile:
                    if total_opt_steps == cfg.train.profile_start:
                        jax.profiler.start_trace(cfg.train.profile_dir)
                        profiling = True
                    elif profiling and total_opt_steps == (
                            cfg.train.profile_start + cfg.train.profile_steps):
                        jax.block_until_ready(self.state.step)
                        jax.profiler.stop_trace()
                        profiling = False
                total_opt_steps += 1
                try:
                    batch = next(staged)
                except StopIteration:
                    # Train loaders repeat forever (make_train_loader), but a
                    # finite stream (eval-style loader, steps_per_epoch over-
                    # estimate) must end as a clean end-of-data, not a bare
                    # StopIteration escaping fit().
                    exhausted = True
                    break
                metrics = self.run_step(batch, device_resident=True)
                meter.update(global_examples)
                pending.append((self.host_step, metrics))
                if len(pending) >= cfg.train.log_every:
                    last = flush()   # the only device sync in the loop
                    logger.log({"epoch": epoch, "step": self.host_step,
                                "examples_per_sec": meter.rate(),
                                **{k: float(v) for k, v in last.items()}})
                if cfg.train.checkpoint_every and ckpt is not None and \
                        (opt_step + 1) % cfg.train.checkpoint_every == 0:
                    flush()
                    ckpt.save(self.host_step, self.state,
                              extra=self._resume_extra(epoch, opt_step + 1))
                if cfg.train.eval_every and eval_fn is not None and \
                        (opt_step + 1) % cfg.train.eval_every == 0:
                    flush()
                    r = eval_fn(self.state)
                    logger.log({"epoch": epoch, "step": self.host_step,
                                "eval_auc_good": r["good"],
                                "eval_auc_best": r["best"],
                                "eval_n": r["n"]})
            if preempted:
                # partial epoch: no epoch-loss entry, no epoch checkpoint —
                # the preemption save above already holds the resume point
                break
            flush()
            if ep_state["n"]:    # a resumed, already-complete epoch runs 0
                n = ep_state["n"]
                epoch_losses["main"].append(ep_state["main"] / n)
                epoch_losses["contrastive"].append(ep_state["cl"] / n)
                epoch_losses["total"].append(
                    (ep_state["main"] + ep_state["cl"]) / n)
                logger.log({"epoch": epoch,
                            "epoch_loss": epoch_losses["total"][-1]})
                if ckpt is not None:
                    ckpt.save(self.host_step, self.state,
                              extra=self._resume_extra(epoch + 1, 0))
            if exhausted:
                break
        if profiling:
            jax.block_until_ready(self.state.step)
            jax.profiler.stop_trace()
        out_dir = cfg.train.output_dir
        os.makedirs(out_dir, exist_ok=True)
        plot_loss_curves(history["step"],
                         {"total": history["loss"],
                          "main": history["main_loss"],
                          "contrastive": history["contrastive_loss"]},
                         out_dir)
        plot_epoch_losses(epoch_losses, out_dir)
        return {"history": history, "epoch_losses": epoch_losses,
                "examples_per_sec": meter.rate(), "preempted": preempted}

    def _resume_extra(self, epoch: int, opt_step_in_epoch: int) -> Dict:
        return {"epoch": epoch, "opt_step_in_epoch": opt_step_in_epoch,
                "host_step": self.host_step}


def train_from_config(cfg: Config) -> Dict[str, Any]:
    """End-to-end CLI entry: shards -> loader -> Trainer.fit with resume."""
    from ..data.io import fs_glob
    shards = fs_glob(cfg.data.train_pattern)
    if not shards:
        raise FileNotFoundError(
            f"no shards match {cfg.data.train_pattern!r}")
    packer = packer_from_config(cfg)
    trainer = Trainer(cfg)
    ckpt = CheckpointManager(cfg.train.checkpoint_dir)
    start_epoch, start_opt_step = 0, 0
    if cfg.train.resume:
        restored, extra = ckpt.restore(trainer.state)
        if restored is not None:
            # re-place restored host arrays with the init state's exact
            # shardings: a bare assignment would make the first step compile
            # for uncommitted inputs and the SECOND step recompile for the
            # mesh-committed outputs (a silent duplicate multi-minute
            # compile at full size)
            shardings = jax.tree.map(lambda x: x.sharding, trainer.state)
            trainer.state = jax.device_put(restored, shardings)
            extra = extra or {}
            start_epoch = int(extra.get("epoch", 0))
            start_opt_step = int(extra.get("opt_step_in_epoch", 0))
            trainer.host_step = int(extra.get("host_step", 0))
            print(f"[resume] restored step={int(trainer.state.step)} "
                  f"epoch={start_epoch} opt_step={start_opt_step} "
                  f"host_step={trainer.host_step}", flush=True)
    loader = make_train_loader(
        shards, cfg.train.batch_size, packer,
        host_index=jax.process_index(), host_count=jax.process_count(),
        shuffle_buffer=cfg.data.shuffle_buffer, seed=cfg.train.seed,
        chunk_budget=cfg.model.packer.chunk_budget,
        num_prefetch=cfg.data.num_prefetch,
        num_threads=cfg.data.num_tokenizer_threads,
        shard_shuffle=cfg.data.shard_shuffle,
        on_shard_error=cfg.data.on_shard_error,
        skip_batches=trainer.host_step * cfg.train.optim.grad_accum)
    eval_fn = None
    if cfg.train.eval_every and cfg.data.valid_pattern:
        from ..eval.evaluate import evaluate
        from .step import make_eval_step
        eval_shards = fs_glob(cfg.data.valid_pattern)
        if not eval_shards:
            # fail at STARTUP, not eval_every opt steps into the run
            raise FileNotFoundError(
                f"train.eval_every is set but no shards match "
                f"data.valid_pattern={cfg.data.valid_pattern!r}")
        eval_step = jax.jit(make_eval_step(cfg, trainer.model),
                            compiler_options=cfg.train.compiler_options)

        def eval_fn(state):
            return evaluate(cfg, trainer.model, state.trainable,
                            state.frozen, state.batch_stats, eval_shards,
                            packer=packer, eval_step=eval_step,
                            max_batches=cfg.train.eval_max_batches or None)
    try:
        with PreemptionGuard() as guard:
            result = trainer.fit(iter(loader), ckpt=ckpt,
                                 start_epoch=start_epoch,
                                 start_opt_step=start_opt_step,
                                 preempt=guard, eval_fn=eval_fn)
        if result.get("preempted"):
            print(f"[preempt] SIGTERM: checkpointed at host_step="
                  f"{trainer.host_step}; rerun with --train.resume=true "
                  f"to continue bit-identically", flush=True)
        return result
    finally:
        loader.close()
        ckpt.close()

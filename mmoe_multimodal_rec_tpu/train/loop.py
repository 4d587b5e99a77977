"""Trainer: builds model/optimizer/state, jit-compiles the step over the
mesh, and drives the epoch loop with logging, checkpointing and resume.

Replaces train.py:77-424 / train_HoME.py:118-536.  Key structural changes:
- ONE jit step per optimizer update (scan-accumulated micro-batches) instead
  of `accum` python iterations with DDP no_sync bookkeeping;
- host tokenization runs in loader threads, overlapped with device compute;
- params/opt-state live sharded on the mesh (replicated under pure DP,
  TP-sharded when model_parallel > 1); batches are placed with a data-axis
  sharding before each step;
- per-epoch checkpoints + loss curves (reference artifact parity) PLUS
  mid-epoch orbax checkpoints with full resume.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.loader import make_train_loader
from ..data.packer import TextPacker
from ..data.native_tokenizer import load_best_tokenizer as load_tokenizer
from ..models.mmoe import MMoERecModel
from ..parallel.mesh import batch_shardings, make_mesh, param_shardings, replicated
from ..utils.metrics import MetricsLogger, Throughput
from ..utils.plotting import plot_epoch_losses, plot_loss_curves
from .checkpoint import CheckpointManager
from .optimizer import make_optimizer, label_param, split_trainable
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
        self.state = TrainState(
            step=jax.device_put(jnp.zeros((), jnp.int32), rep),
            trainable=trainable, frozen=frozen, batch_stats=batch_stats,
            opt_state=opt_state)

        step_fn = make_train_step(cfg, self.model, self.tx)
        accum_batch = dummy_batch(cfg, accum=cfg.train.optim.grad_accum)
        self._batch_sharding = batch_shardings(accum_batch, self.mesh,
                                               accum_dim=True)
        self.train_step = jax.jit(step_fn, donate_argnums=(0,))
        self._dropout_rng = jax.random.key(cfg.train.seed + 1,
                                           impl=cfg.train.rng_impl)

    # ------------------------------------------------------------------
    def run_step(self, stacked_batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        batch = jax.device_put(stacked_batch, self._batch_sharding)
        self._dropout_rng, sub = jax.random.split(self._dropout_rng)
        self.state, metrics = self.train_step(self.state, batch, sub)
        return metrics

    def fit(self, loader_iter: Iterator[Dict[str, np.ndarray]],
            epochs: Optional[int] = None,
            steps_per_epoch: Optional[int] = None,
            logger: Optional[MetricsLogger] = None,
            ckpt: Optional[CheckpointManager] = None,
            start_epoch: int = 0) -> Dict[str, Any]:
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

        profiling = False
        total_opt_steps = 0
        it = iter(loader_iter)
        for epoch in range(start_epoch, epochs):
            ep_main, ep_cl, n = 0.0, 0.0, 0
            for _ in range(opt_steps):
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
                micro = [next(it) for _ in range(accum)]
                stacked = stack_micro_batches(micro)
                metrics = self.run_step(stacked)
                meter.update(global_examples)
                step = int(self.state.step)
                ep_main += float(metrics["main_loss"])
                ep_cl += float(metrics["contrastive_loss"])
                n += 1
                if n % cfg.train.log_every == 0:
                    logger.log({"epoch": epoch, "step": step,
                                "examples_per_sec": meter.rate(), **metrics})
                history["step"].append(step)
                for k in ("loss", "main_loss", "contrastive_loss"):
                    history[k].append(float(metrics[k]))
            epoch_losses["main"].append(ep_main / max(n, 1))
            epoch_losses["contrastive"].append(ep_cl / max(n, 1))
            epoch_losses["total"].append((ep_main + ep_cl) / max(n, 1))
            logger.log({"epoch": epoch, "epoch_loss": epoch_losses["total"][-1]})
            if ckpt is not None:
                ckpt.save(int(self.state.step), self.state,
                          extra={"epoch": epoch + 1})
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
                "examples_per_sec": meter.rate()}


def train_from_config(cfg: Config) -> Dict[str, Any]:
    """End-to-end CLI entry: shards -> loader -> Trainer.fit with resume."""
    import glob
    shards = sorted(glob.glob(cfg.data.train_pattern))
    if not shards:
        raise FileNotFoundError(
            f"no shards match {cfg.data.train_pattern!r}")
    tokenizer = load_tokenizer(cfg.data.vocab_path, cfg.model.text.vocab_size)
    packer = TextPacker(tokenizer, cfg.model.packer)
    loader = make_train_loader(
        shards, cfg.train.batch_size, packer,
        host_index=jax.process_index(), host_count=jax.process_count(),
        shuffle_buffer=cfg.data.shuffle_buffer, seed=cfg.train.seed,
        chunk_budget=cfg.model.packer.chunk_budget,
        num_prefetch=cfg.data.num_prefetch)
    trainer = Trainer(cfg)
    ckpt = CheckpointManager(cfg.train.checkpoint_dir)
    start_epoch = 0
    if cfg.train.resume:
        restored, extra = ckpt.restore(trainer.state)
        if restored is not None:
            shardings = jax.tree.map(lambda x: x.sharding, trainer.state)
            trainer.state = jax.device_put(restored, shardings)
            start_epoch = int((extra or {}).get("epoch", 0))
            print(f"[resume] restored step={int(trainer.state.step)} "
                  f"epoch={start_epoch}", flush=True)
    try:
        return trainer.fit(iter(loader), ckpt=ckpt, start_epoch=start_epoch)
    finally:
        loader.close()
        ckpt.close()

"""Training-layer tests: losses vs torch, optimizer partitioning/schedules,
end-to-end tiny train steps (baseline + HoME), NaN-skip, checkpoint resume."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from mmoe_multimodal_rec_tpu.train import (CheckpointManager, Trainer,
                                           contrastive_loss, label_param,
                                           weighted_bce_with_logits)
from mmoe_multimodal_rec_tpu.train.optimizer import freeze_warmup_schedule
from util import stacked_batch, tiny_config


# ---------------------------------------------------------------------------
# losses vs torch
# ---------------------------------------------------------------------------

def test_weighted_bce_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=32).astype(np.float32) * 3
    labels = (rng.random(32) < 0.4).astype(np.float32)
    for pw in (0.867, 2.554, 1.0):
        want = torch.nn.BCEWithLogitsLoss(
            pos_weight=torch.tensor(pw))(torch.tensor(logits),
                                         torch.tensor(labels))
        got = weighted_bce_with_logits(jnp.asarray(logits),
                                       jnp.asarray(labels), pw)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_contrastive_matches_torch():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(8, 16)).astype(np.float32)
    p = rng.normal(size=(8, 16)).astype(np.float32)
    at, pt = torch.tensor(a), torch.tensor(p)
    an = torch.nn.functional.normalize(at, p=2, dim=1)
    pn = torch.nn.functional.normalize(pt, p=2, dim=1)
    sim = an @ pn.t() / 0.07
    want = torch.nn.functional.cross_entropy(sim, torch.arange(8))
    got = contrastive_loss(jnp.asarray(a), jnp.asarray(p), 0.07)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


# ---------------------------------------------------------------------------
# optimizer partitioning + schedule
# ---------------------------------------------------------------------------

def test_label_param_groups():
    assert label_param(("user_expert", "encoder", "layer_0", "attention",
                        "query", "lora_a"), "baseline") == "lora"
    assert label_param(("cross_ui", "pool", "query"), "baseline") == "other"
    assert label_param(("head", "tower_good", "fc1", "kernel"),
                       "baseline") == "other"
    # reference quirk: baseline text-expert final norm is in NO group
    assert label_param(("user_expert", "norm", "scale"),
                       "baseline") == "frozen"
    # baseline img expert fully frozen (train.py:135)
    assert label_param(("img_expert", "backbone", "layer_11", "mlp", "fc1",
                        "kernel"), "baseline") == "frozen"
    # HoME: ViT last-2 layers + projection head train (train_HoME.py:230-243)
    assert label_param(("img_expert", "backbone", "layer_11", "mlp", "fc1",
                        "kernel"), "home") == "img_ft"
    assert label_param(("img_expert", "backbone", "layer_9", "mlp", "fc1",
                        "kernel"), "home") == "frozen"
    assert label_param(("img_expert", "projection_head", "fc1", "kernel"),
                       "home") == "img_ft"
    assert label_param(("u_doc_wrapper", "norm", "scale"), "home") == "other"


def test_freeze_warmup_schedule():
    s = freeze_warmup_schedule(2e-5, freeze_steps=2000, unfreeze_steps=1200)
    assert float(s(0)) == 0.0
    assert float(s(2000)) == 0.0
    np.testing.assert_allclose(float(s(2600)), 2e-5 * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(s(3200)), 2e-5, rtol=1e-6)
    np.testing.assert_allclose(float(s(9999)), 2e-5, rtol=1e-6)


# ---------------------------------------------------------------------------
# end-to-end tiny training steps
# ---------------------------------------------------------------------------

def _flat_array_equal(a, b):
    return all(np.array_equal(np.asarray(a[k]), np.asarray(b[k])) for k in a)


def test_train_step_baseline_updates_correct_groups():
    cfg = tiny_config("baseline")
    trainer = Trainer(cfg)
    before_trainable = {k: np.asarray(v) for k, v in
                        trainer.state.trainable.items()}
    before_frozen = {k: np.asarray(v) for k, v in
                     trainer.state.frozen.items()}
    m = trainer.run_step(stacked_batch(cfg, seed=0))
    assert np.isfinite(float(m["loss"]))
    assert int(m["skipped_micro"]) == 0
    assert int(trainer.state.step) == 1
    # frozen untouched
    assert _flat_array_equal(before_frozen, trainer.state.frozen)
    # "other" group moved
    other_keys = [k for k in before_trainable
                  if label_param(k, "baseline") == "other"]
    assert any(not np.array_equal(before_trainable[k],
                                  np.asarray(trainer.state.trainable[k]))
               for k in other_keys)
    # lora frozen at lr=0 for the first freeze_steps optimizer steps
    lora_keys = [k for k in before_trainable
                 if label_param(k, "baseline") == "lora"]
    assert all(np.array_equal(before_trainable[k],
                              np.asarray(trainer.state.trainable[k]))
               for k in lora_keys)
    # ... and moves once past the freeze horizon (freeze=2, warm=2)
    for s in range(4):
        trainer.run_step(stacked_batch(cfg, seed=s + 1))
    assert any(not np.array_equal(before_trainable[k],
                                  np.asarray(trainer.state.trainable[k]))
               for k in lora_keys)


def test_train_step_nan_batch_skipped():
    cfg = tiny_config("baseline")
    trainer = Trainer(cfg)
    good = stacked_batch(cfg, seed=0)
    trainer.run_step(good)
    before = {k: np.asarray(v) for k, v in trainer.state.trainable.items()}
    step_before = int(trainer.state.step)
    bad = dict(good)
    bad["label_good"] = np.full_like(good["label_good"], np.nan)
    m = trainer.run_step(bad)
    assert int(m["skipped_micro"]) == cfg.train.optim.grad_accum
    assert int(trainer.state.step) == step_before  # update skipped
    assert _flat_array_equal(before, trainer.state.trainable)


def test_train_step_home_updates_bn_stats():
    cfg = tiny_config("home")
    trainer = Trainer(cfg)
    stats_before = jax.tree.map(np.asarray, trainer.state.batch_stats)
    m = trainer.run_step(stacked_batch(cfg, seed=0))
    assert np.isfinite(float(m["loss"]))
    assert float(m["contrastive_loss"]) > 0.0
    after = trainer.state.batch_stats
    changed = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
        stats_before, after))
    assert not changed  # BN running stats moved
    # ViT last-2 layers flagged for fine-tune exist in trainable set
    assert any(label_param(k, "home") == "img_ft"
               for k in trainer.state.trainable)


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config("baseline")
    trainer = Trainer(cfg)
    trainer.run_step(stacked_batch(cfg, seed=0))
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(int(trainer.state.step), trainer.state,
              extra={"epoch": 1}, wait=True)
    trainer2 = Trainer(cfg)
    restored, extra = mngr.restore(trainer2.state)
    assert restored is not None
    assert int(restored.step) == int(trainer.state.step)
    assert extra["epoch"] == 1
    assert _flat_array_equal(
        {k: np.asarray(v) for k, v in trainer.state.trainable.items()},
        restored.trainable)
    # restored state steps fine
    trainer2.state = restored
    m = trainer2.run_step(stacked_batch(cfg, seed=5))
    assert np.isfinite(float(m["loss"]))
    mngr.close()


def test_resume_reproduces_unbroken_run(tmp_path):
    """True resume (VERDICT #4): train 6 steps in one go vs train 3,
    checkpoint, restore into a FRESH trainer, train 3 more on the same
    batch stream — the metric streams must be identical (same params, same
    fold_in(host_step) dropout streams, same data)."""
    cfg = tiny_config("baseline")
    batches = [stacked_batch(cfg, seed=s) for s in range(6)]

    t1 = Trainer(cfg)
    unbroken = [t1.run_step(b) for b in batches]
    unbroken = [{k: float(v) for k, v in m.items()} for m in unbroken]

    t2 = Trainer(cfg)
    first = [t2.run_step(b) for b in batches[:3]]
    first = [{k: float(v) for k, v in m.items()} for m in first]
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(t2.host_step, t2.state,
              extra={"epoch": 0, "opt_step_in_epoch": 3,
                     "host_step": t2.host_step}, wait=True)

    t3 = Trainer(cfg)
    restored, extra = mngr.restore(t3.state)
    # assign host arrays directly: the compiled step places them per its
    # input shardings (explicit device_put would need per-leaf opt-state
    # shardings)
    t3.state = restored
    t3.host_step = int(extra["host_step"])
    assert t3.host_step == 3
    second = [t3.run_step(b) for b in batches[3:]]
    second = [{k: float(v) for k, v in m.items()} for m in second]
    mngr.close()

    resumed = first + second
    for a, b in zip(unbroken, resumed):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6, err_msg=k)


def test_loader_skip_batches_matches_unbroken_stream(tmp_path):
    """The loader's deterministic fast-forward: skipping N batches yields
    the same stream as consuming N batches of a fresh loader."""
    from mmoe_multimodal_rec_tpu.data.loader import make_train_loader
    from mmoe_multimodal_rec_tpu.data.packer import TextPacker
    from mmoe_multimodal_rec_tpu.data.synthetic import write_synthetic_shards
    from util import tiny_tokenizer

    cfg = tiny_config("baseline")
    paths = write_synthetic_shards(str(tmp_path), n_samples=80,
                                   samples_per_shard=40, seed=7)
    packer = TextPacker(tiny_tokenizer(cfg), cfg.model.packer)
    full = make_train_loader(paths, 4, packer, seed=3, shuffle_buffer=8,
                             num_threads=2)
    it = iter(full)
    want = None
    for _ in range(7):
        want = next(it)
    full.close()
    skipped = make_train_loader(paths, 4, packer, seed=3, shuffle_buffer=8,
                                num_threads=2, skip_batches=6)
    got = next(iter(skipped))
    skipped.close()
    for k in want:
        np.testing.assert_array_equal(want[k], got[k], err_msg=k)


def test_preemption_guard_saves_and_resumes(tmp_path):
    """A real SIGTERM mid-run (preemptible-VM shutdown notice): fit drains
    pending metrics, writes a durable checkpoint at the exact resume
    position, and returns preempted=True — and the resumed run's metric
    stream matches an unbroken run's exactly (the reference has no resume
    path at all, train.py:351-363)."""
    import signal
    from mmoe_multimodal_rec_tpu.train.preemption import PreemptionGuard
    from util import packed_batch

    cfg = tiny_config("baseline")
    cfg.train.output_dir = str(tmp_path / "out")
    cfg.train.epochs = 1
    cfg.train.checkpoint_every = 0   # only the preemption save writes
    accum = cfg.train.optim.grad_accum
    total_opt = 6
    micros = [packed_batch(cfg, seed=i) for i in range(total_opt * accum)]

    t1 = Trainer(cfg)
    unbroken = t1.fit(iter(list(micros)), epochs=1,
                      steps_per_epoch=total_opt * accum)
    assert unbroken["preempted"] is False
    assert len(unbroken["history"]["loss"]) == total_opt

    def sigterm_after(it, n):
        for i, b in enumerate(it):
            if i == n:
                signal.raise_signal(signal.SIGTERM)
            yield b

    t2 = Trainer(cfg)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    with PreemptionGuard() as guard:
        part1 = t2.fit(sigterm_after(iter(list(micros)), 2 * accum),
                       epochs=1, steps_per_epoch=total_opt * accum,
                       ckpt=ckpt, preempt=guard)
    # handler restored on context exit
    assert signal.getsignal(signal.SIGTERM) is not guard.request
    assert part1["preempted"] is True
    n1 = len(part1["history"]["loss"])
    assert 0 < n1 < total_opt          # stopped early, after >=1 step
    assert t2.host_step == n1
    assert ckpt.latest_step() == n1    # durable save at the stop point

    t3 = Trainer(cfg)
    restored, extra = ckpt.restore(t3.state)
    ckpt.close()
    assert extra["epoch"] == 0 and extra["opt_step_in_epoch"] == n1
    t3.state = restored
    t3.host_step = int(extra["host_step"])
    part2 = t3.fit(iter(list(micros[n1 * accum:])), epochs=1,
                   steps_per_epoch=(total_opt - n1) * accum)
    resumed = part1["history"]["loss"] + part2["history"]["loss"]
    np.testing.assert_allclose(resumed, unbroken["history"]["loss"],
                               rtol=1e-6)


def test_topk_gate_sparse_and_balanced():
    """Opt-in sparse routing (model.gate_type=topk): weights are zero off
    the per-row top-k, renormalized on it, and the Switch load-balance aux
    is 1 at perfectly uniform routing / larger when collapsed."""
    import jax
    import jax.numpy as jnp
    from mmoe_multimodal_rec_tpu.models.heads import TopKGate

    gate = TopKGate(n_expert=6, k=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((32, 16)),
                    jnp.float32)
    w, balance = gate.apply(gate.init(jax.random.PRNGKey(0), x), x)
    w = np.asarray(w)
    assert w.shape == (32, 6)
    assert ((w > 0).sum(axis=1) <= 2).all()
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)
    assert float(balance) >= 1.0 - 1e-5

    # collapsed routing (one expert always wins) must score worse (higher)
    logits = jnp.zeros((32, 6)).at[:, 0].set(10.0)
    probs = jax.nn.softmax(logits, axis=-1)
    mask = jnp.zeros((32, 6)).at[:, 0].set(1.0).at[:, 1].set(1.0)
    frac = mask.mean(axis=0) / 2
    collapsed = 6 * jnp.sum(frac * probs.mean(axis=0))
    assert float(collapsed) > float(balance)


def test_topk_gating_trains_end_to_end():
    """model.gate_type=topk wires through the full step: loss finite, the
    gate-balance aux lands in the loss, gate params get grads."""
    from mmoe_multimodal_rec_tpu.train.loop import Trainer, dummy_batch

    cfg = tiny_config()
    cfg.model.gate_type = "topk"
    cfg.model.gate_topk = 2
    trainer = Trainer(cfg)
    batch = dummy_batch(cfg, batch_size=cfg.train.batch_size)
    stacked = {k: np.broadcast_to(v, (1,) + v.shape).copy()
               for k, v in batch.items()}
    m = trainer.run_step(stacked)
    assert np.isfinite(float(m["loss"]))
    assert int(m["skipped_micro"]) == 0


def test_no_recompile_on_second_step():
    """The compiled step must be traced exactly ONCE: uncommitted opt-state
    scalars (or resume-restored host arrays) used to make the 2nd call see
    different input shardings and silently recompile the whole program —
    ~8 minutes per occurrence at full size."""
    from mmoe_multimodal_rec_tpu.train.loop import Trainer, dummy_batch

    cfg = tiny_config()
    cfg.train.optim.grad_accum = 2
    trainer = Trainer(cfg)
    batch = dummy_batch(cfg, batch_size=cfg.train.batch_size)
    stacked = {k: np.broadcast_to(v, (2,) + v.shape).copy()
               for k, v in batch.items()}
    for _ in range(3):
        m = trainer.run_step(stacked)
    assert np.isfinite(float(m["loss"]))
    assert trainer.train_step._cache_size() == 1, \
        f"step retraced: {trainer.train_step._cache_size()} cache entries"


def test_mid_training_eval(tmp_path):
    """train.eval_every: validation AUC entries land in the metric stream
    at the configured cadence, and the training math is unperturbed (same
    losses as an eval-free run on the same batch stream)."""
    import json
    import os
    from mmoe_multimodal_rec_tpu.train.loop import train_from_config
    from mmoe_multimodal_rec_tpu.data.synthetic import write_synthetic_shards

    cfg = tiny_config("baseline")
    write_synthetic_shards(str(tmp_path / "shards"), n_samples=32,
                           samples_per_shard=16, seed=3)
    cfg.data.train_pattern = str(tmp_path / "shards" / "*.tar.gz")
    cfg.data.valid_pattern = str(tmp_path / "shards" / "*.tar.gz")
    cfg.train.epochs = 1
    cfg.train.steps_per_epoch = 8          # micro-steps -> 4 opt steps
    cfg.train.eval_every = 2
    cfg.train.eval_max_batches = 2
    cfg.train.log_every = 1
    cfg.train.resume = False
    cfg.train.output_dir = str(tmp_path / "out")
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    res = train_from_config(cfg)

    lines = [json.loads(l) for l in
             open(os.path.join(cfg.train.output_dir, "metrics.jsonl"))]
    evals = [l for l in lines if "eval_auc_good" in l]
    assert len(evals) == 2                 # opt steps 2 and 4
    for e in evals:
        assert 0.0 <= e["eval_auc_good"] <= 1.0
        assert e["eval_n"] == 2 * cfg.train.batch_size

    # identical losses without eval (eval must not perturb training)
    cfg2 = tiny_config("baseline")
    cfg2.data.train_pattern = cfg.data.train_pattern
    cfg2.train.epochs = 1
    cfg2.train.steps_per_epoch = 8
    cfg2.train.log_every = 1
    cfg2.train.resume = False
    cfg2.train.output_dir = str(tmp_path / "out2")
    cfg2.train.checkpoint_dir = str(tmp_path / "ckpt2")
    res2 = train_from_config(cfg2)
    np.testing.assert_allclose(res["history"]["loss"],
                               res2["history"]["loss"], rtol=1e-6)


def test_preempt_eval_checkpoint_compose(tmp_path):
    """Preemption + mid-training eval + periodic checkpoints compose: a
    preempted-and-resumed run with eval_every produces the same LOSS
    stream as an unbroken eval-free run (eval never perturbs training,
    eval cadence realigns after resume)."""
    import json
    import os
    from mmoe_multimodal_rec_tpu.train.loop import train_from_config
    from mmoe_multimodal_rec_tpu.train.preemption import PreemptionGuard
    from mmoe_multimodal_rec_tpu.data.synthetic import write_synthetic_shards

    def base_cfg(tag):
        cfg = tiny_config("baseline")
        cfg.data.train_pattern = str(tmp_path / "shards" / "*.tar.gz")
        cfg.train.epochs = 1
        cfg.train.steps_per_epoch = 12           # 6 opt steps
        cfg.train.log_every = 1
        cfg.train.output_dir = str(tmp_path / f"out_{tag}")
        cfg.train.checkpoint_dir = str(tmp_path / f"ckpt_{tag}")
        return cfg

    write_synthetic_shards(str(tmp_path / "shards"), n_samples=64,
                           samples_per_shard=32, seed=4)

    cfg = base_cfg("ref")
    cfg.train.resume = False
    ref = train_from_config(cfg)
    assert len(ref["history"]["loss"]) == 6

    cfg = base_cfg("pre")
    cfg.train.resume = True
    cfg.data.valid_pattern = cfg.data.train_pattern
    cfg.train.eval_every = 2
    cfg.train.eval_max_batches = 1
    cfg.train.checkpoint_every = 2

    # monkey-install a guard that fires after 3 opt steps via the logger
    import mmoe_multimodal_rec_tpu.train.loop as loop_mod
    real_guard = PreemptionGuard()
    orig_enter = PreemptionGuard.__enter__
    fired = {"n": 0}

    class FiringGuard(PreemptionGuard):
        @property
        def requested(self):
            fired["n"] += 1
            # each opt step polls once; request on the 4th poll
            return fired["n"] > 3

    loop_mod_guard = loop_mod.PreemptionGuard
    loop_mod.PreemptionGuard = FiringGuard
    try:
        part1 = train_from_config(cfg)
    finally:
        loop_mod.PreemptionGuard = loop_mod_guard
    assert part1["preempted"] is True
    n1 = len(part1["history"]["loss"])
    assert 0 < n1 < 6

    part2 = train_from_config(cfg)       # resume with the normal guard
    assert part2["preempted"] is False
    resumed_losses = part1["history"]["loss"] + part2["history"]["loss"]
    np.testing.assert_allclose(resumed_losses, ref["history"]["loss"],
                               rtol=1e-6)
    # eval entries exist in the metric stream
    lines = [json.loads(l) for l in
             open(os.path.join(cfg.train.output_dir, "metrics.jsonl"))]
    assert any("eval_auc_good" in l for l in lines)


def test_preemption_at_already_saved_step(tmp_path):
    """SIGTERM right after a periodic save at the same host_step: the
    preemption path must not re-save (orbax StepAlreadyExistsError) — it
    exits cleanly on the existing checkpoint."""
    import signal
    from mmoe_multimodal_rec_tpu.train.preemption import PreemptionGuard
    from util import packed_batch

    cfg = tiny_config("baseline")
    cfg.train.output_dir = str(tmp_path / "out")
    cfg.train.checkpoint_every = 2    # save lands at opt steps 2, 4, ...
    accum = cfg.train.optim.grad_accum
    micros = [packed_batch(cfg, seed=i) for i in range(6 * accum)]

    class Fire3(PreemptionGuard):
        """requested flips true after 2 opt-step polls, i.e. exactly when
        the periodic save at host_step=2 already exists."""
        def __init__(self):
            super().__init__()
            self.polls = 0

        @property
        def requested(self):
            self.polls += 1
            return self.polls > 2

    t = Trainer(cfg)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    res = t.fit(iter(micros), epochs=1, steps_per_epoch=6 * accum,
                ckpt=ckpt, preempt=Fire3())
    assert res["preempted"] is True
    assert ckpt.latest_step() == t.host_step == 2   # reused, not re-saved
    ckpt.close()


def test_eval_every_empty_valid_pattern_fails_at_startup(tmp_path):
    from mmoe_multimodal_rec_tpu.train.loop import train_from_config
    from mmoe_multimodal_rec_tpu.data.synthetic import write_synthetic_shards

    cfg = tiny_config("baseline")
    write_synthetic_shards(str(tmp_path / "s"), n_samples=16,
                           samples_per_shard=16, seed=1)
    cfg.data.train_pattern = str(tmp_path / "s" / "*.tar.gz")
    cfg.data.valid_pattern = str(tmp_path / "nope" / "*.tar.gz")
    cfg.train.eval_every = 2
    cfg.train.output_dir = str(tmp_path / "out")
    cfg.train.checkpoint_dir = str(tmp_path / "ckpt")
    with pytest.raises(FileNotFoundError, match="valid_pattern"):
        train_from_config(cfg)


def test_streaming_predictions_empty_is_nan():
    from mmoe_multimodal_rec_tpu.eval.auc import StreamingPredictions
    p = StreamingPredictions()
    aucs = p.aucs()
    assert np.isnan(aucs["good"]) and np.isnan(aucs["best"])
    labels, probs = p.concatenated("good")
    assert labels.size == 0 and probs.size == 0


def test_frozen_fingerprint_guard(tmp_path):
    """Stale-base guard hardening (ADVICE r3): (a) EVERY frozen leaf is
    content-sampled, so two snapshots differing in any single leaf get
    different fingerprints (the old stride sampler read ~1/16 of leaves);
    (b) when a pre-upgrade run dir has frozen_once/ but no fingerprint
    file, the backfill verifies the CURRENT tree against the tensors ON
    DISK instead of blindly locking in the in-memory fingerprint."""
    from mmoe_multimodal_rec_tpu.train.checkpoint import frozen_fingerprint

    cfg = tiny_config("baseline")
    trainer = Trainer(cfg)
    frozen = {k: np.asarray(v) for k, v in trainer.state.frozen.items()}
    fp0 = frozen_fingerprint(frozen)
    keys = sorted(frozen)
    assert len(keys) > 17, "tiny frozen tree too small for the stride check"
    # perturb ONE leaf at an index the old i%stride==0 sampler skipped
    swapped = dict(frozen)
    arr = np.array(swapped[keys[1]], np.float32)
    arr.flat[0] += 1.0
    swapped[keys[1]] = arr
    assert frozen_fingerprint(swapped) != fp0

    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(1, trainer.state, wait=True)
    fp_path = tmp_path / "ckpt" / "frozen_once.fingerprint.json"
    assert fp_path.exists()

    # simulate a pre-upgrade dir: fingerprint file missing
    fp_path.unlink()
    bad_state = trainer.state.replace(frozen=swapped)
    with pytest.raises(ValueError, match="frozen"):
        mngr.save(2, bad_state, wait=True)
    assert not fp_path.exists()

    # a matching tree backfills the fingerprint from the on-disk tensors
    mngr.save(2, trainer.state, wait=True)
    assert fp_path.exists()
    # and the normal mismatch path still fires with the file present
    with pytest.raises(ValueError, match="frozen"):
        mngr.save(3, bad_state, wait=True)
    mngr.close()

"""Orbax checkpointing with true RESUME.

The reference can only *save* (torch.save per epoch, train.py:351-363); its
trainers have no restore path at all (SURVEY §5).  Here the full training
state — trainable + frozen params, BN stats, optimizer state, step counter —
round-trips through orbax, and the `extra` dict carries the exact resume
position {epoch, opt_step_in_epoch, host_step}.  The dropout RNG needs no
saved state: each step's key is fold_in(base_key, host_step) (train/loop.py),
and the loader position is reproduced by fast-forwarding the deterministic
sample stream host_step*accum batches (data/loader.make_train_loader
skip_batches) — so a preempted run's metric stream is bit-identical to an
unbroken one (tested in tests/test_train.py).
"""
from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

_SEP = "|"


def frozen_fingerprint(frozen: Dict[Tuple[str, ...], Any]) -> str:
    """Cheap content fingerprint of the frozen base weights: every leaf's
    (path, shape, dtype) plus a byte-hash of the first 64 elements of EVERY
    leaf.  Catches a swapped pretrained snapshot or changed config without
    fetching the full ~1.1 GB tree from device: the samples are sliced
    on-device and fetched in ONE batched device_get (a per-leaf fetch over
    a tunnel-attached chip costs ~1.5 ms each; the round-3 stride-sampled
    variant let snapshots differing only in unsampled leaves collide —
    ADVICE r3)."""
    h = hashlib.sha256()
    keys = sorted(frozen)

    def sample64(leaf):
        if isinstance(leaf, np.ndarray):
            return np.ravel(leaf)[:64]
        return jax.numpy.ravel(leaf)[:64]

    samples = jax.device_get([sample64(frozen[k]) for k in keys])
    for key, sample in zip(keys, samples):
        leaf = frozen[key]
        h.update(_SEP.join(key).encode())
        h.update(str(jax.numpy.shape(leaf)).encode())
        h.update(str(jax.numpy.result_type(leaf)).encode())
        h.update(np.asarray(sample).tobytes())
    return h.hexdigest()


def _stringify(flat: Dict[Tuple[str, ...], Any]) -> Dict[str, Any]:
    return {_SEP.join(k): v for k, v in flat.items()}


def _tuplify(d: Dict[str, Any]) -> Dict[Tuple[str, ...], Any]:
    return {tuple(k.split(_SEP)): v for k, v in d.items()}


def state_to_saveable(state, extra: Optional[Dict[str, Any]] = None) -> Dict:
    """The PERIODIC payload: everything that changes during training.

    The frozen base weights (~1.1 GB of the 1.5 GB state: BERT x2 + ViT)
    are deliberately NOT here — they never change, so CheckpointManager
    saves them exactly once per run directory and every periodic
    checkpoint carries only the ~300 MB that moves (trainable params,
    optimizer state, BN stats, counters).  Measured on the tunnel-attached
    chip, re-saving frozen weights made each mid-epoch checkpoint a
    95-188 s stall; this split makes checkpoint cost proportional to what
    actually trains.  (The reference re-torch.saves all 13 module
    state_dicts every epoch, train.py:351-363.)
    """
    out = {
        "step": state.step,
        "trainable": _stringify(state.trainable),
        "batch_stats": state.batch_stats or {},
        "opt_state": state.opt_state,
        "extra": extra or {},
    }
    return out


def saveable_to_state(saved: Dict, state_template, frozen=None):
    """Rebuild a TrainState from the saved tree, using the template for
    structure (opt_state pytree defs).  `frozen` comes from the once-only
    frozen checkpoint (or, for pre-split checkpoints, from the payload)."""
    if frozen is None:
        frozen = saved.get("frozen")
    return state_template.replace(
        step=jax.numpy.asarray(saved["step"]),
        trainable=_tuplify(saved["trainable"]),
        frozen=_tuplify(frozen) if frozen is not None
        else state_template.frozen,
        batch_stats=saved["batch_stats"] or {},
        opt_state=jax.tree.unflatten(
            jax.tree.structure(state_template.opt_state),
            jax.tree.leaves(saved["opt_state"])),
    ), saved.get("extra", {})


def _abstract(tree):
    to_sds = (ocp.utils.to_shape_dtype_struct
              if hasattr(ocp.utils, "to_shape_dtype_struct")
              else (lambda x: x))
    return jax.tree.map(to_sds, tree)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))
        self._frozen_dir = os.path.join(self.directory, "frozen_once")
        self._frozen_fp_path = os.path.join(self.directory,
                                            "frozen_once.fingerprint.json")
        self._frozen_ckptr = ocp.StandardCheckpointer()

    def _write_fingerprint(self, fp: str) -> None:
        with open(self._frozen_fp_path, "w") as f:
            json.dump({"sha256": fp}, f)

    def _check_frozen_fingerprint(self, frozen) -> None:
        """Guard against silently reusing a checkpoint_dir whose frozen_once
        weights came from a DIFFERENT base snapshot/config: the once-only
        save is keyed on directory existence, so a stale frozen tree would
        otherwise load into a same-shaped template with no error.

        Backfill (pre-upgrade run dirs where frozen_once/ exists but the
        fingerprint file does not): the fingerprint that gets locked in must
        describe the tensors ON DISK — fingerprinting the in-memory tree
        unchecked would let the exact stale-base mismatch this guard exists
        for pass undetected on first contact (ADVICE r3).  So the on-disk
        frozen_once tree is restored, fingerprinted, compared against the
        current run's, and only then written."""
        fp = frozen_fingerprint(frozen)
        if os.path.exists(self._frozen_fp_path):
            with open(self._frozen_fp_path) as f:
                saved = json.load(f)["sha256"]
            if saved != fp:
                raise ValueError(
                    f"frozen base weights do not match the frozen_once "
                    f"checkpoint already in {self.directory!r} "
                    f"(saved fingerprint {saved[:12]}..., current "
                    f"{fp[:12]}...): the base snapshot or config changed. "
                    f"Use a fresh checkpoint_dir.")
            return
        try:
            on_disk = self._frozen_ckptr.restore(
                self._frozen_dir, _abstract(_stringify(frozen)))
        except Exception as e:
            raise ValueError(
                f"frozen_once checkpoint in {self.directory!r} has no "
                f"fingerprint file and could not be restored against the "
                f"current frozen tree (structure/shape mismatch — a "
                f"different base snapshot or config?): {e}") from e
        fp_disk = frozen_fingerprint(_tuplify(on_disk))
        if fp_disk != fp:
            raise ValueError(
                f"frozen base weights do not match the frozen_once "
                f"checkpoint already in {self.directory!r} (on-disk "
                f"fingerprint {fp_disk[:12]}..., current {fp[:12]}...): "
                f"the base snapshot or config changed. Use a fresh "
                f"checkpoint_dir.")
        self._write_fingerprint(fp_disk)

    def save(self, step: int, state, extra: Optional[Dict] = None,
             wait: bool = False) -> None:
        if state.frozen:
            if not os.path.exists(self._frozen_dir):
                # once per run directory: the immutable base weights; the
                # fingerprint is written from the tree just saved (disk ==
                # memory here by construction)
                self._frozen_ckptr.save(self._frozen_dir,
                                        _stringify(state.frozen))
                self._frozen_ckptr.wait_until_finished()
                self._write_fingerprint(frozen_fingerprint(state.frozen))
            else:
                self._check_frozen_fingerprint(state.frozen)
        payload = state_to_saveable(state, extra)
        self._mngr.save(step, args=ocp.args.StandardSave(payload))
        if wait:
            self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def _restore_frozen(self, state_template):
        if not os.path.exists(self._frozen_dir):
            return None
        abstract = _abstract(_stringify(state_template.frozen))
        restored = self._frozen_ckptr.restore(self._frozen_dir, abstract)
        return {k: v for k, v in restored.items()}

    def restore(self, state_template, step: Optional[int] = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        template = state_to_saveable(state_template, extra={})
        # restore with abstract template so dtypes/shapes are validated
        abstract = _abstract(template)
        try:
            saved = self._mngr.restore(
                step, args=ocp.args.StandardRestore(abstract))
        except Exception:
            saved = self._mngr.restore(step)
        frozen = self._restore_frozen(state_template)
        state, extra = saveable_to_state(saved, state_template, frozen)
        return state, extra

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()

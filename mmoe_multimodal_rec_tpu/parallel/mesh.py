"""Device mesh + sharding rules (the NCCL-DDP replacement, SURVEY §2f/§5).

The reference scales with torch DDP over NCCL (train.py:79,133-139): replica
params, per-GPU shard-split data, allreduce grads.  Here parallelism is SPMD
over a `jax.sharding.Mesh` with two axes:

- `data`: pure data parallelism.  Batches shard on their leading batch axis;
  jit/XLA inserts the gradient psums over ICI.  The `lax.scan` grad
  accumulation in train/step.py presents XLA with ONE combined
  gradient-sized reduction per micro-batch (measured: ~1.0x trainable
  params per scan iteration, merged into a handful of tuple all-reduces —
  the functional analogue of DDP `no_sync`+bucketing, train.py:266-277; at
  this model scale the per-micro reduction is <1% of step time, and XLA's
  WhileLoopAllReduceCodeMotion pass may hoist the accumulation out of the
  loop on TPU pipelines.  docs/DESIGN.md "Gradient collectives under grad
  accumulation" has the full measured analysis).
- `model`: optional Megatron-style tensor parallelism for the encoder
  matmuls: attention q/k/v and MLP fc1 column-parallel, attention out and
  fc2 row-parallel; XLA inserts the matching all-reduces.  The 110M-param
  models don't *need* TP (SURVEY §2f) but the axis is first-class so the
  same step scales to bigger encoder swaps.

Multi-host: `data` maps across hosts over DCN, `model` stays within a slice
on ICI (mesh axis order puts `model` innermost = fastest ICI neighbors).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel or n // mp
    if dp * mp > n:
        raise ValueError(f"mesh {dp}x{mp} > {n} devices")
    arr = np.asarray(devices[:dp * mp]).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


# ---------------------------------------------------------------------------
# Param sharding rules
# ---------------------------------------------------------------------------

_COL_PARALLEL = ("query", "key", "value")   # out-dim sharded
_ROW_PARALLEL = ("out",)                    # in-dim sharded


def _param_spec(path: Tuple[str, ...], leaf, model_axis: str) -> P:
    """TP rules keyed on the param path inside the encoders."""
    parts = path
    name = parts[-1]
    parent = parts[-2] if len(parts) >= 2 else ""
    gparent = parts[-3] if len(parts) >= 3 else ""

    def col(kern):  # column-parallel Dense
        return P(None, model_axis) if kern == "kernel" else P(model_axis)

    def row(kern):  # row-parallel Dense (bias replicated; psum after matmul)
        return P(model_axis, None) if kern == "kernel" else P(None)

    def fit(spec: P) -> P:
        # Stacked layouts add LEADING axes that are never sharded: scan_layers
        # prepends [num_layers] ("layers" scope, models/bert.py) and the
        # shared-base dual text encoder prepends [2] sides to lora_a/lora_b
        # (models/layers.ProjParams lora_sides) — left-pad the TP spec with
        # None until it matches the leaf's rank, sharding only the canonical
        # trailing dims.
        nd = np.ndim(leaf)
        if len(spec) < nd:
            return P(*([None] * (nd - len(spec))), *spec)
        return spec

    if name in ("kernel", "bias"):
        if parent in _COL_PARALLEL or (parent == "base" and
                                       gparent in _COL_PARALLEL):
            return fit(col(name))
        if parent in _ROW_PARALLEL:
            return fit(row(name))
        if parent == "fc1" and gparent == "mlp":
            return fit(col(name))
        if parent == "fc2" and gparent == "mlp":
            return fit(row(name))
    if name == "lora_b" and parent in _COL_PARALLEL:
        return fit(P(None, model_axis))
    return P()  # replicated


def _normalize_spec(spec: P, mesh: Mesh) -> P:
    """Drop size-1 mesh axes and trailing Nones from a PartitionSpec.

    P(None, 'model') on a model=1 mesh places identically to P(), but the
    compiled step's outputs come back normalized — and pjit caches on the
    spec OBJECT, so un-normalized input specs made the second train-step
    call silently recompile the whole program (regression-tested in
    tests/test_train.py::test_no_recompile_on_second_step)."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    parts = [None if (p is not None and sizes.get(p, 0) == 1) else p
             for p in spec]
    while parts and parts[-1] is None:
        parts.pop()
    return P(*parts)


def param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Pytree of NamedShardings matching `params` (nested or tuple-key flat)."""
    model_axis = mesh.axis_names[-1]

    def build(tree, path=()):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                p = path + (k if isinstance(k, tuple) else (k,))
                out[k] = build(v, p)
            return out
        return NamedSharding(mesh, _normalize_spec(
            _param_spec(path, tree, model_axis), mesh))

    return build(params)


def batch_shardings(batch: Dict[str, Any], mesh: Mesh,
                    accum_dim: bool = False) -> Dict[str, Any]:
    """Shard every batch array on its batch axis over `data`.

    With grad accumulation the arrays are [accum, batch, ...]: the batch axis
    is axis 1.  Chunk-budget arrays (user_tokens [N, L]) shard the same way —
    N is a multiple of the per-sample chunk cap times the batch size.
    """
    data_axis = mesh.axis_names[0]
    lead = (None, data_axis) if accum_dim else (data_axis,)

    def spec(x):
        ndim = np.ndim(x)
        return NamedSharding(mesh, P(*lead, *([None] * (ndim - len(lead)))))

    return jax.tree.map(spec, batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

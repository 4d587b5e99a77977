"""Fold trained LoRA deltas into the base kernels for serving.

The reference serves with the peft adapters still attached (model.py:592-599
wraps the BGE encoder's query/value Linears), so every forward pays two extra
rank-r matmuls per wrapped projection.  At inference the adapter is a
constant, so ``W' = W + (alpha/r) A B`` is exact — the LoRA dropout is
identity when deterministic — and with the LoRA branch gone the text
attention layers take the packed-qkv flash-kernel path
(models/layers.Attention: ``use_packed`` requires ``lora_rank == 0``), the
fastest attention path in the repo.

``merge_lora`` rewrites the param tree, ``merged_model_config`` produces the
matching rank-0 model config; eval/predict.Predictor applies both by default.
Equality of the merged and adapter forwards is asserted in
tests/test_lora_merge.py.
"""
from __future__ import annotations

import copy
from typing import Any, Dict

import jax.numpy as jnp
from flax import traverse_util


def merge_lora(params: Dict[str, Any], alpha: float) -> Dict[str, Any]:
    """Return a new param tree with every LoRA-wrapped projection
    ``{base/{kernel,bias}, lora_a, lora_b}`` collapsed to a plain
    ``{kernel, bias}`` where ``kernel = base_kernel + (alpha/r) A B``.

    The merge runs in fp32 regardless of param dtype (the delta is a
    product of two low-rank factors; accumulating it in the kernel's own
    dtype would round twice) and casts back to the original param dtype.

    A shared-base tree (model.shared_text_base — ONE base kernel, side-
    stacked [2, ...] LoRA factors) is first expanded to the two-tower
    layout (utils/shared_base.shared_to_two_tower, exact): one kernel
    cannot hold two different merged deltas, and the expansion also puts
    the result in the layout ``merged_model_config`` expects.
    """
    from .shared_base import is_shared_layout, shared_to_two_tower
    if is_shared_layout(params):
        params = shared_to_two_tower(params)
    flat = traverse_util.flatten_dict(params)
    out: Dict[Any, Any] = {}
    n_merged = 0
    for k, v in flat.items():
        if k[-1] == "lora_a":
            parent = k[:-1]
            a = jnp.asarray(v, jnp.float32)
            b = jnp.asarray(flat[parent + ("lora_b",)], jnp.float32)
            kernel = flat[parent + ("base", "kernel")]
            rank = a.shape[-1]
            merged = jnp.asarray(kernel, jnp.float32) + (alpha / rank) * (a @ b)
            out[parent + ("kernel",)] = merged.astype(kernel.dtype)
            out[parent + ("bias",)] = flat[parent + ("base", "bias")]
            n_merged += 1
        elif k[-1] == "lora_b":
            continue
        elif len(k) >= 2 and k[-2] == "base" and \
                (k[:-2] + ("lora_a",)) in flat:
            continue  # folded above
        else:
            out[k] = v
    if n_merged == 0:
        raise ValueError("no LoRA factors found in the param tree "
                         "(already merged, or lora_rank == 0?)")
    return traverse_util.unflatten_dict(out)


def merged_model_config(model_cfg):
    """Copy of the model config whose param layout matches a merged tree
    (text lora_rank = 0, which also unlocks the packed-qkv kernel path)."""
    cfg = copy.deepcopy(model_cfg)
    cfg.text.lora_rank = 0
    cfg.shared_text_base = False  # merge expands shared trees to two-tower
    return cfg

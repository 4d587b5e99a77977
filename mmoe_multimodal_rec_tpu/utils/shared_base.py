"""Convert param trees between the two-tower text-expert layout and the
shared-base layout (model.shared_text_base, models/text_expert.DualTextExpert).

Two-tower (reference checkpoint layout, ref train.py:351-363):
  user_expert/encoder/** , item_expert/encoder/**   (two full BGE copies)
  user_expert/norm/**    , item_expert/norm/**      (baseline only)

Shared-base:
  text_experts/encoder/**            (ONE base; every lora_a/lora_b leaf
                                      gains a leading [2] side axis:
                                      0 = user, 1 = item)
  text_experts/norm_user|norm_item/** (baseline only)

`two_tower_to_shared` requires the two base trees to be EQUAL — the
invariant of the reference workflow (both towers load the same pretrained
BGE and the base is in no optimizer group, ref train.py:118-123, 151-186;
train/optimizer.label_param).  A checkpoint whose bases diverged (e.g. a
modified full-finetune run) raises rather than silently averaging.

Both directions are exact and mutually inverse
(tests/test_shared_base.py::test_converter_roundtrip); forward equality of
the two layouts is asserted in the same file.  Works for the unrolled and
the scan_layers ('encoder/layers/layer/**') param layouts alike — the walk
is path-generic.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from flax import traverse_util

USER, ITEM, SHARED = "user_expert", "item_expert", "text_experts"
_LORA = ("lora_a", "lora_b")


def is_shared_layout(params: Dict[str, Any]) -> bool:
    return SHARED in params


def two_tower_to_shared(params: Dict[str, Any], *,
                        atol: float = 0.0) -> Dict[str, Any]:
    """Merge user_expert/item_expert into text_experts.  `atol` bounds the
    allowed base-weight disagreement (0.0 = bitwise; converted reference
    checkpoints are bitwise-equal because both towers load the same file)."""
    flat = traverse_util.flatten_dict(params)
    out: Dict[Any, Any] = {}
    consumed = set()
    for k, v in flat.items():
        if k[0] == ITEM:
            continue  # handled from the user side
        if k[0] != USER:
            out[k] = v
            continue
        rest = k[1:]
        item_key = (ITEM,) + rest
        if rest[0] == "encoder":
            if item_key not in flat:
                raise ValueError(f"two-tower layout incomplete: missing "
                                 f"{'/'.join(item_key)}")
            consumed.add(item_key)
            iv = flat[item_key]
            if k[-1] in _LORA:
                out[(SHARED,) + rest] = jnp.stack(
                    [jnp.asarray(v), jnp.asarray(iv)], axis=0)
            else:
                uv, ivn = np.asarray(v), np.asarray(iv)
                if uv.shape != ivn.shape or not (
                        np.array_equal(uv, ivn) if atol == 0.0
                        else np.allclose(uv, ivn, atol=atol, rtol=0.0)):
                    raise ValueError(
                        f"base weights diverge at {'/'.join(k)} — the "
                        f"shared-base layout requires equal frozen bases "
                        f"(pass atol= to tolerate numeric noise)")
                out[(SHARED,) + rest] = v
        elif rest[0] == "norm":
            out[(SHARED, "norm_user") + rest[1:]] = v
            if item_key in flat:
                consumed.add(item_key)
                out[(SHARED, "norm_item") + rest[1:]] = flat[item_key]
        else:
            raise ValueError(f"unexpected two-tower subtree: {'/'.join(k)}")
    leftover = [k for k in flat if k[0] == ITEM and k not in consumed]
    if leftover:
        raise ValueError(f"item_expert leaves without user counterpart: "
                         f"{['/'.join(k) for k in leftover[:3]]}")
    return traverse_util.unflatten_dict(out)


def shared_to_two_tower(params: Dict[str, Any]) -> Dict[str, Any]:
    """Expand text_experts back into user_expert/item_expert (the base is
    duplicated; lora leaves split their leading side axis)."""
    flat = traverse_util.flatten_dict(params)
    out: Dict[Any, Any] = {}
    for k, v in flat.items():
        if k[0] != SHARED:
            out[k] = v
            continue
        rest = k[1:]
        if rest[0] == "encoder":
            if k[-1] in _LORA:
                out[(USER,) + rest] = v[0]
                out[(ITEM,) + rest] = v[1]
            else:
                out[(USER,) + rest] = v
                out[(ITEM,) + rest] = v
        elif rest[0] == "norm_user":
            out[(USER, "norm") + rest[1:]] = v
        elif rest[0] == "norm_item":
            out[(ITEM, "norm") + rest[1:]] = v
        else:
            raise ValueError(f"unexpected shared-base subtree: {'/'.join(k)}")
    return traverse_util.unflatten_dict(out)

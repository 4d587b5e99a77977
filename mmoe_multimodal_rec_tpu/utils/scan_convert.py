"""Translate encoder param trees between the unrolled layout
(`encoder/layer_{i}/...`, one subtree per layer — the reference checkpoint
shape) and the scan layout (`encoder/layers/layer/...` with a leading
[num_layers] axis — `model.text.scan_layers=True`, models/bert.py).

Both directions are exact re-arrangements; logit equality across layouts is
asserted in tests/test_scan_layers.py.  Only scopes named `encoder` (the
text encoders) are touched: the ViT (`backbone` scope) stays unrolled so its
last-2-layers finetune partition keeps layer granularity.
"""
from __future__ import annotations

import re
from typing import Any, Dict

import jax.numpy as jnp
from flax import traverse_util

_LAYER_RE = re.compile(r"^layer_(\d+)$")


def stack_layers(params: Dict[str, Any], scope: str = "encoder"
                 ) -> Dict[str, Any]:
    """unrolled -> scan: stack every `<...>/scope/layer_{i}/<rest>` group
    into `<...>/scope/layers/layer/<rest>` along a new leading axis."""
    flat = traverse_util.flatten_dict(params)
    groups: Dict[tuple, Dict[int, Any]] = {}
    out: Dict[tuple, Any] = {}
    for k, v in flat.items():
        hit = None
        for i, part in enumerate(k):
            m = _LAYER_RE.match(part)
            if m and i > 0 and k[i - 1] == scope:
                hit = (i, int(m.group(1)))
                break
        if hit is None:
            out[k] = v
            continue
        i, idx = hit
        new_key = k[:i] + ("layers", "layer") + k[i + 1:]
        groups.setdefault(new_key, {})[idx] = v
    for new_key, by_idx in groups.items():
        n = len(by_idx)
        assert sorted(by_idx) == list(range(n)), \
            f"non-contiguous layer indices for {new_key}: {sorted(by_idx)}"
        out[new_key] = jnp.stack([by_idx[i] for i in range(n)], axis=0)
    return traverse_util.unflatten_dict(out)


def unstack_layers(params: Dict[str, Any], scope: str = "encoder"
                   ) -> Dict[str, Any]:
    """scan -> unrolled: split `<...>/scope/layers/layer/<rest>` along the
    leading axis back into `<...>/scope/layer_{i}/<rest>`."""
    flat = traverse_util.flatten_dict(params)
    out: Dict[tuple, Any] = {}
    for k, v in flat.items():
        hit = None
        for i in range(1, len(k) - 1):
            if k[i] == "layers" and k[i - 1] == scope and k[i + 1] == "layer":
                hit = i
                break
        if hit is None:
            out[k] = v
            continue
        for idx in range(v.shape[0]):
            out[k[:hit] + (f"layer_{idx}",) + k[hit + 2:]] = v[idx]
    return traverse_util.unflatten_dict(out)

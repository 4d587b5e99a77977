"""Full-scale converter proof (VERDICT r3 next#3, slow).

tests/test_parity_full_model.py proves conversion CORRECTNESS at tiny dims
by executing the reference's own classes; this proves the converter at the
PUBLISHED-CHECKPOINT scale: a random-init torch checkpoint in the exact
reference layout (BGE-base 12L/d768/30522+1-vocab LoRA text experts x2,
ViT-base, cross/fuse/head — ref train.py:351-363 / train_HoME.py:432-449)
runs through utils/hf_convert against the full-size model's init tree with
ZERO missing and ZERO unexpected keys, for both variants.  With this, the
published-HF-checkpoint recipe has no untested step left but the download
itself (network-blocked here).

Wall/memory at this scale are recorded by tools/convert_fullsize_check.py
(same code path) and quoted in BENCHMARKS.md.
"""
from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from convert_fullsize_check import build_fullsize_ckpt, check_conversion


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["baseline", "home"])
def test_fullsize_reference_ckpt_converts_cleanly(variant):
    ckpt = build_fullsize_ckpt(variant)
    # the reference layout contains exactly these top-level keys
    expect = {"epoch", "optimizer", "scheduler", "user", "item", "img",
              "cross_ui", "concat_ui", "concat_ti", "head"}
    if variant == "home":
        expect |= {"u_doc_wrapper", "i_doc_wrapper", "img_vec_wrapper",
                   "ui_vec_wrapper", "xui_wrapper", "xti_wrapper"}
    assert set(ckpt) == expect
    # full-size text expert: 30523-row embedding (30522 + <SENT>)
    emb = ckpt["user"][[k for k in ckpt["user"]
                        if k.endswith("word_embeddings.weight")][0]]
    assert tuple(emb.shape) == (30523, 768)

    report = check_conversion(variant, ckpt)
    assert not report["missing"], report["missing"][:20]
    assert not report["unexpected"], report["unexpected"][:20]
    assert report["n_params"] > 350_000_000  # genuinely full-size

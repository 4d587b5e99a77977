"""Offline pipeline tests: ingest transforms, causal features + negative
sampling, time split, text rendering, patchify, and the full
meta+reviews -> features -> text/patch merge -> tar shards -> loader chain."""
import base64
import datetime
import json
import os

import numpy as np
import pytest

from mmoe_multimodal_rec_tpu.data.features import (Welford,
                                                   causal_pos_neg_for_user,
                                                   downsample_by_star, enrich,
                                                   run_feature_pipeline,
                                                   split_by_date)
from mmoe_multimodal_rec_tpu.data.ingest import (transform_meta,
                                                 transform_review)
from mmoe_multimodal_rec_tpu.data.patches import decode_and_patch
from mmoe_multimodal_rec_tpu.data.textbuild import (build_item_text,
                                                    build_user_text,
                                                    merge_rows_with_patch,
                                                    normalize_text,
                                                    record_to_wds_sample,
                                                    smart_join, write_dataset)


# ---------------------------------------------------------------------------
# ingest transforms
# ---------------------------------------------------------------------------

def test_transform_meta_normalizes_schema():
    old = {"parent_asin": "A", "price": "12.5", "details": '{"a": 1}',
           "images": {"variant": ["MAIN"], "hi_res": ["h"],
                      "large": ["l"], "thumb": ["t"]}}
    out = transform_meta(old)
    assert out["price"] == 12.5
    assert out["details"] == {"a": 1}
    assert out["images"] == [{"variant": "MAIN", "hi_res": "h",
                              "large": "l", "thumb": "t"}]
    new = {"asin": "B", "price": "None",
           "images": [{"variant": "M", "hi_res": None, "large": "L",
                       "thumb": "T"}], "details": {}}
    out = transform_meta(new)
    assert out["price"] is None
    assert out["images"][0]["large"] == "L"


def test_transform_review_fields():
    out = transform_review({"user_id": "u", "asin": "a", "rating": 5,
                            "timestamp": 1688000000000, "helpful_vote": 3})
    assert out["parent_asin"] == "a"
    assert out["sort_timestamp"] == 1688000000000
    assert out["helpful_votes"] == 3


# ---------------------------------------------------------------------------
# features
# ---------------------------------------------------------------------------

def test_welford_matches_numpy():
    rng = np.random.default_rng(0)
    xs = rng.normal(size=57) * 7 + 3
    w = Welford()
    for x in xs:
        w.update(float(x))
    np.testing.assert_allclose(w.mean, xs.mean(), rtol=1e-9)
    np.testing.assert_allclose(w.std, xs.std(ddof=1), rtol=1e-9)


def test_downsample_keeps_non_five_star():
    import random
    rows = [{"rating": r} for r in (1, 2, 3, 4, 5) * 100]
    kept = list(downsample_by_star(rows, 0.2, random.Random(0)))
    non5 = [r for r in kept if r["rating"] != 5]
    five = [r for r in kept if r["rating"] == 5]
    assert len(non5) == 400
    assert 5 <= len(five) <= 50   # ~20 of 100


def _ts(day):
    return int(datetime.datetime(2023, 1, day).timestamp() * 1000)


def test_causal_features_only_past():
    rows = [
        {"user_id": "u", "parent_asin": f"p{i}", "main_category": "Sports",
         "price": 10.0 * (i + 1), "review_title": f"t{i}",
         "review_text": f"body{i}", "sort_timestamp": _ts(i + 1),
         "event_date": f"2023-01-{i+1:02d}", "rating": 4,
         "label_good": 1, "label_best": 0, "_is_neg": 0}
        for i in range(4)
    ]
    out = list(causal_pos_neg_for_user("u", rows, ["n1", "n2", "n3"],
                                       neg_k=2))
    pos = [r for r in out if not r["_is_neg"]]
    neg = [r for r in out if r["_is_neg"]]
    assert len(pos) == 4
    assert len(neg) == 8          # 2 per positive
    # first positive: empty history
    assert pos[0]["user_feat"]["review_cnt"] == 0
    assert pos[0]["user_feat"]["history"] == []
    # third positive: sees exactly the first two
    uf = pos[2]["user_feat"]
    assert uf["review_cnt"] == 2
    assert [h["title"] for h in uf["history"]] == ["t0", "t1"]
    np.testing.assert_allclose(uf["price_mean"], 15.0)
    # history deque caps at 3
    assert len(pos[3]["user_feat"]["history"]) == 3
    # negatives reuse the aligned user_feat + timestamps and avoid seen pids
    assert neg[0]["user_feat"] == pos[0]["user_feat"]
    assert neg[0]["sort_timestamp"] == pos[0]["sort_timestamp"]
    assert all(n["parent_asin"].startswith("n") for n in neg)
    assert all(n["label_good"] == 0 and n["label_best"] == 0 for n in neg)


def test_split_by_date():
    r = {"event_date": "2023-06-30"}
    assert split_by_date(r, "2023-06-30", "2023-09-30") == "train"
    assert split_by_date({"event_date": "2023-07-01"},
                         "2023-06-30", "2023-09-30") == "valid"
    assert split_by_date({"event_date": "2023-10-01"},
                         "2023-06-30", "2023-09-30") == "test"
    assert split_by_date({}, "2023-06-30", "2023-09-30") == "test"


# ---------------------------------------------------------------------------
# text rendering
# ---------------------------------------------------------------------------

def test_normalize_text():
    assert normalize_text("a  b\tc\r\n") == "a b c"
    assert normalize_text("“quoted” – dash…") == '"quoted" - dash...'
    assert normalize_text(["x&amp;y", "z"]) == ["x&y", "z"]


def test_smart_join_terminal_punct():
    assert smart_join(["has period.", "no period"]) == \
        "has period. no period;"


def test_build_user_text_templates():
    assert build_user_text({"user_feat": {}}) == (
        "Category history: No browsing history. Total reviews: No reviews. "
        "Avg price: N/A. Price std: No price variation. "
        "Review history: No review history.")
    rec = {"user_feat": {"cat_hist": {"Sports": 0.75, "Tools": 0.25},
                         "review_cnt": 4, "price_mean": 19.99,
                         "price_std": 2.5,
                         "history": [{"title": "", "text": "Loved it"}]}}
    txt = build_user_text(rec)
    assert "Category history: Sports: 75%; Tools: 25%." in txt
    assert "Total reviews: 4." in txt
    assert "Avg price: 19.99. Price std: 2.50." in txt
    assert "Review history: Review1: Loved it;" in txt  # ";" is terminal (data4model.py:127)


def test_build_item_text_templates():
    txt = build_item_text({"main_category": "Sports", "title": "Bike",
                           "price": 12.0, "features": ["Light", "Fast."],
                           "description": "Great bike"})
    assert txt.startswith("Item category: Sports. Item title: Bike. "
                          "Item price: 12.00. ")
    assert "Item features: Light; Fast." in txt
    # reference quirk: a single-element description goes through
    # normalize_text -> bare str -> smart_join char-iteration
    # (data4model.py:92, 40-48)
    assert "Item description: G; r; e; a; t; ; b; i; k; e;" in txt
    empty = build_item_text({})
    assert "Unknown category" in empty and "No title" in empty
    assert "No features." in empty and "No description." in empty
    # reference quirk: product_title is never read (data4model.py:142)
    assert "No title" in build_item_text({"product_title": "Bike"})


TEXTBUILD_GOLDEN_RECORDS = [
    {"main_category": "Sports", "title": "Bike", "price": 12.0,
     "features": ["Light", "Fast."], "description": "Great bike"},
    {"main_category": "S", "product_title": "Bike",
     "features": ["only one"], "description": ["a", "b"]},
    {"features": ["", "x"], "description": []},
    {"title": "T&amp;T — “quoted”…", "price": 0.5,
     "features": ["ends with period.", "no period", ""],
     "description": ["multi\nline\ttext", "second."]},
    {"main_category": "", "title": None, "features": [],
     "description": ["lone description element"]},
]

TEXTBUILD_GOLDEN_USERS = [
    {"user_feat": {}},
    {"user_feat": {"cat_hist": {"Sports": 0.75, "Tools": 0.25, "Zero": 0},
                   "review_cnt": 4, "price_mean": 19.99, "price_std": 2.5,
                   "history": [{"title": "", "text": "Loved it"},
                               {"title": "Great!", "text": ""}]}},
    {"user_feat": {"cat_hist": {}, "review_cnt": 0, "price_mean": None,
                   "price_std": 0.0,
                   "history": [{"text": "ends already."}]}},
]


def test_textbuild_matches_reference():
    """Golden parity: execute the reference's own normalize_text/smart_join/
    build_*_text (data4model.py) and assert byte equality on a battery of
    records covering every known quirk."""
    from util import load_reference_module
    ref = load_reference_module("data4model.py")
    for rec in TEXTBUILD_GOLDEN_RECORDS:
        assert build_item_text(rec) == ref.build_item_text(rec), rec
    for rec in TEXTBUILD_GOLDEN_USERS:
        assert build_user_text(rec) == ref.build_user_text(rec), rec
    for val in ["a  b\tc", ["x&amp;y", "z"], ["single"], [],
                "“q” – d…", ["", "y."]]:
        assert normalize_text(val) == ref.normalize_text(val), val
    for pieces in [["has period.", "no period"], ["", ";"], "chars"]:
        assert smart_join(pieces) == ref.smart_join(pieces), pieces


# ---------------------------------------------------------------------------
# patchify
# ---------------------------------------------------------------------------

def test_decode_and_patch_roundtrip():
    from PIL import Image
    import io
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 256, (300, 400, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    rec = decode_and_patch(buf.getvalue())
    assert rec is not None
    assert rec["shape"] == [196, 3, 16, 16]
    rows = np.frombuffer(base64.b64decode(rec["patch_b64"]), np.uint8)
    assert rows.size == 196 * 768


def test_decode_and_patch_rejects_garbage():
    assert decode_and_patch(b"not an image") is None


# ---------------------------------------------------------------------------
# end-to-end: meta+reviews -> features -> shards -> loader
# ---------------------------------------------------------------------------

def test_full_offline_pipeline(tmp_path):
    rng = np.random.default_rng(0)
    metas = [{"parent_asin": f"p{i}", "main_category": "Sports",
              "title": f"Product {i}", "price": float(i + 1),
              "features": ["Solid build quality."],
              "description": ["A very nice thing to own."],
              "images": [{"hi_res": f"http://x/{i}.jpg"}]}
             for i in range(10)]
    reviews = []
    for u in range(5):
        for j in range(4):
            day = u * 4 + j + 1
            reviews.append({
                "user_id": f"u{u}", "parent_asin": f"p{(u + j) % 10}",
                "rating": int(rng.integers(1, 6)),
                "title": "Nice", "text": "Works great. Would buy again.",
                "sort_timestamp": _ts(day) if day <= 28 else _ts(28),
            })
    # enrich needs event_date -> add via enrich itself
    split_rows, image_urls = run_feature_pipeline(
        metas, reviews, train_end="2023-01-15", valid_end="2023-01-22",
        neg_k=2, rate_5=1.0)
    assert len(image_urls) == 10
    all_rows = [r for rows in split_rows.values() for r in rows]
    assert all("user_feat" in r for r in all_rows)
    n_pos = sum(1 for r in all_rows if r["rating"])
    n_neg = sum(1 for r in all_rows if not r["rating"])
    assert n_neg == 2 * n_pos

    # merge with (synthetic) patches for half the items, write shards
    rows_by_asin = {}
    for r in all_rows:
        rows_by_asin.setdefault(r["parent_asin"], []).append(r)
    patch_rows = {f"p{i}": {
        "patch_b64": base64.b64encode(
            rng.integers(0, 256, 196 * 768, dtype=np.uint8).tobytes()
        ).decode(), "shape": [196, 3, 16, 16]} for i in range(0, 10, 2)}
    paths = write_dataset(rows_by_asin, patch_rows, str(tmp_path / "wds"),
                          samples_per_shard=32)
    assert paths

    # loader consumes the shards
    from mmoe_multimodal_rec_tpu.data import iter_decoded
    samples = list(iter_decoded(paths))
    assert len(samples) == len(all_rows)
    assert any(s["has_image"] for s in samples)
    assert any(not s["has_image"] for s in samples)
    s0 = samples[0]
    assert s0["user_text"].startswith("Category history:")
    assert s0["item_text"].startswith("Item category:")


# ---------------------------------------------------------------------------
# streaming pipeline (bounded memory) + scheme-aware IO
# ---------------------------------------------------------------------------

def _pipeline_fixture():
    rng = np.random.default_rng(1)
    metas = [{"parent_asin": f"p{i}", "main_category": "Sports",
              "title": f"Product {i}", "price": float(i + 1),
              "features": ["Solid."], "description": ["Nice."],
              "images": [{"hi_res": f"http://x/{i}.jpg"}]}
             for i in range(20)]
    reviews = []
    for u in range(8):
        for j in range(5):
            day = (u * 5 + j) % 27 + 1
            reviews.append({
                "user_id": f"u{u}", "parent_asin": f"p{(u * 3 + j) % 20}",
                "rating": int(rng.integers(1, 6)),
                "title": "Nice", "text": "Works great.",
                "sort_timestamp": _ts(day),
            })
    return metas, reviews


def _rows_key(r):
    return json.dumps(r, sort_keys=True)


def test_streaming_pipeline_matches_in_memory(tmp_path):
    """run_feature_pipeline_streaming must emit row-for-row what the
    in-memory DAG emits (VERDICT #6: same semantics, bounded RSS)."""
    from mmoe_multimodal_rec_tpu.data.features import (
        run_feature_pipeline_streaming)
    metas, reviews = _pipeline_fixture()
    kw = dict(train_end="2023-01-15", valid_end="2023-01-22",
              neg_k=2, rate_5=1.0, seed=7)
    split_rows, urls_mem = run_feature_pipeline(metas, reviews, **kw)

    out = tmp_path / "stream_out"
    paths, urls_stream = run_feature_pipeline_streaming(
        metas, reviews, output_dir=str(out), num_partitions=5, **kw)
    assert urls_stream == urls_mem

    got = {}
    for p in paths:
        split = p.split("/")[-2]
        cat = p.split("/")[-1][:-len(".jsonl")]
        with open(p) as f:
            got[(cat, split)] = sorted(_rows_key(json.loads(l))
                                       for l in f if l.strip())
    want = {(cat, split): sorted(_rows_key({k: v for k, v in r.items()
                                            if k != "_is_neg"})
                                 for r in rows)
            for (cat, split), rows in split_rows.items()}
    assert got == want


def test_fs_open_and_glob_remote_scheme(tmp_path):
    """gs://-style paths route through fsspec; memory:// exercises the same
    code path without network (ref reads/writes gs:// everywhere,
    meta2gcs.py:73-103, data4model.py:272-284)."""
    pytest.importorskip("fsspec")
    from mmoe_multimodal_rec_tpu.data.io import fs_glob, fs_open
    base = "memory://fstest"
    for i in range(3):
        with fs_open(f"{base}/f{i}.txt", "wb") as f:
            f.write(f"hello{i}".encode())
    paths = fs_glob(f"{base}/*.txt")
    assert len(paths) == 3 and all(p.startswith("memory://") for p in paths)
    with fs_open(paths[1], "rb") as f:
        assert f.read() == b"hello1"


def test_tar_shards_roundtrip_remote_scheme():
    """Shard writer + reader over an fsspec URL (webdataset-on-GCS parity)."""
    pytest.importorskip("fsspec")
    from mmoe_multimodal_rec_tpu.data.tar_io import iter_shard, write_shard
    path = "memory://fstest-tars/data-000000.tar.gz"
    samples = [{"__key__": f"k{i}", "user.json": b"{}",
                "item.json": json.dumps({"i": i}).encode()} for i in range(4)]
    assert write_shard(path, samples) == 4
    back = list(iter_shard(path))
    assert [s["__key__"] for s in back] == [f"k{i}" for i in range(4)]
    assert json.loads(back[2]["item.json"]) == {"i": 2}


def test_beam_adapter_is_import_gated():
    """Run in a CLEAN subprocess: the in-process version was order-dependent
    (it self-skipped whenever an earlier test leaked the tests/util.py beam
    stub into sys.modules) and so validated nothing in a full-suite run."""
    import subprocess
    import sys
    code = (
        "import pytest, sys\n"
        "from mmoe_multimodal_rec_tpu.data import beam_pipeline\n"
        "try:\n"
        "    import apache_beam\n"
        "    sys.exit(77)  # real beam installed: gating unobservable\n"
        "except ImportError:\n"
        "    pass\n"
        "try:\n"
        "    beam_pipeline.make_dofns()\n"
        "except ImportError as e:\n"
        "    assert 'apache_beam' in str(e)\n"
        "    sys.exit(0)\n"
        "sys.exit(1)\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    if r.returncode == 77:
        pytest.skip("real apache_beam installed; gating not exercised")
    assert r.returncode == 0, r.stderr


@pytest.mark.slow
def test_normalize_and_join_fuzz_vs_reference():
    """Property-based parity for the model-input text normalizers: random
    unicode (quotes, dashes, HTML entities, control chars, whitespace
    runs, mixed scripts) through our normalize_text/smart_join must equal
    the reference's EXECUTED functions byte-for-byte."""
    from hypothesis import given, settings, strategies as st
    from util import load_reference_module
    ref = load_reference_module("data4model.py")

    atom = st.one_of(
        st.text(max_size=20),
        st.sampled_from(["“q”", "‘x’", "–", "—", "…", "&amp;", "&lt;",
                         "​", "\x07", "  tabs\t\t", "\r\n", "naïve",
                         "１２３", "line.\nnext", "no end", "..", "a.b.c."]))
    blob = st.lists(atom, min_size=0, max_size=6).map(" ".join)

    @settings(max_examples=60, deadline=None)
    @given(val=st.one_of(blob, st.lists(blob, min_size=0, max_size=4)))
    def check(val):
        assert normalize_text(val) == ref.normalize_text(val), val
        if isinstance(val, list):
            ours = smart_join([normalize_text(p) for p in val])
            want = ref.smart_join([ref.normalize_text(p) for p in val])
            assert ours == want, val

    check()

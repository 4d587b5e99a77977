"""Data substrate tests: tar IO roundtrip, decode guards, tokenizer parity
with HF BertTokenizer, packer semantics (incl. reference quirks), loader."""
import json

import numpy as np
import pytest

from mmoe_multimodal_rec_tpu.config import PackerConfig
from mmoe_multimodal_rec_tpu.data import (BatchLoader, HashTokenizer,
                                          TextPacker, WordPieceTokenizer,
                                          assemble_batch, decode_sample,
                                          image_to_patch_rows, iter_decoded,
                                          iter_shard, make_eval_loader,
                                          patch_rows_to_image, split_sentences,
                                          split_shards, write_shard)
from mmoe_multimodal_rec_tpu.data.synthetic import (make_sample,
                                                    synthetic_raw_batch,
                                                    write_synthetic_shards)


# ---------------------------------------------------------------------------
# tar IO
# ---------------------------------------------------------------------------

def test_tar_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    samples = [make_sample(rng, i) for i in range(7)]
    path = str(tmp_path / "shard.tar.gz")
    assert write_shard(path, samples) == 7
    back = list(iter_shard(path))
    assert len(back) == 7
    assert back[0]["__key__"] == samples[0]["__key__"]
    assert back[3]["user.json"] == samples[3]["user.json"]
    assert back[3]["patch.bin"] == samples[3]["patch.bin"]


def test_shard_writer_splits(tmp_path):
    paths = write_synthetic_shards(str(tmp_path), n_samples=10,
                                   samples_per_shard=4)
    assert len(paths) == 3  # 4 + 4 + 2
    counts = [len(list(iter_shard(p))) for p in paths]
    assert counts == [4, 4, 2]


def test_signal_corpus_plants_learnable_cue():
    """`synth --signal`: the sentiment cue sentence must agree with
    label_good ~85% of the time (the e2e convergence run trains on this)."""
    import json
    from mmoe_multimodal_rec_tpu.data.synthetic import _POS_CUE
    rng = np.random.default_rng(0)
    agree = labels = 0
    n = 400
    for i in range(n):
        s = make_sample(rng, i, signal=True)
        lab = json.loads(s["label.json"])["label_good"]
        labels += lab
        agree += int((_POS_CUE.encode() in s["user.json"]) == bool(lab))
    assert 0.4 < labels / n < 0.6          # marginal stays ~0.5
    assert 0.8 < agree / n < 0.9           # cue is informative, not perfect
    # default corpus stays cue-free
    s = make_sample(np.random.default_rng(1), 0)
    assert _POS_CUE.encode() not in s["user.json"]


# ---------------------------------------------------------------------------
# decode_sample guards (ref model.py:127-189)
# ---------------------------------------------------------------------------

def _valid_raw(rng):
    return make_sample(rng, 0, p_image=1.0)


def test_decode_valid_sample():
    s = decode_sample(_valid_raw(np.random.default_rng(0)))
    assert s is not None
    assert s["patch"].shape == (196, 768) and s["patch"].dtype == np.uint8
    assert s["has_image"] == 1
    assert s["label_good"] in (0.0, 1.0)


def test_decode_missing_fields():
    raw = _valid_raw(np.random.default_rng(0))
    for field in ("user.json", "item.json", "label.json"):
        broken = dict(raw)
        del broken[field]
        assert decode_sample(broken) is None


def test_decode_bad_labels():
    raw = _valid_raw(np.random.default_rng(0))
    raw = dict(raw)
    raw["label.json"] = json.dumps({"label_good": 3, "label_best": 0}).encode()
    assert decode_sample(raw) is None
    raw["label.json"] = json.dumps({"label_good": float("nan"),
                                    "label_best": 0}).encode()
    # NaN -> safe_float default 0.0 -> valid (reference behavior)
    assert decode_sample(raw) is not None


def test_decode_zero_filler_never_read():
    """has_image=0 with the 2x-size zero filler decodes to a zero patch."""
    raw = _valid_raw(np.random.default_rng(0))
    raw = dict(raw)
    raw["patch.bin"] = b"\x00" * (196 * 768 * 2)
    raw["misc.json"] = json.dumps({"has_image": 0,
                                   "shape": [196, 3, 16, 16]}).encode()
    s = decode_sample(raw)
    assert s["has_image"] == 0
    assert not s["patch"].any()


def test_decode_corrupt_patch_falls_back():
    raw = _valid_raw(np.random.default_rng(0))
    raw = dict(raw)
    raw["patch.bin"] = b"\x01\x02\x03"  # wrong size, has_image=1
    s = decode_sample(raw)
    assert s is not None and s["has_image"] == 0 and not s["patch"].any()


def test_patch_row_image_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (3, 224, 224)).astype(np.uint8)
    rows = image_to_patch_rows(img)
    assert rows.shape == (196, 768)
    np.testing.assert_array_equal(patch_rows_to_image(rows), img)


# ---------------------------------------------------------------------------
# sentence splitter
# ---------------------------------------------------------------------------

def test_sentence_splitter_basics():
    assert split_sentences("") == []
    assert split_sentences("One sentence") == ["One sentence"]
    got = split_sentences("First one. Second here! Third? Yes.")
    assert got == ["First one.", "Second here!", "Third?", "Yes."]


def test_sentence_splitter_abbreviations():
    got = split_sentences("I met Dr. Smith today. He was kind.")
    assert got == ["I met Dr. Smith today.", "He was kind."]
    got = split_sentences("Price was 3.99 dollars. Cheap.")
    assert got == ["Price was 3.99 dollars.", "Cheap."]


# ---------------------------------------------------------------------------
# WordPiece parity vs HF BertTokenizer (custom offline vocab)
# ---------------------------------------------------------------------------

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "bike", "helmet", "was", "great", "##s", "##ed", "##ing",
         "fit", "strap", "broke", "a", "good", "bad", "un", "##break",
         "##able", ",", ".", "!", "?", "'", "19", "##99", "price", "do",
         "##n", "not", "buy"]


def _vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


def test_wordpiece_matches_hf_bert_tokenizer(tmp_path):
    from transformers import BertTokenizer
    path = _vocab_file(tmp_path)
    hf = BertTokenizer(path, do_lower_case=True)
    ours = WordPieceTokenizer.from_vocab_file(path)
    texts = [
        "The bike helmet was great.",
        "Unbreakable straps, fits!  Broken?",
        "Don't buy. Price was 1999...",
        "THE BIKES were GREAT!!!",
        "weird unicode éè café — dash",
        "",
    ]
    for t in texts:
        want = hf.encode(t, add_special_tokens=False)
        got = ours.encode(t)
        assert got == want, (t, got, want)


def test_wordpiece_truncation_matches_hf(tmp_path):
    from transformers import BertTokenizer
    path = _vocab_file(tmp_path)
    hf = BertTokenizer(path, do_lower_case=True)
    ours = WordPieceTokenizer.from_vocab_file(path)
    t = "the bike helmet was great " * 50
    want = hf.encode(t, add_special_tokens=False, max_length=17,
                     truncation=True)
    assert ours.encode(t, max_length=17) == want


# ---------------------------------------------------------------------------
# packer semantics (ref model.py:29-117 quirks)
# ---------------------------------------------------------------------------

class TinyTok:
    """Deterministic word->id tokenizer: each word encodes to one id."""
    pad_id, unk_id, cls_id, sep_id = 0, 1, 2, 3
    vocab_size = 50

    def __init__(self):
        self.sent_id = self.vocab_size  # added token beyond base vocab

    def encode(self, text, max_length=None):
        ids = [4 + (hash(w) % 40) for w in text.split()]
        return ids[:max_length] if max_length is not None else ids


def _mk_packer(max_tok=12, max_chunks=2, sents=8):
    cfg = PackerConfig(max_tok=max_tok, max_chunks_per_sample=max_chunks,
                       fixed_sent_count=sents)
    return TextPacker(TinyTok(), cfg, splitter=split_sentences)


def test_packer_shapes_and_padding():
    p = _mk_packer()
    out = p.pack(["One two three. Four five.", ""])
    assert out.tokens.shape == (4, 12)        # B * max_chunks rows
    assert out.sent_chunk.shape == (2, 8)
    # sample 1 is empty: no sentences, no chunks
    assert (out.sent_chunk[1] == -1).all()
    # sample 0: both sentences fit chunk 0 (3+1 + 2+1 = 7 <= pad_limit 10)
    assert out.n_chunks == 1
    assert list(out.sent_chunk[0][:2]) == [0, 0]
    # positions: CLS at 0; <SENT> at 1 and 5 (+1 shift applied)
    assert list(out.sent_tok[0][:2]) == [1, 5]


def test_packer_sent_marker_clamped_to_pad():
    """The <SENT> id (>= vocab_size) must be clamped to PAD in the token rows
    (ref model.py:101-109) while sent_tok still points at those slots."""
    p = _mk_packer()
    out = p.pack(["One two three. Four five."])
    row = out.tokens[0]
    assert row[0] == TinyTok.cls_id
    assert row[1] == TinyTok.pad_id          # clamped <SENT>
    assert row[5] == TinyTok.pad_id          # clamped <SENT>
    assert row[4] != TinyTok.pad_id          # real word ids survive
    assert row[8] == TinyTok.sep_id


def test_packer_overflow_flush_and_drop():
    """pad_limit=10: sentences of 6 ids (5 words + marker) overflow after one
    per chunk; with max_chunks=2 the third sentence triggers a flush to
    chunk 2 == max and is silently dropped (ref model.py:57-94)."""
    p = _mk_packer(max_tok=12, max_chunks=2)
    text = "aa bb cc dd ee. ff gg hh ii jj. kk ll mm nn oo."
    out = p.pack([text])
    assert out.n_chunks == 2
    # 2 sentences recorded (one per chunk), third dropped
    assert (out.sent_chunk[0][:2] >= 0).all()
    assert (out.sent_chunk[0][2:] == -1).all()
    assert list(out.sent_tok[0][:2]) == [1, 1]


def test_packer_truncates_to_fixed_sent_count():
    p = _mk_packer(max_tok=64, max_chunks=4, sents=3)
    text = " ".join(f"word{i} thing." for i in range(10))  # 10 sentences
    out = p.pack([text])
    assert (out.sent_chunk[0] >= 0).all()     # capped at 3
    assert out.sent_chunk.shape == (1, 3)


def test_packer_long_sentence_truncated():
    """A sentence longer than pad_limit-1 ids truncates, not crashes
    (ref model.py:60-65)."""
    p = _mk_packer(max_tok=12, max_chunks=2)
    out = p.pack(["aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp qq rr ss tt."])
    assert out.n_chunks == 1
    row = out.tokens[0]
    assert row[0] == TinyTok.cls_id
    assert (row != TinyTok.pad_id).sum() == 11  # CLS + 9 words + SEP (marker clamped)


# ---------------------------------------------------------------------------
# loaders
# ---------------------------------------------------------------------------

def test_split_shards_round_robin():
    paths = [f"s{i}" for i in range(7)]
    a = split_shards(paths, 0, 2)
    b = split_shards(paths, 1, 2)
    assert sorted(a + b) == sorted(paths)
    assert not set(a) & set(b)


def test_iter_decoded_and_eval_loader(tmp_path):
    paths = write_synthetic_shards(str(tmp_path), n_samples=20,
                                   samples_per_shard=8, seed=3)
    samples = list(iter_decoded(paths))
    assert len(samples) == 20
    packer = _mk_packer(max_tok=32, max_chunks=2)
    loader = make_eval_loader(paths, batch_size=8, packer=packer)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["user_tokens"].shape == (16, 32)
    assert batches[0]["patches"].shape == (8, 196, 768)
    assert batches[0]["valid"].all()
    # final partial batch: 4 valid, padded to 8
    assert batches[2]["valid"].sum() == 4
    assert batches[2]["label_good"].shape == (8,)


def test_train_batches_are_full_and_shuffled(tmp_path):
    paths = write_synthetic_shards(str(tmp_path), n_samples=30,
                                   samples_per_shard=10, seed=4)
    packer = _mk_packer(max_tok=32, max_chunks=2)
    it = iter_decoded(paths, shuffle=True, shuffle_buffer=16, repeat=True,
                      seed=1)
    loader = BatchLoader(it, 8, packer, num_prefetch=2)
    got = []
    for i, b in enumerate(loader):
        got.append(b)
        if i == 5:  # > one epoch worth (30 samples) proves repeat works
            break
    loader.close()
    assert all(b["valid"].all() for b in got)
    assert got[0]["user_tokens"].shape == (16, 32)


def test_hash_tokenizer_ids_in_vocab_range():
    """Regression: small-vocab HashTokenizer must emit ids < vocab_size,
    or the packer's OOV clamp silently maps every word to PAD."""
    for vs in (200, 500, 30522):
        tok = HashTokenizer(vocab_size=vs)
        ids = tok.encode("the great bike broke badly yesterday")
        assert ids, "no ids"
        assert all(0 < i < vs for i in ids), (vs, ids)


def test_explain_sample_and_validate_cli(tmp_path):
    """explain_sample mirrors decode_sample's verdicts and names the drop/
    degradation reasons; the validate CLI aggregates them."""
    import json
    from mmoe_multimodal_rec_tpu.cli import main as cli_main
    from mmoe_multimodal_rec_tpu.data.decode import (decode_sample,
                                                     explain_sample)
    from mmoe_multimodal_rec_tpu.data.synthetic import write_synthetic_shards
    from mmoe_multimodal_rec_tpu.data.tar_io import iter_shard, write_shard

    paths = write_synthetic_shards(str(tmp_path / "s"), n_samples=16,
                                   samples_per_shard=16, seed=11)
    samples = list(iter_shard(paths[0]))
    # corrupt a copy in distinct ways
    bad = [dict(s) for s in samples[:5]]
    del bad[0]["label.json"]                               # missing member
    bad[1]["user.json"] = b"   "                           # empty text
    bad[2]["label.json"] = b'{"label_good": 7, "label_best": 0}'  # range
    bad[3]["label.json"] = b"{not json"                    # bad json
    if bad[4].get("misc.json") and b'"has_image": 1' in bad[4]["misc.json"]:
        bad[4]["patch.bin"] = b"\x00" * 13                 # degraded patch
    else:
        bad[4]["misc.json"] = b'{"has_image": 1, "shape": [196, 3, 16, 16]}'
        bad[4]["patch.bin"] = b"\x00" * 13
    corrupt = str(tmp_path / "c")
    import os
    os.makedirs(corrupt)
    write_shard(os.path.join(corrupt, "shard-000000.tar.gz"),
                bad + samples[5:])

    # explain == decode verdict on every sample
    for s in bad + samples[5:]:
        rep = explain_sample(s)
        assert (rep["status"] == "ok") == (decode_sample(s) is not None), rep

    rc = None
    import io
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["validate", "--input",
                       os.path.join(corrupt, "*.tar.gz")])
    out = json.loads(buf.getvalue())
    assert rc == 3                       # drops present
    assert out["samples"] == 16 and out["dropped"] == 4
    assert out["drop_reasons"]["missing_member:label.json"] == 1
    assert out["drop_reasons"]["empty_text"] == 1
    assert out["drop_reasons"]["label_out_of_range"] == 1
    assert out["drop_reasons"]["bad_json"] == 1
    assert out["degraded"].get("bad_patch_zero_filled", 0) == 1
    assert 0.0 <= out["label_good_pos_rate"] <= 1.0

    # clean shards exit 0 with zero drops
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main(["validate", "--input",
                       str(tmp_path / "s" / "*.tar.gz")])
    out = json.loads(buf.getvalue())
    assert rc == 0 and out["dropped"] == 0


def test_corrupt_shard_skipped_in_training_strict_in_eval(tmp_path):
    """A truncated shard mid-list: the train loader logs + skips it and
    keeps streaming (one bad file must not kill a multi-epoch run); the
    strict default raises."""
    import pytest
    from mmoe_multimodal_rec_tpu.data.loader import iter_decoded
    from mmoe_multimodal_rec_tpu.data.synthetic import write_synthetic_shards

    paths = write_synthetic_shards(str(tmp_path), n_samples=48,
                                   samples_per_shard=16, seed=13)
    # truncate the middle shard (valid gzip header, torn stream)
    import os
    data = open(paths[1], "rb").read()
    with open(paths[1], "wb") as f:
        f.write(data[:len(data) // 3])

    got = list(iter_decoded(paths, shuffle=False, repeat=False,
                            on_shard_error="skip"))
    # both intact shards fully present; possibly a prefix of the torn one
    assert 32 <= len(got) < 48

    with pytest.raises(Exception):
        list(iter_decoded(paths, shuffle=False, repeat=False))


@pytest.mark.slow
def test_wordpiece_fuzz_vs_hf(tmp_path):
    """Property-based parity: random unicode-ish text through our
    WordPiece (Python AND C++ when buildable) must match HF BertTokenizer
    id-for-id — covers compositions the curated cases miss (mixed scripts,
    stray controls, punctuation runs, long words)."""
    from hypothesis import given, settings, strategies as st
    from transformers import BertTokenizer

    path = _vocab_file(tmp_path)
    hf = BertTokenizer(path, do_lower_case=True)
    ours = WordPieceTokenizer.from_vocab_file(path)
    try:
        from mmoe_multimodal_rec_tpu.data.native_tokenizer import \
            NativeWordPieceTokenizer
        native = NativeWordPieceTokenizer(path)
    except Exception:
        native = None

    word = st.one_of(
        st.sampled_from(["the", "bike", "helmet", "unbreakable", "1999",
                         "DON'T", "café", "naïve", "bikes", "prices"]),
        st.text(alphabet="abcdefghijklmnopqrstuvwxyzé0123456789'",
                min_size=1, max_size=14))
    chunk = st.one_of(word, st.sampled_from([".", ",", "!!", "?", "—",
                                             "...", "\t", "\n", "  "]))
    doc = st.lists(chunk, min_size=0, max_size=20).map(" ".join)

    @settings(max_examples=40, deadline=None)
    @given(t=doc)
    def check(t):
        want = hf.encode(t, add_special_tokens=False)
        assert ours.encode(t) == want, t
        if native is not None:
            assert native.encode(t) == want, t

    check()


@pytest.mark.slow
def test_decode_never_raises_fuzz(tmp_path):
    """decode_sample is the crash barrier for the training stream: under
    arbitrary member mutations (truncation, byte flips, dropped/renamed
    keys, junk members) it must return a dict or None — never raise — and
    explain_sample's verdict must agree with it."""
    from hypothesis import given, settings, strategies as st
    from mmoe_multimodal_rec_tpu.data.decode import (decode_sample,
                                                     explain_sample)
    from mmoe_multimodal_rec_tpu.data.synthetic import write_synthetic_shards
    from mmoe_multimodal_rec_tpu.data.tar_io import iter_shard

    paths = write_synthetic_shards(str(tmp_path), n_samples=8,
                                   samples_per_shard=8, seed=21)
    base = list(iter_shard(paths[0]))
    keys = ["user.json", "item.json", "label.json", "misc.json",
            "patch.bin", "utok.bin", "itok.bin"]

    mutation = st.sampled_from(["drop", "truncate", "flip", "junk", "empty"])

    @settings(max_examples=60, deadline=None)
    @given(idx=st.integers(0, 7), key=st.sampled_from(keys), mut=mutation,
           pos=st.integers(0, 10_000), data=st.binary(min_size=0,
                                                      max_size=64))
    def check(idx, key, mut, pos, data):
        s = dict(base[idx])
        if mut == "drop":
            s.pop(key, None)
        elif mut == "empty":
            s[key] = b""
        elif mut == "junk":
            s[key] = data
        elif key in s:
            raw = bytearray(s[key])
            if raw:
                p = pos % len(raw)
                if mut == "truncate":
                    raw = raw[:p]
                else:
                    raw[p] ^= 0xFF
            s[key] = bytes(raw)
        dec = decode_sample(s)          # must not raise
        rep = explain_sample(s)         # must not raise
        assert (dec is not None) == (rep["status"] == "ok")
        if dec is not None:
            assert dec["patch"].shape == (196, 768)
            assert 0 <= dec["label_good"] <= 1

    check()


@pytest.mark.slow
def test_sentence_splitter_fuzz_properties(tmp_path):
    """split_sentences invariants under arbitrary text: never raises,
    yields non-empty sentences, and loses no non-whitespace content
    (sentences concatenate back to the input modulo whitespace)."""
    from hypothesis import given, settings, strategies as st
    from mmoe_multimodal_rec_tpu.data.sentence import split_sentences

    @settings(max_examples=80, deadline=None)
    @given(t=st.text(max_size=300))
    def check(t):
        sents = split_sentences(t)
        assert all(isinstance(s, str) and s.strip() for s in sents)
        squash = lambda x: "".join(x.split())
        assert squash("".join(sents)) == squash(t)

    check()


def test_packer_from_config_vocab_guard(tmp_path):
    """A production config with no vocab_path must FAIL LOUDLY instead of
    silently tokenizing real text with the hash stand-in (VERDICT r3 weak#3;
    the reference always loads a real vocab, ref train.py:102-103).  The
    explicit opt-in (synthetic corpora) and the real-vocab path still work."""
    from mmoe_multimodal_rec_tpu.config import Config
    from mmoe_multimodal_rec_tpu.data.packer import packer_from_config

    cfg = Config()
    assert cfg.data.vocab_path is None
    with pytest.raises(ValueError, match="vocab_path"):
        packer_from_config(cfg)

    cfg.data.allow_hash_tokenizer = True
    packer = packer_from_config(cfg)
    assert packer.pack(["Synthetic only."]).n_chunks >= 1

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "synthetic", "only", "."]))
    cfg2 = Config()
    cfg2.data.vocab_path = str(vocab)
    cfg2.model.text.vocab_size = 8  # 7 vocab rows + <SENT>
    packer2 = packer_from_config(cfg2)
    assert packer2.pack(["synthetic only."]).n_chunks >= 1


def test_remote_shard_transient_error_retries_once(monkeypatch):
    """gs:// shards retry ONCE before skip: a truncated network read
    surfaces as EOFError/zlib.error (same types as real corruption), so the
    guard re-opens the shard, fast-forwards past what it already yielded,
    and only a REPRODUCING error counts as corruption (ADVICE r3).  Local
    paths never retry (their decode errors are deterministic)."""
    from mmoe_multimodal_rec_tpu.data import loader as loader_mod

    calls = {"n": 0}

    def flaky_iter_shard(path):
        calls["n"] += 1
        first = calls["n"] == 1
        for i in range(5):
            if first and i == 3:
                raise EOFError("truncated network read")
            yield {"__key__": f"s{i}"}

    monkeypatch.setattr(loader_mod, "iter_shard", flaky_iter_shard)

    # remote: transient error -> retry succeeds -> full, duplicate-free stream
    got = list(loader_mod._iter_shard_guarded("gs://b/shard-0.tar.gz", "skip"))
    assert [s["__key__"] for s in got] == [f"s{i}" for i in range(5)]
    assert calls["n"] == 2

    # remote, error reproduces on the retry -> skip the rest (no third try)
    calls["n"] = 0

    def corrupt_iter_shard(path):
        calls["n"] += 1
        for i in range(5):
            if i == 3:
                raise EOFError("really corrupt")
            yield {"__key__": f"s{i}"}

    monkeypatch.setattr(loader_mod, "iter_shard", corrupt_iter_shard)
    got = list(loader_mod._iter_shard_guarded("gs://b/shard-0.tar.gz", "skip"))
    assert [s["__key__"] for s in got] == ["s0", "s1", "s2"]
    assert calls["n"] == 2

    # local path: no retry at all
    calls["n"] = 0
    got = list(loader_mod._iter_shard_guarded("/tmp/shard-0.tar.gz", "skip"))
    assert len(got) == 3 and calls["n"] == 1

    # on_error="raise" propagates immediately, remote or not
    calls["n"] = 0
    with pytest.raises(EOFError):
        list(loader_mod._iter_shard_guarded("gs://b/shard-0.tar.gz", "raise"))

"""Offline pre-tokenization (data/pretokenize.py — the reference's stated
future work, README.md:670): sidecar roundtrip, pack_encoded vs pack
bit-equality, re-truncation semantics, and end-to-end loader equality on
pretokenized shards."""
import numpy as np
import pytest

from mmoe_multimodal_rec_tpu.data.decode import decode_sample
from mmoe_multimodal_rec_tpu.data.loader import make_train_loader
from mmoe_multimodal_rec_tpu.data.packer import TextPacker
from mmoe_multimodal_rec_tpu.data.pretokenize import (decode_sent_tokens,
                                                      encode_sent_tokens,
                                                      pretokenize_shards,
                                                      tokenize_text)
from mmoe_multimodal_rec_tpu.data.synthetic import write_synthetic_shards
from mmoe_multimodal_rec_tpu.data.tar_io import iter_shard
from util import tiny_config, tiny_tokenizer

TEXTS = [
    "This tent is great. I used it for two weeks in the rain and it held "
    "up. Would buy again. The poles are sturdy aluminium and the zippers "
    "never snagged once during the whole trip.",
    "Terrible quality. Broke on day one.",
    "",
    "One very long run-on review sentence that keeps going and going with "
    "many words so that it exercises the per-sentence truncation limit of "
    "the packer configuration under test here today and even more filler "
    "words to be safe.",
    "Short. " * 40,   # many tiny sentences -> chunk flushes + sentence cap
]


def _assert_packed_equal(a, b):
    np.testing.assert_array_equal(a.tokens, b.tokens)
    np.testing.assert_array_equal(a.sent_chunk, b.sent_chunk)
    np.testing.assert_array_equal(a.sent_tok, b.sent_tok)
    assert a.n_chunks == b.n_chunks


def test_sidecar_roundtrip():
    sents = [[1, 2, 3], [7], [], [5, 6]]
    raw = encode_sent_tokens(sents, 21, 30522)
    mx, vocab, out = decode_sent_tokens(raw)
    assert mx == 21 and vocab == 30522
    assert [list(s) for s in out] == sents
    # empty sentence list is valid
    mx, vocab, out = decode_sent_tokens(encode_sent_tokens([], 9, 201))
    assert mx == 9 and vocab == 201 and out == []


def test_sidecar_malformed():
    with pytest.raises(ValueError):
        decode_sent_tokens(b"\x00" * 8)          # wrong version/short
    raw = encode_sent_tokens([[1, 2], [3]], 5, 201)
    with pytest.raises(ValueError):
        decode_sent_tokens(raw[:-4])             # truncated payload
    with pytest.raises(ValueError):
        decode_sent_tokens(raw + b"\x01\x00\x00\x00")  # trailing junk


def test_pack_encoded_matches_pack():
    cfg = tiny_config()
    packer = TextPacker(tiny_tokenizer(cfg), cfg.model.packer)
    want = packer.pack(TEXTS)
    enc = [tokenize_text(t, packer) for t in TEXTS]
    got = packer.pack_encoded(enc)
    _assert_packed_equal(want, got)


def test_pack_encoded_retruncates_longer_stored():
    """Sidecars encoded at a LARGER max_tok re-truncate exactly (WordPiece
    truncation is prefix-take), so one pretokenized dataset serves any
    smaller training max_tok."""
    cfg = tiny_config()
    packer = TextPacker(tiny_tokenizer(cfg), cfg.model.packer)
    want = packer.pack(TEXTS)
    long_limit = cfg.model.packer.max_tok - 3 + 10
    enc = [[packer.tok.encode(s, max_length=long_limit)
            for s in packer.split(t)] for t in TEXTS]
    got = packer.pack_encoded(enc)
    _assert_packed_equal(want, got)


def test_pretokenized_shards_loader_bit_identical(tmp_path):
    """Full path: synth shards -> pretokenize CLI-equivalent -> train
    loader; the batch stream equals the raw-text loader's exactly."""
    cfg = tiny_config()
    packer = TextPacker(tiny_tokenizer(cfg), cfg.model.packer)
    orig = write_synthetic_shards(str(tmp_path / "orig"), n_samples=48,
                                  samples_per_shard=16, seed=3)
    pre = pretokenize_shards(str(tmp_path / "orig" / "*.tar.gz"),
                             str(tmp_path / "pre"), packer)
    assert len(pre) == len(orig) == 3

    # decode attaches the sidecar sentences
    sample = next(iter_shard(pre[0]))
    dec = decode_sample(sample)
    assert "user_sents" in dec and dec["sents_max_len"] == \
        cfg.model.packer.max_tok - 3

    la = make_train_loader(orig, 4, packer, seed=1, shuffle_buffer=8,
                           num_threads=2)
    lb = make_train_loader(pre, 4, packer, seed=1, shuffle_buffer=8,
                           num_threads=2)
    ita, itb = iter(la), iter(lb)
    for _ in range(6):
        a, b = next(ita), next(itb)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    la.close()
    lb.close()


def test_vocab_mismatch_falls_back_to_text(tmp_path):
    """Sidecars from a DIFFERENT tokenizer vocabulary are ignored — token
    ids are meaningless across vocabs and the packer's OOV clamp would
    otherwise hide the corruption silently (observed: AUC shifted with no
    error when pretokenize and eval configs disagreed on vocab_size)."""
    cfg = tiny_config()
    other = tiny_config()
    other.model.text.vocab_size = 2201        # different hash range
    other_packer = TextPacker(tiny_tokenizer(other), other.model.packer)
    packer = TextPacker(tiny_tokenizer(cfg), cfg.model.packer)

    orig = write_synthetic_shards(str(tmp_path / "orig"), n_samples=16,
                                  samples_per_shard=16, seed=9)
    pre = pretokenize_shards(str(tmp_path / "orig" / "*.tar.gz"),
                             str(tmp_path / "pre"), other_packer)
    la = make_train_loader(orig, 4, packer, seed=2, shuffle_buffer=4,
                           num_threads=1)
    lb = make_train_loader(pre, 4, packer, seed=2, shuffle_buffer=4,
                           num_threads=1)
    a, b = next(iter(la)), next(iter(lb))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    la.close()
    lb.close()


def test_incompatible_truncation_falls_back_to_text(tmp_path):
    """Shards pretokenized at a SMALLER max_tok cannot serve a larger one;
    the loader silently uses the raw text path (texts are always kept)."""
    cfg = tiny_config()
    small = tiny_config()
    small.model.packer.max_tok = cfg.model.packer.max_tok - 8
    small_packer = TextPacker(tiny_tokenizer(small), small.model.packer)
    packer = TextPacker(tiny_tokenizer(cfg), cfg.model.packer)

    orig = write_synthetic_shards(str(tmp_path / "orig"), n_samples=16,
                                  samples_per_shard=16, seed=5)
    pre = pretokenize_shards(str(tmp_path / "orig" / "*.tar.gz"),
                             str(tmp_path / "pre"), small_packer)
    la = make_train_loader(orig, 4, packer, seed=2, shuffle_buffer=4,
                          num_threads=1)
    lb = make_train_loader(pre, 4, packer, seed=2, shuffle_buffer=4,
                          num_threads=1)
    a, b = next(iter(la)), next(iter(lb))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    la.close()
    lb.close()

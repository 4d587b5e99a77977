"""Native C++ WordPiece: build, parity vs the Python reference (which is
itself HF-parity-tested), and a host-throughput sanity check."""
import time

import numpy as np
import pytest

from mmoe_multimodal_rec_tpu.data.wordpiece import WordPieceTokenizer
from mmoe_multimodal_rec_tpu.native import build_native


def _write_vocab(tmp_path):
    # realistic mini-vocab with wordpieces, punctuation, numerals
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] +
             list("abcdefghijklmnopqrstuvwxyz") +
             [f"##{c}" for c in "abcdefghijklmnopqrstuvwxyz"] +
             ["the", "bike", "helmet", "was", "great", "light", "##s",
              "##ed", "##ing", "##er", "fit", "strap", "broke", "good",
              "un", "##break", "##able", "works", "perfect", "##ly",
              "cafe", "19", "##99", "price", ",", ".", "!", "?", "'",
              "-", ";", ":", '"'])
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def so_path():
    path = build_native()
    if path is None:
        pytest.skip("g++ build failed")
    return path


def test_native_matches_python(tmp_path, so_path):
    from mmoe_multimodal_rec_tpu.data.native_tokenizer import \
        NativeWordPieceTokenizer
    vocab = _write_vocab(tmp_path)
    py = WordPieceTokenizer.from_vocab_file(vocab)
    nat = NativeWordPieceTokenizer(vocab)
    assert nat.vocab_size == py.vocab_size
    assert (nat.pad_id, nat.cls_id, nat.sep_id, nat.sent_id) == \
        (py.pad_id, py.cls_id, py.sep_id, py.sent_id)
    texts = [
        "The bike helmet was great.",
        "UNBREAKABLE straps; fits perfectly!",
        "Broke after 1999 uses... price was 19.99, meh",
        "works   with\ttabs\nand newlines",
        "accents: café CAFÉ naïve über señor",
        "quotes “fancy” and 'plain' - dashes –",
        "",
        "a" * 150,  # > max_chars_per_word -> [UNK]
    ]
    for t in texts:
        assert nat.encode(t) == py.encode(t), t
        assert nat.encode(t, max_length=7) == py.encode(t, max_length=7), t


def test_native_batch_matches_single(tmp_path, so_path):
    from mmoe_multimodal_rec_tpu.data.native_tokenizer import \
        NativeWordPieceTokenizer
    nat = NativeWordPieceTokenizer(_write_vocab(tmp_path))
    texts = ["the bike was great!", "helmet fits.", ""]
    batch = nat.encode_batch(texts, max_length=16)
    assert batch == [nat.encode(t, max_length=16) for t in texts]


def test_native_is_faster_than_python(tmp_path, so_path):
    from mmoe_multimodal_rec_tpu.data.native_tokenizer import \
        NativeWordPieceTokenizer
    from mmoe_multimodal_rec_tpu.data.synthetic import random_text
    vocab = _write_vocab(tmp_path)
    py = WordPieceTokenizer.from_vocab_file(vocab)
    nat = NativeWordPieceTokenizer(vocab)
    rng = np.random.default_rng(0)
    texts = [random_text(rng, 4, 10) for _ in range(200)]

    t0 = time.perf_counter()
    for t in texts:
        py.encode(t)
    t_py = time.perf_counter() - t0

    t0 = time.perf_counter()
    nat.encode_batch(texts)
    t_nat = time.perf_counter() - t0
    # comfortably faster; assert a conservative 3x to stay robust in CI
    assert t_nat * 3 < t_py, (t_nat, t_py)

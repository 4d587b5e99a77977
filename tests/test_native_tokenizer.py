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


def test_native_pack_batch_matches_python_packer(tmp_path):
    """The C++ wp_pack_batch must reproduce the Python TextPacker's outputs
    bit-for-bit, including the quirks: flush-drop at the chunk cap, OOV/
    <SENT> clamp, +1 position shift, global budget exhaustion.  The Python
    packer is itself golden-tested against the reference's EXECUTED
    preprocess_batch in tests/test_packer_golden.py, so this bit-equality
    transitively pins the C++ path to the reference too."""
    from mmoe_multimodal_rec_tpu.native import build_native
    if build_native() is None:
        pytest.skip("no g++")
    import numpy as np
    from mmoe_multimodal_rec_tpu.config import PackerConfig
    from mmoe_multimodal_rec_tpu.data.native_tokenizer import \
        NativeWordPieceTokenizer
    from mmoe_multimodal_rec_tpu.data.packer import TextPacker
    from mmoe_multimodal_rec_tpu.data.sentence import split_sentences
    from mmoe_multimodal_rec_tpu.data.synthetic import random_text
    from mmoe_multimodal_rec_tpu.data.wordpiece import WordPieceTokenizer

    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] +
             list("abcdefghijklmnopqrstuvwxyz") +
             [f"##{c}" for c in "abcdefghijklmnopqrstuvwxyz"] +
             [w for w in ("great quality bike helmet tent sleeping bag "
                          "running shoes light compact durable waterproof "
                          "##s ##ed ##ing . , ! ?").split()])
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab) + "\n")
    native = NativeWordPieceTokenizer(str(vp))
    pyref = WordPieceTokenizer.from_vocab_file(str(vp))

    # tight caps so every quirk path triggers: tiny chunks force flushes and
    # drops; tiny budget exercises global exhaustion; tiny S truncates routing
    for cfg in (PackerConfig(),
                PackerConfig(max_tok=16, max_chunks_per_sample=2,
                             fixed_sent_count=4)):
        rng = np.random.default_rng(42)
        texts = [random_text(rng, 1, 12) for _ in range(24)] + ["", "a."]
        for budget in (None, 8):
            fast = TextPacker(native, cfg, splitter=split_sentences)
            slow = TextPacker(pyref, cfg, splitter=split_sentences)
            a = fast.pack(texts, budget)
            b = slow.pack(texts, budget)
            assert a.n_chunks == b.n_chunks
            np.testing.assert_array_equal(a.tokens, b.tokens)
            np.testing.assert_array_equal(a.sent_chunk, b.sent_chunk)
            np.testing.assert_array_equal(a.sent_tok, b.sent_tok)


def test_native_pack_encoded_batch_matches_python(tmp_path):
    """wp_pack_encoded_batch (the offline-pretokenization pack path) must
    be bit-identical to the Python pack_encoded loop — including
    re-truncation of sentences stored at a larger max_tok, chunk-cap
    drops, sentence-cap routing truncation, and budget exhaustion."""
    from mmoe_multimodal_rec_tpu.native import build_native
    if build_native() is None:
        pytest.skip("no g++")
    from mmoe_multimodal_rec_tpu.config import PackerConfig
    from mmoe_multimodal_rec_tpu.data.native_tokenizer import \
        NativeWordPieceTokenizer
    from mmoe_multimodal_rec_tpu.data.packer import TextPacker
    from mmoe_multimodal_rec_tpu.data.sentence import split_sentences
    from mmoe_multimodal_rec_tpu.data.synthetic import random_text
    from mmoe_multimodal_rec_tpu.data.wordpiece import WordPieceTokenizer

    vocab_path = _write_vocab(tmp_path)
    native = NativeWordPieceTokenizer(vocab_path)
    pyref = WordPieceTokenizer.from_vocab_file(vocab_path)

    for cfg in (PackerConfig(),
                PackerConfig(max_tok=16, max_chunks_per_sample=2,
                             fixed_sent_count=4)):
        rng = np.random.default_rng(7)
        texts = [random_text(rng, 1, 12) for _ in range(24)] + ["", "a."]
        # pre-encode at a LARGER truncation than the packer needs
        # (sidecars from a bigger max_tok config must re-truncate exactly)
        enc = [[pyref.encode(s, max_length=cfg.max_tok + 5)
                for s in split_sentences(t)] for t in texts]
        for budget in (None, 8):
            fast = TextPacker(native, cfg, splitter=split_sentences)
            slow = TextPacker(pyref, cfg, splitter=split_sentences)
            a = fast.pack_encoded(enc, budget)
            b = slow.pack_encoded(enc, budget)
            assert a.n_chunks == b.n_chunks
            np.testing.assert_array_equal(a.tokens, b.tokens)
            np.testing.assert_array_equal(a.sent_chunk, b.sent_chunk)
            np.testing.assert_array_equal(a.sent_tok, b.sent_tok)
            # ... and both equal the text path (same sentences, native
            # encode == python encode is asserted above)
            c = slow.pack(texts, budget)
            np.testing.assert_array_equal(b.tokens, c.tokens)

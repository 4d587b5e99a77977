"""Golden test: TextPacker vs the reference's EXECUTED `preprocess_batch`.

This closes the one uncross-validated hop in the text path (VERDICT r2 #2):
until now the packing semantics (greedy flush, drop-at-cap, OOV clamp, +1
position shift) were tested against our *reading* of model.py:29-117; here the
real reference function runs (loaded via tests/util.load_reference_module with
our sentence splitter injected as `nltk_sentence_split` and a vocab-file
tokenizer behind an HF-shaped shim) and the packer must reproduce its
tokens / chunk2sample / sent_pos exactly after static<->dynamic conversion.
"""
import numpy as np
import pytest

from mmoe_multimodal_rec_tpu.config import PackerConfig
from mmoe_multimodal_rec_tpu.data.packer import TextPacker
from mmoe_multimodal_rec_tpu.data.sentence import split_sentences
from mmoe_multimodal_rec_tpu.data.wordpiece import WordPieceTokenizer

from util import HFTokenizerShim as _HFShim, load_reference_module


def _vocab_file(tmp_path):
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] +
             list("abcdefghijklmnopqrstuvwxyz") +
             [f"##{c}" for c in "abcdefghijklmnopqrstuvwxyz"] +
             "the bike helmet was great tent light fits strap broke good "
             "works perfect price quality durable waterproof compact "
             "##s ##ed ##ing ##ly . , ! ?".split())
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n")
    return str(p)


def _ref_to_static(ref_out, budget, max_tok, n_samples, S, pad_id):
    """Reference dynamic output -> our static layout.

    Mechanical re-layout only: pad [N_chunks, max_chunk_len] rows into
    [budget, max_tok] (both pad with pad_id), and flatten the per-chunk
    sent_pos rows (already +1-shifted, -1-padded, model.py:73-75,111) into
    per-SAMPLE (chunk_row, position) routing pairs in chunk order — the same
    order TextExpert.forward consumes them (model.py:302-327), whose
    truncation to the fixed sentence budget is what our cap-at-S replicates.
    Chunks beyond `budget` are dropped, mirroring the packer's documented
    budget-exhaustion behavior (the reference has no budget concept)."""
    final_input_ids, chunk2sample, sent_pos, _ = ref_out
    tokens = np.full((budget, max_tok), pad_id, np.int32)
    sent_chunk = np.full((n_samples, S), -1, np.int32)
    sent_tok = np.full((n_samples, S), -1, np.int32)
    n_sents = [0] * n_samples
    for ci, row in enumerate(final_input_ids):
        if ci >= budget:
            continue
        assert len(row) <= max_tok
        tokens[ci, :len(row)] = row
        si = chunk2sample[ci]
        for p in sent_pos[ci]:
            if p == -1 or n_sents[si] >= S:
                break
            sent_chunk[si, n_sents[si]] = ci
            sent_tok[si, n_sents[si]] = p
            n_sents[si] += 1
    return tokens, sent_chunk, sent_tok, min(len(final_input_ids), budget)


# Reviews engineered to hit every quirk path at max_tok=16 (pad_limit=14):
# multi-sentence packing, a chunk flush mid-document, flush-drop at the
# 4-chunk cap (doc 2 has far more sentences than fit), [UNK] pieces,
# empty docs, and single-word sentences.
_TEXTS = [
    "The bike helmet was great. Fits perfectly! The strap broke. Bad.",
    "Great tent. " * 24,            # >4 chunks of material -> flush-drop
    "",                             # empty doc -> zero chunks
    "Works. Good price, durable and waterproof quality helmet it fits "
    "the bike perfectly and the strap works great.",  # long single sentence
    "zzzzqqq xyzzy!",               # [UNK]-heavy
    "Light. Compact. Good. Great. Works. Fits. Broke. Was. The. Bike.",
]


@pytest.mark.parametrize("max_tok,max_chunks", [(16, 4), (16, 2), (32, 4)])
def test_packer_matches_executed_reference(tmp_path, monkeypatch,
                                           max_tok, max_chunks):
    ref = load_reference_module("model.py")
    monkeypatch.setattr(ref, "nltk_sentence_split", split_sentences)
    tok = WordPieceTokenizer.from_vocab_file(_vocab_file(tmp_path))
    S = 64
    budget = len(_TEXTS) * max_chunks
    ref_out = ref.preprocess_batch(_TEXTS, _HFShim(tok), max_tok,
                                   max_chunks_per_sample=max_chunks,
                                   fixed_sent_count=S)
    want = _ref_to_static(ref_out, budget, max_tok, len(_TEXTS), S,
                          tok.pad_id)

    cfg = PackerConfig(max_tok=max_tok, max_chunks_per_sample=max_chunks,
                       fixed_sent_count=S, chunk_budget=budget)
    got = TextPacker(tok, cfg, splitter=split_sentences).pack(_TEXTS)

    np.testing.assert_array_equal(got.tokens, want[0])
    np.testing.assert_array_equal(got.sent_chunk, want[1])
    np.testing.assert_array_equal(got.sent_tok, want[2])
    assert got.n_chunks == want[3]


def test_packer_matches_executed_reference_under_budget(tmp_path,
                                                        monkeypatch):
    """Global budget exhaustion: our packer must equal the reference's
    chunk stream truncated to the first `budget` rows (with the routing of
    dropped chunks gone)."""
    ref = load_reference_module("model.py")
    monkeypatch.setattr(ref, "nltk_sentence_split", split_sentences)
    tok = WordPieceTokenizer.from_vocab_file(_vocab_file(tmp_path))
    max_tok, max_chunks, S, budget = 16, 4, 64, 7   # < the ~14 real chunks
    ref_out = ref.preprocess_batch(_TEXTS, _HFShim(tok), max_tok,
                                   max_chunks_per_sample=max_chunks,
                                   fixed_sent_count=S)
    assert len(ref_out[0]) > budget     # exhaustion actually triggers
    want = _ref_to_static(ref_out, budget, max_tok, len(_TEXTS), S,
                          tok.pad_id)
    cfg = PackerConfig(max_tok=max_tok, max_chunks_per_sample=max_chunks,
                       fixed_sent_count=S, chunk_budget=budget)
    got = TextPacker(tok, cfg, splitter=split_sentences).pack(_TEXTS)
    np.testing.assert_array_equal(got.tokens, want[0])
    np.testing.assert_array_equal(got.sent_chunk, want[1])
    np.testing.assert_array_equal(got.sent_tok, want[2])
    assert got.n_chunks == want[3]


def test_reference_quirks_actually_trigger(tmp_path, monkeypatch):
    """Guard the test's own strength: the engineered inputs must exercise
    flush-drop (a sample capped at max_chunks with leftover sentences) and
    the OOV/<SENT> clamp (no <SENT> id survives in the padded ids)."""
    ref = load_reference_module("model.py")
    monkeypatch.setattr(ref, "nltk_sentence_split", split_sentences)
    tok = WordPieceTokenizer.from_vocab_file(_vocab_file(tmp_path))
    ids, chunk2sample, _, _ = ref.preprocess_batch(
        _TEXTS, _HFShim(tok), 16, max_chunks_per_sample=4,
        fixed_sent_count=64)
    # doc 1 ("Great tent." x24) hits the 4-chunk cap => flush-drop path ran
    assert chunk2sample.count(1) == 4
    assert len(split_sentences(_TEXTS[1])) > 8
    # the <SENT> markers were all clamped to [PAD] (model.py:101-109)
    flat = {t for row in ids for t in row}
    assert tok.sent_id not in flat and tok.pad_id in flat


@pytest.mark.slow
def test_packer_fuzz_vs_executed_reference(tmp_path, monkeypatch):
    """Property-based sweep: random word-soup documents (vocab words, OOV
    junk, punctuation, degenerate empties) through random packer configs —
    the static packer must equal the EXECUTED reference on every draw.
    Complements the engineered cases above with unplanned compositions."""
    from hypothesis import given, settings, strategies as st

    ref = load_reference_module("model.py")
    monkeypatch.setattr(ref, "nltk_sentence_split", split_sentences)
    tok = WordPieceTokenizer.from_vocab_file(_vocab_file(tmp_path))

    words = ("the bike helmet was great tent light fits strap broke good "
             "works perfect price quality durable waterproof compact "
             "zzzq xyzzy b0rked").split()
    sentence = st.lists(st.sampled_from(words), min_size=1, max_size=12) \
        .map(lambda ws: " ".join(ws) + ".")
    document = st.lists(sentence, min_size=0, max_size=10) \
        .map(" ".join)

    @settings(max_examples=15, deadline=None)
    @given(texts=st.lists(document, min_size=1, max_size=5),
           max_tok=st.sampled_from([16, 24, 32]),
           max_chunks=st.sampled_from([1, 2, 4]),
           tight_budget=st.booleans())
    def check(texts, max_tok, max_chunks, tight_budget):
        S = 8
        full = len(texts) * max_chunks
        budget = max(1, full // 2) if tight_budget else full
        ref_out = ref.preprocess_batch(texts, _HFShim(tok), max_tok,
                                       max_chunks_per_sample=max_chunks,
                                       fixed_sent_count=S)
        want = _ref_to_static(ref_out, budget, max_tok, len(texts), S,
                              tok.pad_id)
        cfg = PackerConfig(max_tok=max_tok,
                           max_chunks_per_sample=max_chunks,
                           fixed_sent_count=S, chunk_budget=budget)
        got = TextPacker(tok, cfg, splitter=split_sentences).pack(texts)
        np.testing.assert_array_equal(got.tokens, want[0])
        np.testing.assert_array_equal(got.sent_chunk, want[1])
        np.testing.assert_array_equal(got.sent_tok, want[2])
        assert got.n_chunks == want[3]

    check()

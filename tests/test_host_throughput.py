"""Host-path throughput: the packer + native tokenizer must keep a device
step fed (the reference's bottleneck was synchronous host tokenization,
README.md:317 / SURVEY §7.8).  Loose lower bounds so CI stays robust; the
measured numbers print for the benchmark log."""
import time

import numpy as np
import pytest

from mmoe_multimodal_rec_tpu.config import PackerConfig
from mmoe_multimodal_rec_tpu.data.packer import TextPacker
from mmoe_multimodal_rec_tpu.data.sentence import split_sentences
from mmoe_multimodal_rec_tpu.data.synthetic import random_text
from mmoe_multimodal_rec_tpu.native import build_native


@pytest.mark.slow
def test_packer_throughput_native(tmp_path):
    if build_native() is None:
        pytest.skip("no g++")
    from mmoe_multimodal_rec_tpu.data.native_tokenizer import \
        NativeWordPieceTokenizer
    # review-scale vocab: letters + pieces, enough for greedy matching work
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] +
             list("abcdefghijklmnopqrstuvwxyz") +
             [f"##{c}" for c in "abcdefghijklmnopqrstuvwxyz"] +
             [w for w in ("great quality bike helmet tent sleeping bag "
                          "running shoes light compact durable waterproof "
                          "cheap broken zipper fits comfortable warm cold "
                          "##s ##ed ##ing . , ! ?").split()])
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab) + "\n")
    tok = NativeWordPieceTokenizer(str(vp))
    packer = TextPacker(tok, PackerConfig(), splitter=split_sentences)

    rng = np.random.default_rng(0)
    texts = [random_text(rng, 3, 9) for _ in range(256)]  # 128 samples x2 sides

    t0 = time.perf_counter()
    packer.pack(texts)
    dt = time.perf_counter() - t0
    docs_per_sec = len(texts) / dt
    print(f"\n[host] packer+native-tokenizer: {dt*1000:.1f} ms for "
          f"{len(texts)} docs ({docs_per_sec:.0f} docs/s)")
    # a 128-example training step needs 256 docs; the device step takes
    # >500 ms at this batch, so anything under ~400 ms keeps the overlap.
    assert dt < 2.0, f"host packing too slow: {dt:.2f}s for 256 docs"

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


@pytest.mark.slow
def test_batchloader_packing_scales_with_threads(tmp_path):
    """VERDICT #5: the pack stage must parallelize — with the GIL-releasing
    native tokenizer, 4 pack threads should beat 1 clearly (the reference
    used up to 32 DataLoader workers for the same reason, train.py:57-62)."""
    if build_native() is None:
        pytest.skip("no g++")
    from mmoe_multimodal_rec_tpu.data.loader import BatchLoader
    from mmoe_multimodal_rec_tpu.data.native_tokenizer import \
        NativeWordPieceTokenizer

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
    patch = np.zeros((196, 3, 16, 16), np.uint8)
    # review-length docs (tens of sentences): the workload the loader
    # actually faces, where the GIL-released native pack stage dominates
    samples = [{"user_text": random_text(rng, 30, 60),
                "item_text": random_text(rng, 30, 60),
                "patch": patch, "has_image": 1,
                "label_good": 1.0, "label_best": 0.0} for _ in range(32)]
    n_batches = 12

    def run(threads):
        stream = iter(samples * ((n_batches * 16) // len(samples)))
        loader = BatchLoader(stream, 16, packer, num_prefetch=n_batches,
                             num_threads=threads)
        it = iter(loader)
        t0 = time.perf_counter()
        out = [next(it) for _ in range(n_batches)]
        dt = time.perf_counter() - t0
        loader.close()
        return dt, out

    dt1, out1 = run(1)
    dt4, out4 = run(4)
    print(f"\n[host] pack {n_batches} batches: 1 thread {dt1*1e3:.0f} ms, "
          f"4 threads {dt4*1e3:.0f} ms ({dt1/dt4:.2f}x)")
    # determinism across thread counts (resume depends on it)
    for a, b in zip(out1, out4):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    # the speedup assertion needs real parallel hardware: on a 1-core box
    # threads can only time-slice, so only determinism is checkable above
    # (test_native_pack_releases_gil below proves the overlap MECHANISM on
    # 1 core; this test proves the speedup when cores exist)
    import os
    if len(os.sched_getaffinity(0)) >= 2:
        # loose bound: CI machines vary; real speedup is ~2-3x
        assert dt4 < dt1 * 0.9, f"no packing speedup: {dt1:.3f}s -> {dt4:.3f}s"
    else:
        pytest.skip(f"single-core host ({dt1/dt4:.2f}x observed) — "
                    "determinism verified, scaling unmeasurable")


@pytest.mark.slow
def test_native_pack_releases_gil(tmp_path):
    """GIL-contention proxy that works on a 1-CORE host (VERDICT r2 #7).

    The 'loader threads hide host work' story requires the native pack stage
    to RELEASE the GIL: a Python thread must keep making progress while the
    C++ tokenizer crunches.  Measured as spinner-increments/sec while the
    main thread (a) sleeps (idle ceiling) vs (b) hammers wp_pack_batch.
    With the GIL released the OS time-slices the two runnable threads and
    the spinner keeps a large fraction of its idle rate even on one core;
    if the C++ call held the GIL the spinner would be frozen for the entire
    native call and the ratio would collapse toward zero.
    """
    if build_native() is None:
        pytest.skip("no g++")
    import threading
    from mmoe_multimodal_rec_tpu.data.native_tokenizer import \
        NativeWordPieceTokenizer

    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] +
             list("abcdefghijklmnopqrstuvwxyz") +
             [f"##{c}" for c in "abcdefghijklmnopqrstuvwxyz"] +
             "great quality bike helmet tent ##s ##ed ##ing . , ! ?".split())
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab) + "\n")
    tok = NativeWordPieceTokenizer(str(vp))
    packer = TextPacker(tok, PackerConfig(), splitter=split_sentences)
    rng = np.random.default_rng(0)
    texts = [random_text(rng, 40, 70) for _ in range(256)]

    stop = threading.Event()
    counts = {"n": 0}

    def spin():
        n = 0
        while not stop.is_set():
            n += 1
        counts["n"] = n

    def spinner_rate(work, duration=1.0):
        stop.clear()
        t = threading.Thread(target=spin)
        t.start()
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < duration:
            work()
        dt = time.perf_counter() - t0
        stop.set()
        t.join()
        return counts["n"] / dt

    idle = spinner_rate(lambda: time.sleep(0.05))
    busy = spinner_rate(lambda: packer.pack(texts))
    ratio = busy / idle
    print(f"\n[host] spinner rate: idle {idle:.0f}/s, during native pack "
          f"{busy:.0f}/s ({ratio:.2f}x)")
    # GIL held for the native call would starve the spinner (~0); released +
    # fair time-slicing keeps a healthy fraction.  0.15 is a loose floor.
    assert ratio > 0.15, (
        f"spinner starved during native pack (ratio {ratio:.3f}) — "
        "is the GIL held across wp_pack_batch?")

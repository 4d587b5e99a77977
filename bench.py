"""Benchmark: training-step examples/sec/chip on the flagship baseline MMoE.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/sec/chip", "vs_baseline": N,
   "extra": {"train_home": ..., "infer": ...}}

The headline metric is baseline-variant train throughput; `extra` carries
the HoME-variant train and deterministic-inference numbers so round-over-
round regressions in those paths stay visible in the driver snapshots
(VERDICT r1 #7).  `--mode/--variant` still select a single measurement for
iterating locally; the default full sweep is what the driver records.

Workload == the reference's training step (train.py:218-288): per example,
two LoRA-BERT-base encoders over the packed text chunks (~2 chunks x 384
tokens/side on real review data), frozen ViT-base over 196 patch rows, the
cross/fuse experts and the dense-gated two-task head, full backward over the
trainable groups, AdamW update.  Synthetic token/patch data (device-side
throughput; host tokenization runs overlapped in loader threads and is
benchmarked separately in tests).

vs_baseline: the reference never published throughput (SURVEY §6 — no
benchmarks/ dir, no wall-clock anywhere).  BASELINE.md's setup implies a
2xA100-80GB DDP run at batch 128/GPU with synchronous host-side NLTK+HF
tokenization inside the step loop (train.py:236-239) and fp16 autocast.  We
estimate the reference at 40 examples/sec/GPU: ~170 TFLOP-equivalent text
fwd+bwd per 128-example micro-batch at a generous 35% A100 MFU (~1.6 s)
plus >=1.5 s synchronous CPU tokenization of 256 documents per step
(README.md:317 calls CPU preprocessing the bottleneck even after the 50x
NLTK switch).  vs_baseline = value / 40.
"""
from __future__ import annotations

import argparse
import json
import time


REFERENCE_EXAMPLES_PER_SEC_PER_CHIP = 40.0  # documented estimate, see above

# fallback last-measured context when no .bench_last.json exists yet
_LAST_MEASURED_STATIC = {"train": 136.23, "train_home": 133.66,
                         "infer": 469.12,
                         "source": "BENCHMARKS.md Results tables, 2026-08-18"}


def _last_path():
    import os
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".bench_last.json")


def load_last_measured() -> dict:
    """Most recent successful sweep's numbers (written by save_last_measured)
    so an unavailable-device error line carries REAL context, not a stale
    hardcoded table (VERDICT r3 next#8)."""
    try:
        with open(_last_path()) as f:
            return json.load(f)
    except Exception:
        return dict(_LAST_MEASURED_STATIC)


def save_last_measured(values: dict) -> None:
    import time as _t
    try:
        with open(_last_path(), "w") as f:
            json.dump({**values,
                       "source": f".bench_last.json (measured "
                                 f"{_t.strftime('%Y-%m-%d %H:%M')}Z)"}, f)
    except Exception:
        pass


def wait_for_device(budget_s: float, probe_timeout_s: float = 240.0) -> bool:
    """The tunnel-attached TPU is exclusive, and a wedged previous client
    can leave its grant stuck for a long time — jax.devices() then blocks
    INDEFINITELY in this process (observed 2026-08-17).  Probe from killable
    subprocesses until the device answers or the budget runs out, so a stuck
    grant yields a loud JSON error line instead of a silent hang."""
    import os
    import subprocess
    import sys
    deadline = time.time() + budget_s
    attempt = 0
    fast_fails = 0
    # inherit the environment UNCHANGED (incl. JAX_PLATFORMS): the probe
    # must exercise the exact backend the bench will use — stripping the
    # platform pin could let the probe "pass" on CPU while the real run
    # still hangs on the TPU claim
    env = dict(os.environ)
    while True:
        attempt += 1
        left = deadline - time.time()
        if left <= 0:
            return False
        t_probe = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=min(probe_timeout_s, left), env=env,
                stdout=subprocess.DEVNULL, stderr=subprocess.PIPE)
            if proc.returncode == 0:
                return True
            # A probe that DIES quickly is not a wedged grant — it's a
            # broken jax install / bad env; surface the real error and
            # fail fast instead of burning the whole wait budget on a
            # misleading "timed out" loop (ADVICE r3).
            err = proc.stderr.decode("utf-8", "replace").strip()
            tail = err.splitlines()[-1] if err else f"rc={proc.returncode}"
            if time.time() - t_probe < 0.25 * probe_timeout_s:
                fast_fails += 1
                print(f"[bench] device probe {attempt} FAILED fast "
                      f"(rc={proc.returncode}): {tail}",
                      file=sys.stderr, flush=True)
                if fast_fails >= 3:
                    print("[bench] 3 fast probe failures — not a wedged "
                          "grant; aborting the wait", file=sys.stderr,
                          flush=True)
                    return False
            else:
                print(f"[bench] device probe {attempt} failed slowly "
                      f"(rc={proc.returncode}): {tail}; retrying",
                      file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"[bench] device probe {attempt} timed out; retrying",
                  file=sys.stderr, flush=True)
        time.sleep(5)


def build_config(args, variant: str):
    from mmoe_multimodal_rec_tpu.config import Config
    cfg = Config()
    cfg.model.variant = variant
    cfg.model.remat = True
    cfg.model.remat_policy = args.remat_policy
    cfg.train.batch_size = args.batch
    cfg.train.optim.grad_accum = args.accum
    cfg.model.packer.chunk_budget = int(args.batch * args.chunks_per_sample)
    cfg.model.text.scan_layers = args.scan_layers
    cfg.model.shared_text_base = getattr(args, "shared_base", False)
    cfg.train.mesh.data_parallel = 1
    cfg.train.mesh.model_parallel = 1
    if getattr(args, "compiler_opt", None):
        cfg.train.compiler_options = dict(
            kv.split("=", 1) for kv in args.compiler_opt)
    return cfg


def random_batch(cfg, seed: int):
    import numpy as np
    from mmoe_multimodal_rec_tpu.train.loop import dummy_batch
    b = cfg.train.batch_size
    n = cfg.model.packer.chunk_budget
    L = cfg.model.packer.max_tok
    r = np.random.default_rng(seed)
    batch = dummy_batch(cfg, batch_size=b)
    for side in ("user", "item"):
        batch[f"{side}_tokens"] = r.integers(
            999, 30000, (n, L)).astype(np.int32)
        # ~8 sentences/sample routed into its 2 chunks
        chunks = (np.arange(b) * (n // b))[:, None] + \
            r.integers(0, max(n // b, 1), (b, 8))
        batch[f"{side}_sent_chunk"][:, :8] = chunks.astype(np.int32)
        batch[f"{side}_sent_tok"][:, :8] = r.integers(
            1, L - 1, (b, 8)).astype(np.int32)
    batch["patches"] = r.integers(0, 256, (b, 196, 768)).astype(np.uint8)
    batch["has_image"] = (r.random(b) < 0.8).astype(np.int32)
    batch["label_good"] = (r.random(b) < 0.5).astype(np.float32)
    batch["label_best"] = (r.random(b) < 0.3).astype(np.float32)
    return batch


def measure_train(args, variant: str):
    import jax
    import numpy as np
    from mmoe_multimodal_rec_tpu.train.loop import Trainer
    from mmoe_multimodal_rec_tpu.parallel.mesh import make_mesh
    cfg = build_config(args, variant)
    mesh = make_mesh(cfg.train.mesh, devices=jax.devices()[:1])
    trainer = Trainer(cfg, mesh=mesh)
    stacked = {k: np.broadcast_to(v, (args.accum,) + v.shape).copy()
               for k, v in random_batch(cfg, 0).items()}
    # stage the batch on device once: the production input pipeline overlaps
    # host->device transfers (data/loader.device_prefetch), so the step
    # metric should not pay a synchronous re-upload per step
    stacked = jax.device_put(stacked, trainer._batch_sharding)

    # warmup (includes compile); device_get forces a host fetch —
    # block_until_ready alone does not drain the remote transport.
    t_compile = time.perf_counter()
    for _ in range(args.warmup):
        m = trainer.run_step(stacked, device_resident=True)
    float(jax.device_get(m["loss"]))
    compile_s = time.perf_counter() - t_compile

    # >=3 independent reps: single-shot numbers on a network-tunneled chip
    # vary by double-digit percent (VERDICT r2 weak#3) — the headline is the
    # MEDIAN rep, with min/max carried alongside.
    examples = args.steps * args.accum * args.batch
    rates = []
    for _ in range(max(args.reps, 1)):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            m = trainer.run_step(stacked, device_resident=True)
        float(jax.device_get(m["loss"]))
        rates.append(examples / (time.perf_counter() - t0))
    rates.sort()
    med = rates[len(rates) // 2]
    ms = 1000.0 * examples / med / args.steps
    return med, ms, compile_s, {"reps_min": round(rates[0], 2),
                                "reps_max": round(rates[-1], 2),
                                "n_reps": len(rates)}


def measure_infer(args):
    import jax
    from mmoe_multimodal_rec_tpu.models.mmoe import MMoERecModel
    cfg = build_config(args, "baseline")
    cfg.train.batch_size = args.infer_batch
    cfg.model.packer.chunk_budget = int(args.infer_batch *
                                        args.chunks_per_sample)
    model = MMoERecModel(cfg.model)
    batch = random_batch(cfg, 0)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    if args.merge_lora and cfg.model.text.lora_rank > 0:
        # serving path: LoRA folded into the base kernels (exact at
        # deterministic inference) -> packed-qkv kernel path
        from mmoe_multimodal_rec_tpu.utils.lora import (merge_lora,
                                                        merged_model_config)
        variables = {"params": merge_lora(variables["params"],
                                          cfg.model.text.lora_alpha)}
        model = MMoERecModel(merged_model_config(cfg.model))

    def fwd(variables, batch):
        out = model.apply(variables, batch, deterministic=True)
        return out.logit_good, out.logit_best

    fwd = jax.jit(fwd, compiler_options=cfg.train.compiler_options)

    # stage the batch on device ONCE: without this every dispatch re-ships
    # ~10 MB over the tunnel and the measurement tracks link bandwidth, not
    # chip throughput (the host->device leg is what `--mode e2e` measures)
    batch = jax.device_put(batch)
    t_compile = time.perf_counter()
    for _ in range(args.warmup):
        out = fwd(variables, batch)
    float(jax.device_get(out[0]).sum())
    compile_s = time.perf_counter() - t_compile
    examples = args.steps * args.infer_batch
    rates = []
    for _ in range(max(args.reps, 1)):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fwd(variables, batch)
        float(jax.device_get(out[0]).sum())
        rates.append(examples / (time.perf_counter() - t0))
    rates.sort()
    med = rates[len(rates) // 2]
    return med, 1000.0 * examples / med / args.steps, compile_s, \
        {"reps_min": round(rates[0], 2), "reps_max": round(rates[-1], 2),
         "n_reps": len(rates)}


def measure_e2e(args):
    """FULL-SYSTEM throughput: tar shards -> threaded loader (decode +
    sentence split + tokenize + pack) -> device_prefetch -> train steps.
    This is the number a real training run sees; comparing it against the
    device-only train metric proves the host path stays overlapped (the
    reference's bottleneck was synchronous in-step tokenization,
    train.py:236-239 / README.md:317)."""
    import tempfile

    import jax
    from mmoe_multimodal_rec_tpu.data.loader import (device_prefetch,
                                                     make_train_loader)
    from mmoe_multimodal_rec_tpu.data.packer import TextPacker
    from mmoe_multimodal_rec_tpu.data.native_tokenizer import \
        load_best_tokenizer
    from mmoe_multimodal_rec_tpu.data.synthetic import write_synthetic_shards
    from mmoe_multimodal_rec_tpu.train.loop import (Trainer,
                                                    stack_micro_batches)
    from mmoe_multimodal_rec_tpu.parallel.mesh import make_mesh

    cfg = build_config(args, args.variant)
    with tempfile.TemporaryDirectory() as tmp:
        paths = write_synthetic_shards(tmp, n_samples=args.batch * 8,
                                       samples_per_shard=args.batch * 2)
        tokenizer = load_best_tokenizer(None, cfg.model.text.vocab_size)
        packer = TextPacker(tokenizer, cfg.model.packer)
        if args.pretok:
            # sidecar path: split+tokenize baked into the shards, loader
            # runs only the greedy pack (data/pretokenize.py)
            import os
            from mmoe_multimodal_rec_tpu.data.pretokenize import \
                pretokenize_shards
            paths = pretokenize_shards(os.path.join(tmp, "*.tar.gz"),
                                       os.path.join(tmp, "tok"), packer)
        loader = make_train_loader(
            paths, args.batch, packer,
            chunk_budget=cfg.model.packer.chunk_budget,
            num_prefetch=cfg.data.num_prefetch,
            num_threads=cfg.data.num_tokenizer_threads)
        # host-only leg: drain the threaded loader with no device in the
        # loop — separates pack/decode cost from transfer+compute so the
        # "host work stays overlapped" claim has a measured basis per run.
        host_it = iter(loader)
        for _ in range(args.accum * args.warmup):
            next(host_it)
        t0 = time.perf_counter()
        host_batches = args.steps * args.accum
        for _ in range(host_batches):
            next(host_it)
        host_rate = host_batches * args.batch / (time.perf_counter() - t0)
        loader.close()

        loader = make_train_loader(
            paths, args.batch, packer,
            chunk_budget=cfg.model.packer.chunk_budget,
            num_prefetch=cfg.data.num_prefetch,
            num_threads=cfg.data.num_tokenizer_threads)
        trainer = Trainer(cfg, mesh=make_mesh(cfg.train.mesh,
                                              devices=jax.devices()[:1]))
        it = iter(loader)

        def stacked_iter():
            while True:
                yield stack_micro_batches(
                    [next(it) for _ in range(args.accum)])

        staged = device_prefetch(stacked_iter(), n=cfg.data.num_prefetch,
                                 sharding=trainer._batch_sharding)
        try:
            for _ in range(args.warmup):
                m = trainer.run_step(next(staged), device_resident=True)
            float(jax.device_get(m["loss"]))
            t0 = time.perf_counter()
            for _ in range(args.steps):
                m = trainer.run_step(next(staged), device_resident=True)
            float(jax.device_get(m["loss"]))
            dt = time.perf_counter() - t0
        finally:
            loader.close()
    examples = args.steps * args.accum * args.batch
    return examples / dt, dt / args.steps * 1000, 0.0, \
        {"host_pack_examples_per_sec": round(host_rate, 2)}


def run_check(args):
    """On-device numerics self-check: the packed and split Pallas attention
    paths must agree bit-exactly on the live backend (the packed path's
    weight interleaving only executes on real TPU, so CI's interpret-mode
    tests can't cover the Mosaic-compiled wiring).  The einsum deviation is
    reported for context — on TPU, XLA lowers fp32 einsums to bf16 MXU
    passes by default, so the fp32-accumulating kernels are the MORE
    precise side of that comparison."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mmoe_multimodal_rec_tpu.ops.flash_attention import (
        _head_group, _reference_attention, flash_attention,
        flash_attention_packed, pack_qkv_weights)
    B, L, H, DH = 4, 256, 12, 64
    D = H * DH
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    mask = jnp.asarray((rng.random((B, L)) < 0.1).astype(np.int8))
    hb = _head_group(DH, H, 6)
    qkv = pack_qkv_weights(q, k, v, n_heads=H, hb=hb)
    split = jax.device_get(jax.jit(
        lambda q, k, v, m: flash_attention(q, k, v, m, None, H, 0.0))(
        q, k, v, mask))
    packed = jax.device_get(jax.jit(
        lambda qkv, m: flash_attention_packed(qkv, m, None, H, hb, 0.0))(
        qkv, mask))
    ein = jax.device_get(jax.jit(
        lambda q, k, v, m: _reference_attention(q, k, v, m, H))(
        q, k, v, mask))
    d_ps = float(np.abs(packed - split).max())
    d_se = float(np.abs(split - ein).max())
    assert d_ps == 0.0, f"packed/split kernels disagree: {d_ps}"
    return {"packed_vs_split_max_abs": d_ps,
            "kernel_vs_default_precision_einsum_max_abs": d_se,
            "platform": jax.devices()[0].platform}


def main():
    ap = argparse.ArgumentParser()
    # 64x2 micros = the same 128 examples/optimizer-step as the reference's
    # b128, but the per-micro activation residency fits the "quant" policy's
    # int8 saves in HBM (micro=128 needs 19.9G vs 15.75G); the attn-policy
    # control measured b64a2 == b128a1 exactly (133.3), so accum is free.
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--infer-batch", type=int, default=64)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3,
                    help="independent timing reps; headline = median rep "
                         "(tunnel-attached chips vary double-digit %% "
                         "shot-to-shot)")
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--variant", type=str, default="baseline")
    ap.add_argument("--chunks-per-sample", type=float, default=2.0,
                    help="avg packed chunks/side (review text packs to ~1-2; "
                         "reference cap is 4)")
    ap.add_argument("--mode", type=str, default="all",
                    choices=["all", "train", "infer", "e2e", "check"])
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--scan-layers", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="lax.scan the text-encoder layers (one compiled "
                         "body, stacked params) — same math, much faster "
                         "cold compile; see config.TextEncoderConfig")
    ap.add_argument("--shared-base", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="run both text experts as ONE encoder pass over "
                         "the concatenated [user;item] chunks (shared "
                         "frozen base + per-side LoRA; exact same math — "
                         "models/text_expert.DualTextExpert)")
    ap.add_argument("--merge-lora", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="inference: fold LoRA into base kernels (the "
                         "serving default, utils/lora.py)")
    ap.add_argument("--compiler-opt", action="append", default=[],
                    metavar="K=V",
                    help="extra XLA compiler option for the train-step "
                         "compile (repeatable; forwarded via "
                         "train.compiler_options, e.g. "
                         "--compiler-opt xla_tpu_scoped_vmem_limit_kib=65536)")
    ap.add_argument("--pretok", action="store_true",
                    help="e2e mode: bake pretokenized sidecars into the "
                         "bench shards first (the production fast host "
                         "path, data/pretokenize.py)")
    ap.add_argument("--remat-policy", type=str, default="quant",
                    choices=["full", "dots", "attn", "quant", "quant4", "quant_fc1"],
                    help="production default is 'quant' (int8-saved "
                         "activations; fastest measured — see BENCHMARKS.md "
                         "round-3 log)")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    else:
        # real-device run: make sure the exclusive TPU grant is actually
        # obtainable before this process commits to it (BENCH_DEVICE_WAIT_S
        # to tune; 0 disables)
        import os
        import sys
        budget = float(os.environ.get("BENCH_DEVICE_WAIT_S", "1500"))
        # simulated wedge for artifact-shape tests: the probe is blocked
        # without touching the device (tests/test_cli.py)
        wedged = os.environ.get("BENCH_SIMULATE_WEDGE") == "1"
        if wedged or (budget > 0 and not wait_for_device(budget)):
            print(json.dumps({
                "metric": "train_examples_per_sec_per_chip", "value": 0.0,
                "unit": "examples/sec/chip", "vs_baseline": 0.0,
                "error": "TPU unavailable: exclusive device grant did not "
                         "clear within the probe budget (wedged prior "
                         "client) — NOT a program failure"
                         + (" [SIMULATED for test]" if wedged else ""),
                "extra": {"last_measured_not_this_run":
                          load_last_measured()}}))
            return 1
    import jax
    # persistent compilation cache: repeated bench invocations skip the
    # multi-minute XLA compile when the program is unchanged
    import os
    import sys
    cache_dir = os.environ.get("BENCH_JAX_CACHE") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    # Measured-default train-compile options on TPU (+2.3% train throughput,
    # 939->918 ms/step, additive pair — BENCHMARKS round-4 experiment (d)).
    # An explicit --compiler-opt replaces them; non-TPU backends reject
    # xla_tpu_* names, so the default is backend-gated.
    if args.compiler_opt == ["none"]:
        args.compiler_opt = []   # explicit stock-XLA control run
    elif not args.compiler_opt and jax.default_backend() == "tpu":
        args.compiler_opt = [
            "xla_tpu_scoped_vmem_limit_kib=65536",
            "xla_tpu_enable_experimental_fusion_cost_model=true"]

    if args.mode == "train":
        value, ms, compile_s, reps = measure_train(args, args.variant)
        print(f"[bench] compile+warmup {compile_s:.1f}s, {ms:.1f} ms/step",
              file=sys.stderr)
        out = {"metric": ("train_examples_per_sec_per_chip"
                          if args.variant == "baseline" else
                          f"train_{args.variant}_examples_per_sec_per_chip"),
               "value": round(value, 2), "unit": "examples/sec/chip",
               "vs_baseline": round(
                   value / REFERENCE_EXAMPLES_PER_SEC_PER_CHIP, 3),
               "extra": {"compile_s": round(compile_s, 1), **reps}}
    elif args.mode == "check":
        out = {"metric": "kernel_numerics_check", "value": 1.0,
               "unit": "pass", "vs_baseline": 1.0, "extra": run_check(args)}
    elif args.mode == "e2e":
        value, ms, _, r_e = measure_e2e(args)
        print(f"[bench] e2e {ms:.1f} ms/step (shards->loader->device)",
              file=sys.stderr)
        out = {"metric": "train_e2e_examples_per_sec_per_chip",
               "value": round(value, 2), "unit": "examples/sec/chip",
               "vs_baseline": round(
                   value / REFERENCE_EXAMPLES_PER_SEC_PER_CHIP, 3),
               "extra": r_e}
    elif args.mode == "infer":
        value, ms, compile_s, reps = measure_infer(args)
        print(f"[bench] compile+warmup {compile_s:.1f}s, {ms:.1f} ms/step",
              file=sys.stderr)
        out = {"metric": "infer_examples_per_sec_per_chip",
               "value": round(value, 2), "unit": "examples/sec/chip",
               "vs_baseline": round(
                   value / REFERENCE_EXAMPLES_PER_SEC_PER_CHIP, 3),
               "extra": {"compile_s": round(compile_s, 1), **reps}}
    else:
        v_base, ms_b, c_b, r_b = measure_train(args, "baseline")
        print(f"[bench] baseline train: compile {c_b:.1f}s, {ms_b:.1f} "
              f"ms/step", file=sys.stderr)
        v_home, ms_h, c_h, r_h = measure_train(args, "home")
        print(f"[bench] home train: compile {c_h:.1f}s, {ms_h:.1f} ms/step",
              file=sys.stderr)
        v_inf, ms_i, c_i, r_i = measure_infer(args)
        print(f"[bench] infer b{args.infer_batch}: compile {c_i:.1f}s, "
              f"{ms_i:.1f} ms/step", file=sys.stderr)
        try:
            # same compiled program as baseline train (cache hit) + the
            # real loader; failure-tolerant so IO hiccups can't sink the
            # whole sweep
            v_e2e, ms_e, _, r_e = measure_e2e(args)
            print(f"[bench] e2e train: {ms_e:.1f} ms/step", file=sys.stderr)
        except Exception as e:   # pragma: no cover
            print(f"[bench] e2e skipped: {e}", file=sys.stderr)
            v_e2e = None
            r_e = {}
        save_last_measured({"train": round(v_base, 2),
                            "train_home": round(v_home, 2),
                            "infer": round(v_inf, 2)})
        out = {"metric": "train_examples_per_sec_per_chip",
               "value": round(v_base, 2), "unit": "examples/sec/chip",
               "vs_baseline": round(
                   v_base / REFERENCE_EXAMPLES_PER_SEC_PER_CHIP, 3),
               "extra": {
                   "train_min": r_b.get("reps_min"),
                   "train_max": r_b.get("reps_max"),
                   "n_reps": r_b.get("n_reps"),
                   "compile_train_s": round(c_b, 1),
                   "compile_home_s": round(c_h, 1),
                   "compile_infer_s": round(c_i, 1),
                   "train_home": round(v_home, 2),
                   "train_home_min": r_h.get("reps_min"),
                   "infer": round(v_inf, 2),
                   "infer_min": r_i.get("reps_min"),
                   "infer_vs_baseline": round(
                       v_inf / REFERENCE_EXAMPLES_PER_SEC_PER_CHIP, 3),
                   **({"train_e2e": round(v_e2e, 2), **r_e}
                      if v_e2e is not None else {})}}
    print(json.dumps(out))


if __name__ == "__main__":
    raise SystemExit(main())

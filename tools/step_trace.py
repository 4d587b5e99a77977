"""Capture an xprof trace of N train steps and print where the time goes.

Self-contained on-chip step profiler: builds the bench-shape Trainer
(bench.py build_config semantics), runs warmup + N traced steps via
jax.profiler, then parses the written ``*.xplane.pb`` DIRECTLY (pure-python
protobuf; the tensorboard_plugin_profile converters in this image are
version-skewed against tensorflow, so we aggregate the XPlane ourselves)
and prints:

- per-HLO-category self-time totals (fusion / convolution / custom-call /
  copy / ...), from the device plane's "XLA Ops" line;
- the top-K individual ops by total self time.

This is the tool behind BENCHMARKS.md's per-category step breakdowns
(round 3 did the same aggregation by hand); round 5 uses it to diff the
shared-text-base step against the two-tower step.

Run (TPU):
  python tools/step_trace.py --out /tmp/tr_tower
  python tools/step_trace.py --shared-base --out /tmp/tr_shared
  python tools/step_trace.py --diff /tmp/tr_tower /tmp/tr_shared
"""
import argparse
import collections
import glob
import json
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def capture(args) -> str:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from mmoe_multimodal_rec_tpu.config import Config
    from mmoe_multimodal_rec_tpu.parallel.mesh import make_mesh
    from mmoe_multimodal_rec_tpu.train.loop import Trainer

    cfg = Config()
    cfg.model.variant = args.variant
    cfg.model.remat = True
    cfg.model.remat_policy = args.remat_policy
    cfg.train.batch_size = args.batch
    cfg.train.optim.grad_accum = args.accum
    cfg.model.packer.chunk_budget = args.batch * 2
    cfg.model.shared_text_base = args.shared_base
    if jax.default_backend() == "tpu" and not args.stock_xla:
        cfg.train.compiler_options = {
            "xla_tpu_scoped_vmem_limit_kib": "65536",
            "xla_tpu_enable_experimental_fusion_cost_model": "true"}

    # the bench random batch (bench.py random_batch), inlined to keep this
    # tool importable without bench's argparse plumbing
    b, n, L = args.batch, cfg.model.packer.chunk_budget, cfg.model.packer.max_tok
    r = np.random.default_rng(0)
    from mmoe_multimodal_rec_tpu.train.loop import dummy_batch
    batch = dummy_batch(cfg, batch_size=b)
    for side in ("user", "item"):
        batch[f"{side}_tokens"] = r.integers(999, 30000, (n, L)).astype(np.int32)
        chunks = (np.arange(b) * (n // b))[:, None] + \
            r.integers(0, max(n // b, 1), (b, 8))
        batch[f"{side}_sent_chunk"][:, :8] = chunks.astype(np.int32)
        batch[f"{side}_sent_tok"][:, :8] = r.integers(1, L - 1, (b, 8)).astype(np.int32)
    batch["patches"] = r.integers(0, 256, (b, 196, 768)).astype(np.uint8)
    batch["has_image"] = (r.random(b) < 0.8).astype(np.int32)
    batch["label_good"] = (r.random(b) < 0.5).astype(np.float32)
    batch["label_best"] = (r.random(b) < 0.3).astype(np.float32)

    mesh = make_mesh(cfg.train.mesh, devices=jax.devices()[:1])
    trainer = Trainer(cfg, mesh=mesh)
    stacked = {k: np.broadcast_to(v, (args.accum,) + v.shape).copy()
               for k, v in batch.items()}
    stacked = jax.device_put(stacked, trainer._batch_sharding)

    print(f"[step_trace] compiling (shared_base={args.shared_base})...",
          flush=True)
    for _ in range(2):
        m = trainer.run_step(stacked, device_resident=True)
    float(jax.device_get(m["loss"]))
    print("[step_trace] tracing...", flush=True)
    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        m = trainer.run_step(stacked, device_resident=True)
    float(jax.device_get(m["loss"]))
    jax.profiler.stop_trace()
    return args.out


def _aggregate(xplane_path: str):
    """Parse one xplane.pb -> (category_totals_ms, op_totals_ms, meta)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())

    # device plane: TPU if present, else the CPU host plane is useless here
    plane = None
    for p in xs.planes:
        if "/device:TPU" in p.name or p.name.startswith("/device:tpu"):
            plane = p
            break
    if plane is None:
        raise SystemExit(f"no TPU device plane in {xplane_path}; planes: "
                         f"{[p.name for p in xs.planes]}")

    smeta = {sid: sm.name for sid, sm in plane.stat_metadata.items()}
    emeta = plane.event_metadata

    def md_category(md):
        for st in md.stats:
            if smeta.get(st.metadata_id) == "hlo_category":
                which = st.WhichOneof("value")
                if which == "ref_value":
                    return smeta.get(st.ref_value, "")
                if which == "str_value":
                    return st.str_value
        return ""

    # control-flow wrappers report their CHILDREN's time too on this line —
    # counting them would double the totals
    WRAPPERS = ("while", "call", "conditional")

    cats = collections.Counter()
    ops = collections.Counter()
    lines = [l for l in plane.lines if l.name == "XLA Ops"] or plane.lines
    for line in lines:
        for ev in line.events:
            md = emeta[ev.metadata_id]
            name = md.display_name or md.name
            cat = md_category(md) or _name_category(name)
            if cat in WRAPPERS or name.split(".")[0] in WRAPPERS:
                continue
            dur_ms = ev.duration_ps / 1e9
            cats[cat] += dur_ms
            ops[f"{cat}::{name}"] += dur_ms
    return cats, ops


def _name_category(name: str) -> str:
    base = name.split(".")[0].split("(")[0]
    return {"fusion": "fusion", "custom-call": "custom-call", "copy": "copy",
            "dot": "dot", "convolution": "convolution",
            "all-reduce": "all-reduce", "dynamic-slice": "slice",
            "dynamic-update-slice": "slice"}.get(base, base or "other")


def report(out_dir: str, steps: int, top: int = 25):
    paths = sorted(glob.glob(os.path.join(out_dir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {out_dir}")
    cats, ops = _aggregate(paths[-1])
    per_step = {k: v / steps for k, v in cats.items()}
    total = sum(per_step.values())
    print(f"\n[step_trace] {out_dir}: on-device total {total:.1f} ms/step "
          f"({steps} steps traced)")
    for k, v in sorted(per_step.items(), key=lambda kv: -kv[1]):
        print(f"  {k:<22} {v:9.2f} ms/step  ({100 * v / total:4.1f}%)")
    print(f"\n  top {top} ops (total self-time across {steps} steps):")
    for k, v in ops.most_common(top):
        print(f"    {v / steps:9.3f} ms/step  {k[:110]}")
    return per_step


def diff(dir_a: str, dir_b: str, steps: int):
    a = report(dir_a, steps)
    b = report(dir_b, steps)
    keys = sorted(set(a) | set(b), key=lambda k: -(b.get(k, 0) - a.get(k, 0)))
    print(f"\n[step_trace] category delta ({dir_b} - {dir_a}):")
    for k in keys:
        d = b.get(k, 0) - a.get(k, 0)
        print(f"  {k:<22} {d:+9.2f} ms/step   ({a.get(k, 0):.2f} -> "
              f"{b.get(k, 0):.2f})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--variant", type=str, default="baseline")
    ap.add_argument("--remat-policy", type=str, default="quant")
    ap.add_argument("--shared-base", action="store_true")
    ap.add_argument("--stock-xla", action="store_true",
                    help="drop the tuned per-compile XLA options")
    ap.add_argument("--out", type=str, default="/tmp/step_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--diff", nargs=2, metavar=("DIR_A", "DIR_B"),
                    help="only re-parse + diff two existing trace dirs")
    ap.add_argument("--report", type=str, default=None,
                    help="only re-parse an existing trace dir")
    args = ap.parse_args()
    if args.diff:
        diff(args.diff[0], args.diff[1], args.steps)
        return
    if args.report:
        report(args.report, args.steps, args.top)
        return
    capture(args)
    report(args.out, args.steps, args.top)


if __name__ == "__main__":
    main()

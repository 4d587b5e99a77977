"""Command-line entrypoints.

Replaces the reference's per-script argparse mains:
  train        ~ train.py / train_HoME.py   (variant via --model.variant=home)
  eval         ~ inference_and_auc.py / infer_auc_HoME (--recalibrate-bn)
  features     ~ data4moe_beam.py
  build-dataset~ data4model.py
  patches      ~ newpatch.py
  ingest-meta / ingest-reviews ~ meta2gcs.py / review2gcs.py
  synth        ~ (new) synthetic shard generator for smoke runs

All hyperparameters ride the dotted config flags, e.g.
  python -m mmoe_multimodal_rec_tpu train --data.train_pattern='shards/*.tar.gz' \
      --train.batch_size=128 --model.variant=home
"""
from __future__ import annotations

import argparse
from .data.io import fs_glob, fs_open
import json
import sys
from typing import List, Optional

from .config import Config


def _split_flags(argv: List[str]):
    """Separate --a.b=c config overrides from plain args."""
    cfg_flags, rest = [], []
    for a in argv:
        (cfg_flags if (a.startswith("--") and "=" in a and
                       "." in a.split("=")[0]) else rest).append(a)
    return cfg_flags, rest


def cmd_train(argv: List[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multihost", action="store_true",
                    help="call jax.distributed.initialize() for multi-host "
                         "pods (coordinator from env, standard JAX plumbing)")
    cfg_flags, rest = _split_flags(argv)
    args = ap.parse_args(rest)
    cfg = Config.from_flags(cfg_flags)
    if args.multihost:
        import jax
        jax.distributed.initialize()
    from .train.loop import train_from_config
    result = train_from_config(cfg)
    print(json.dumps({"examples_per_sec": result["examples_per_sec"],
                      "epoch_losses": result["epoch_losses"]["total"]}))
    return 0


def _restore_for_inference(cfg: Config, checkpoint: Optional[str],
                           reference_ckpt: Optional[str], tag: str):
    """Build init state and load the requested checkpoint (orbax dir or
    on-the-fly-converted reference torch .pt) — shared by eval/serve."""
    from .train.checkpoint import CheckpointManager
    from .train.loop import Trainer

    trainer = Trainer(cfg)
    if reference_ckpt:
        trainer.state = _load_reference_ckpt(cfg, trainer.state,
                                             reference_ckpt)
    else:
        ckpt = CheckpointManager(checkpoint or cfg.train.checkpoint_dir)
        restored, _ = ckpt.restore(trainer.state)
        if restored is not None:
            trainer.state = restored
            print(f"[{tag}] restored step={int(restored.step)}", flush=True)
        else:
            print(f"[{tag}] WARNING: no checkpoint found, using init "
                  "weights", flush=True)
    return trainer.state


def cmd_eval(argv: List[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="orbax checkpoint dir (defaults to train.checkpoint_dir)")
    ap.add_argument("--reference-ckpt", type=str, default=None,
                    help="torch .pt checkpoint in the reference layout "
                         "(train.py:351-363) — converted on the fly")
    ap.add_argument("--recalibrate-bn", action="store_true")
    cfg_flags, rest = _split_flags(argv)
    args = ap.parse_args(rest)
    cfg = Config.from_flags(cfg_flags)

    from .eval.evaluate import evaluate_from_config

    state = _restore_for_inference(cfg, args.checkpoint, args.reference_ckpt,
                                   "eval")
    res = evaluate_from_config(cfg, state,
                               recalibrate=args.recalibrate_bn)
    print(json.dumps({"auc_good": res["good"], "auc_best": res["best"],
                      "n": res["n"]}))
    return 0


def _load_reference_ckpt(cfg: Config, state, path: str):
    """torch reference checkpoint -> TrainState params/batch_stats, with a
    non-strict missing/unexpected report (infer_auc_HoME:47-56 behavior)."""
    import torch
    from flax import traverse_util
    from .train.optimizer import merge_params, split_trainable
    from .utils.hf_convert import convert_reference_checkpoint, load_into

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    converted, stats = convert_reference_checkpoint(ckpt, cfg.model)
    init_params = merge_params(state.trainable, state.frozen)
    merged, missing, unexpected = load_into(init_params, converted)
    for key in missing[:20]:
        print(f"[ckpt] missing: {key}", flush=True)
    for key in unexpected[:20]:
        print(f"[ckpt] unexpected: {key}", flush=True)
    print(f"[ckpt] loaded {path}: {len(missing)} missing, "
          f"{len(unexpected)} unexpected", flush=True)
    import numpy as np
    merged = traverse_util.unflatten_dict(
        {k: np.asarray(v, np.float32)
         for k, v in traverse_util.flatten_dict(merged).items()})
    trainable, frozen = split_trainable(merged, cfg.model.variant)
    new_stats = state.batch_stats
    if stats:
        new_stats, s_missing, s_unexp = load_into(state.batch_stats, stats)
        print(f"[ckpt] batch_stats: {len(s_missing)} missing, "
              f"{len(s_unexp)} unexpected", flush=True)
    return state.replace(trainable=trainable, frozen=frozen,
                         batch_stats=new_stats)


def cmd_features(argv: List[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--meta", required=True, help="meta jsonl(.gz) glob")
    ap.add_argument("--reviews", required=True, help="review jsonl(.gz) glob")
    ap.add_argument("--output", required=True)
    ap.add_argument("--train-end", default="2023-06-30")
    ap.add_argument("--valid-end", default="2023-09-30")
    ap.add_argument("--neg-k", type=int, default=5)
    ap.add_argument("--rate-5", type=float, default=0.2)
    args = ap.parse_args(argv)

    import gzip
    import os

    def read_jsonl(pattern):
        for path in fs_glob(pattern):
            raw = fs_open(path, "rb")
            with (gzip.open(raw, "rt") if path.endswith(".gz")
                  else __import__("io").TextIOWrapper(raw)) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        try:
                            yield json.loads(line)
                        except json.JSONDecodeError:
                            continue

    from .data.features import run_feature_pipeline, write_split_jsonl
    split_rows, image_urls = run_feature_pipeline(
        read_jsonl(args.meta), read_jsonl(args.reviews),
        args.train_end, args.valid_end, args.neg_k, args.rate_5)
    paths = write_split_jsonl(split_rows, args.output)
    url_path = os.path.join(args.output, "image_urls.jsonl")
    with fs_open(url_path, "w") as f:
        for rec in image_urls:
            f.write(json.dumps(rec) + "\n")
    print(json.dumps({"splits": sorted({s for _, s in split_rows}),
                      "files": len(paths), "image_urls": len(image_urls)}))
    return 0


def cmd_build_dataset(argv: List[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", required=True,
                    help="feature-row jsonl glob (one split)")
    ap.add_argument("--patches", default=None,
                    help="patch jsonl(.gz) glob (optional)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--samples-per-shard", type=int, default=1024)
    args = ap.parse_args(argv)

    import gzip

    def read_jsonl(pattern):
        for path in fs_glob(pattern):
            raw = fs_open(path, "rb")
            with (gzip.open(raw, "rt") if path.endswith(".gz")
                  else __import__("io").TextIOWrapper(raw)) as f:
                for line in f:
                    if line.strip():
                        yield json.loads(line)

    rows_by_asin = {}
    for row in read_jsonl(args.rows):
        rows_by_asin.setdefault(row.get("parent_asin"), []).append(row)
    patches_by_asin = {}
    if args.patches:
        for rec in read_jsonl(args.patches):
            patches_by_asin[rec["parent_asin"]] = rec

    from .data.textbuild import write_dataset
    paths = write_dataset(rows_by_asin, patches_by_asin, args.output,
                          args.samples_per_shard)
    print(json.dumps({"shards": len(paths)}))
    return 0


def cmd_patches(argv: List[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="image-url jsonl glob")
    ap.add_argument("--output", required=True, help="output jsonl.gz path")
    args = ap.parse_args(argv)
    from .data.patches import fetch_patches, write_patch_jsonl

    def read(pattern):
        for path in fs_glob(pattern):
            with fs_open(path, "r") as f:
                for line in f:
                    if line.strip():
                        yield json.loads(line)

    n = write_patch_jsonl(fetch_patches(read(args.input)), args.output)
    print(json.dumps({"patches": n}))
    return 0


def cmd_ingest(argv: List[str], kind: str) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True)
    ap.add_argument("--split", default="Sports_and_Outdoors")
    ap.add_argument("--shard-size", type=int,
                    default=100_000 if kind == "meta" else 300_000)
    args = ap.parse_args(argv)
    from .data import ingest
    fn = ingest.ingest_meta if kind == "meta" else ingest.ingest_reviews
    paths = fn(args.output, args.split, args.shard_size)
    print(json.dumps({"shards": len(paths)}))
    return 0


def cmd_synth(argv: List[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", required=True)
    ap.add_argument("--samples", type=int, default=1024)
    ap.add_argument("--samples-per-shard", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--signal", action="store_true",
                    help="plant an 85%%-correlated sentiment cue in the "
                         "user text so label_good is learnable from text "
                         "(convergence/e2e-learning runs)")
    args = ap.parse_args(argv)
    from .data.synthetic import write_synthetic_shards
    paths = write_synthetic_shards(args.output, args.samples,
                                   args.samples_per_shard, args.seed,
                                   signal=args.signal)
    print(json.dumps({"shards": len(paths)}))
    return 0


def cmd_ckpt_info(argv: List[str]) -> int:
    """Inspect an orbax checkpoint directory without building a model:
    steps present, resume position, payload composition, frozen-base
    fingerprint — the ops view of train/checkpoint.py's layout."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", type=str, default=None,
                    help="orbax dir (defaults to train.checkpoint_dir)")
    cfg_flags, rest = _split_flags(argv)
    args = ap.parse_args(rest)
    cfg = Config.from_flags(cfg_flags)

    import os

    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    directory = os.path.abspath(args.checkpoint or cfg.train.checkpoint_dir)
    if not os.path.isdir(directory):
        raise FileNotFoundError(directory)
    mngr = ocp.CheckpointManager(directory)
    steps = sorted(int(s) for s in mngr.all_steps())
    info = {"directory": directory, "steps": steps,
            "latest_step": steps[-1] if steps else None}
    fp_path = os.path.join(directory, "frozen_once.fingerprint.json")
    if os.path.exists(fp_path):
        with open(fp_path) as f:
            info["frozen_fingerprint"] = json.load(f)["sha256"][:16]
        info["frozen_once"] = os.path.isdir(
            os.path.join(directory, "frozen_once"))
    if steps:
        saved = mngr.restore(steps[-1])
        extra = saved.get("extra", {})
        info["resume"] = {k: int(v) for k, v in extra.items()}
        counts = {}
        nbytes = {}
        for part in ("trainable", "batch_stats", "opt_state"):
            leaves = [x for x in jax.tree.leaves(saved.get(part) or {})
                      if hasattr(x, "size")]
            counts[part] = int(sum(int(np.size(x)) for x in leaves))
            nbytes[part] = int(sum(
                int(np.size(x)) * np.dtype(getattr(x, "dtype", np.float32)
                                           ).itemsize for x in leaves))
        info["param_counts"] = counts
        info["payload_mb"] = {k: round(v / 1e6, 1) for k, v in nbytes.items()}
    mngr.close()
    print(json.dumps(info))
    return 0


def cmd_validate(argv: List[str]) -> int:
    """Scan shards and report drop/degradation reasons + label/image stats.
    The loaders (and the reference, train.py:54) drop malformed samples
    silently; this surfaces what a training run would quietly lose."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="shard glob")
    ap.add_argument("--limit", type=int, default=0,
                    help="stop after N samples (0 = all)")
    args = ap.parse_args(argv)

    import itertools
    from collections import Counter

    from .data.decode import decode_sample, explain_sample
    from .data.tar_io import iter_shard

    shards = fs_glob(args.input)
    if not shards:
        raise FileNotFoundError(f"no shards match {args.input!r}")
    reasons: Counter = Counter()
    degraded: Counter = Counter()
    n = ok = has_img = pretok = 0
    pos_good = pos_best = 0.0
    samples = itertools.chain.from_iterable(iter_shard(p) for p in shards)
    if args.limit:
        samples = itertools.islice(samples, args.limit)
    for sample in samples:
        n += 1
        rep = explain_sample(sample)
        if rep["status"] == "ok":
            ok += 1
            dec = decode_sample(sample)
            if dec is not None:
                has_img += dec["has_image"]
                pos_good += dec["label_good"]
                pos_best += dec["label_best"]
                pretok += int("user_sents" in dec)
        else:
            reasons[rep["reason"]] += 1
        for d in rep["degraded"]:
            degraded[d] += 1
    print(json.dumps({
        "shards": len(shards), "samples": n, "ok": ok, "dropped": n - ok,
        "drop_reasons": dict(reasons), "degraded": dict(degraded),
        "has_image_rate": round(has_img / ok, 4) if ok else None,
        "pretokenized_rate": round(pretok / ok, 4) if ok else None,
        "label_good_pos_rate": round(pos_good / ok, 4) if ok else None,
        "label_best_pos_rate": round(pos_best / ok, 4) if ok else None,
    }))
    return 0 if n == ok else 3


def cmd_pretokenize(argv: List[str]) -> int:
    """Bake sentence-token sidecars into shards (data/pretokenize.py) so
    the train/eval loaders skip sentence splitting + WordPiece entirely
    (the reference's stated future work, README.md:670)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="input shard glob")
    ap.add_argument("--output", required=True, help="output shard dir")
    cfg_flags, rest = _split_flags(argv)
    args = ap.parse_args(rest)
    cfg = Config.from_flags(cfg_flags)

    from .data.packer import packer_from_config
    from .data.pretokenize import pretokenize_shards

    paths = pretokenize_shards(args.input, args.output,
                               packer_from_config(cfg))
    print(json.dumps({"shards": len(paths)}))
    return 0


def cmd_serve(argv: List[str]) -> int:
    """Online prediction server over the LoRA-merged jit forward
    (eval/server.py): /v1/predict, /healthz, /varz."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", type=str, default=None)
    ap.add_argument("--reference-ckpt", type=str, default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--batch-size", type=int, default=None,
                    help="serving batch shape (default train.batch_size)")
    ap.add_argument("--buckets", type=str, default=None,
                    help="comma-separated ascending batch buckets (e.g. "
                         "4,16,64): small requests pad to the smallest "
                         "fitting bucket instead of the full batch")
    ap.add_argument("--max-wait-ms", type=float, default=5.0,
                    help="micro-batching window for coalescing concurrent "
                         "requests into one device batch")
    ap.add_argument("--no-merge-lora", action="store_true")
    ap.add_argument("--recalibrate-bn", action="store_true",
                    help="refresh HoME BatchNorm running stats over "
                         "data.valid_pattern before serving (same pass as "
                         "eval --recalibrate-bn)")
    ap.add_argument("--recal-samples", type=int, default=None,
                    help="cap the recalibration stream at this many samples "
                         "(default: one full pass over data.valid_pattern — "
                         "the count derives from the data; the reference's "
                         "22281, infer_auc_HoME:166, is just its full valid "
                         "split)")
    cfg_flags, rest = _split_flags(argv)
    args = ap.parse_args(rest)
    cfg = Config.from_flags(cfg_flags)

    from .eval.predict import Predictor
    from .eval.server import PredictionServer

    state = _restore_for_inference(cfg, args.checkpoint, args.reference_ckpt,
                                   "serve")
    if args.recalibrate_bn:
        from .data.packer import packer_from_config
        from .eval.evaluate import recalibrate_bn
        from .models.mmoe import MMoERecModel

        shards = fs_glob(cfg.data.valid_pattern)
        if not shards:
            raise FileNotFoundError(
                f"--recalibrate-bn needs data.valid_pattern shards "
                f"(no match for {cfg.data.valid_pattern!r})")
        print("[serve] recalibrating BatchNorm running stats...", flush=True)
        new_stats = recalibrate_bn(
            cfg, MMoERecModel(cfg.model), state.trainable, state.frozen,
            state.batch_stats, shards, packer_from_config(cfg),
            total_samples=args.recal_samples,
            bn_batch_size=cfg.train.batch_size)
        state = state.replace(batch_stats=new_stats)
    buckets = ([int(x) for x in args.buckets.split(",")]
               if args.buckets else None)
    predictor = Predictor(cfg, state.trainable, state.frozen,
                          state.batch_stats, batch_size=args.batch_size,
                          merge_lora=not args.no_merge_lora,
                          buckets=buckets)
    # compile every bucket before accepting traffic (the first request on
    # a cold shape would otherwise wait out a full jit compile)
    print(f"[serve] warmup compile (buckets {predictor.buckets})...",
          flush=True)
    predictor.warmup()
    server = PredictionServer(
        predictor, host=args.host, port=args.port,
        max_wait_ms=args.max_wait_ms,
        model_info={"variant": cfg.model.variant,
                    "step": int(state.step),
                    "lora_merged": not args.no_merge_lora})
    print(json.dumps({"serving": f"{args.host}:{server.port}",
                      "batch_size": predictor.batch_size}), flush=True)
    # graceful SIGTERM: stop accepting, drain in-flight scoring, exit 0.
    # shutdown() blocks until serve_forever() returns, so it must run off
    # the serving thread (the handler fires on the same main thread).
    import signal
    import threading

    def _stop(signum, frame):
        threading.Thread(target=server.httpd.shutdown, daemon=True).start()

    prev = signal.signal(signal.SIGTERM, _stop)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        signal.signal(signal.SIGTERM, prev)
        server.shutdown()
    return 0


COMMANDS = {
    "train": cmd_train,
    "eval": cmd_eval,
    "features": cmd_features,
    "build-dataset": cmd_build_dataset,
    "patches": cmd_patches,
    "ingest-meta": lambda a: cmd_ingest(a, "meta"),
    "ingest-reviews": lambda a: cmd_ingest(a, "reviews"),
    "synth": cmd_synth,
    "serve": cmd_serve,
    "pretokenize": cmd_pretokenize,
    "validate": cmd_validate,
    "ckpt-info": cmd_ckpt_info,
}


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in COMMANDS:
        print("usage: python -m mmoe_multimodal_rec_tpu "
              f"{{{','.join(COMMANDS)}}} [flags]")
        return 0 if argv and argv[0] in ("-h", "--help") else 2
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())

"""CLI smoke tests: synth -> features/build-dataset file flows -> tiny train
run with resume + eval, all through the public entrypoints."""
import json
import os

import numpy as np
import pytest

from mmoe_multimodal_rec_tpu.cli import main as cli_main


def test_cli_help_and_unknown():
    assert cli_main(["--help"]) == 0
    assert cli_main(["nope"]) == 2


def test_steps_per_epoch_override_applies_to_home_variant():
    """An explicit --train.steps_per_epoch must govern the HoME variant too
    (its separate 7200 default mirrors the reference's driver hardcode, but
    silently ignoring a user-set value would be a footgun)."""
    from mmoe_multimodal_rec_tpu.config import Config
    cfg = Config.from_flags(["--model.variant=home",
                             "--train.steps_per_epoch=4"])
    assert cfg.train.steps_per_epoch == 4
    assert cfg.train.home_steps_per_epoch == 4
    # explicit home value still wins over the mirror
    cfg = Config.from_flags(["--model.variant=home",
                             "--train.steps_per_epoch=4",
                             "--train.home_steps_per_epoch=6"])
    assert cfg.train.home_steps_per_epoch == 6
    # defaults untouched when nothing is set
    cfg = Config.from_flags([])
    assert cfg.train.steps_per_epoch == 5_600
    assert cfg.train.home_steps_per_epoch == 7_200


def test_compiler_options_flow():
    """train.compiler_options: JSON via the config CLI, K=V pairs via
    bench --compiler-opt; default None (compiler defaults)."""
    import importlib
    import sys as _sys
    from mmoe_multimodal_rec_tpu.config import Config
    cfg = Config.from_flags(
        ['--train.compiler_options={"xla_tpu_scoped_vmem_limit_kib":'
         ' "65536"}'])
    assert cfg.train.compiler_options == {
        "xla_tpu_scoped_vmem_limit_kib": "65536"}
    assert Config().train.compiler_options is None
    # round-trips through to_json/from_dict (checkpointed configs)
    cfg2 = Config.from_dict(json.loads(cfg.to_json()))
    assert cfg2.train.compiler_options == cfg.train.compiler_options

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    _sys.path.insert(0, repo)
    try:
        bench = importlib.import_module("bench")
    finally:
        _sys.path.pop(0)
    import argparse
    ns = argparse.Namespace(compiler_opt=["a=1", "b=x=y"], batch=4, accum=1,
                            remat_policy="quant", chunks_per_sample=2.0,
                            scan_layers=False)
    cfg3 = bench.build_config(ns, "baseline")
    assert cfg3.train.compiler_options == {"a": "1", "b": "x=y"}


def test_cli_synth_and_features_and_build(tmp_path, capsys):
    assert cli_main(["synth", "--output", str(tmp_path / "wds"),
                     "--samples", "32", "--samples-per-shard", "16"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["shards"] == 2

    # features from raw meta/review jsonl
    meta_path = tmp_path / "meta.jsonl"
    rev_path = tmp_path / "reviews.jsonl"
    with open(meta_path, "w") as f:
        for i in range(6):
            f.write(json.dumps({"parent_asin": f"p{i}",
                                "main_category": "Sports",
                                "title": f"Item {i}", "price": 5.0 + i,
                                "features": ["Nice thing."],
                                "description": ["Does stuff."],
                                "images": [{"hi_res": f"http://x/{i}"}]}) + "\n")
    with open(rev_path, "w") as f:
        for u in range(3):
            for j in range(3):
                f.write(json.dumps({
                    "user_id": f"u{u}", "parent_asin": f"p{(u + j) % 6}",
                    "rating": 4 + (j % 2), "title": "ok",
                    "text": "Pretty solid. Works.",
                    "sort_timestamp": 1670000000000 + j * 86400000}) + "\n")
    assert cli_main(["features", "--meta", str(meta_path),
                     "--reviews", str(rev_path),
                     "--output", str(tmp_path / "feat"),
                     "--neg-k", "1", "--rate-5", "1.0"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["image_urls"] == 6 and out["files"] >= 1

    # build-dataset from the train split rows
    rows_glob = str(tmp_path / "feat" / "train" / "*.jsonl")
    assert cli_main(["build-dataset", "--rows", rows_glob,
                     "--output", str(tmp_path / "wds2"),
                     "--samples-per-shard", "8"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["shards"] >= 1


@pytest.mark.slow
def test_cli_train_resume_eval(tmp_path, capsys):
    from mmoe_multimodal_rec_tpu.data.synthetic import write_synthetic_shards
    shards_dir = tmp_path / "wds"
    write_synthetic_shards(str(shards_dir), n_samples=48,
                           samples_per_shard=16, seed=1)
    from util import tiny_cli_flags
    flags = tiny_cli_flags() + [
        f"--data.train_pattern={shards_dir}/*.tar.gz",
        f"--data.valid_pattern={shards_dir}/*.tar.gz",
        f"--train.checkpoint_dir={tmp_path}/ckpt",
        f"--train.output_dir={tmp_path}/out",
        "--train.epochs=1",
        "--train.steps_per_epoch=4",
        "--train.optim.grad_accum=2",
        "--train.mesh.data_parallel=2",
    ]
    assert cli_main(["train"] + flags) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["epoch_losses"]) == 1
    assert os.path.exists(tmp_path / "out" / "train_loss_curves.png")
    assert os.path.exists(tmp_path / "out" / "metrics.jsonl")

    # resume: a second 1-epoch run restores epoch 1 and trains nothing new
    # (start_epoch == epochs), proving the restore path end to end
    assert cli_main(["train"] + flags) == 0
    capsys.readouterr()

    # eval from the checkpoint
    assert cli_main(["eval"] + flags) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["n"] == 48
    assert 0.0 <= res["auc_good"] <= 1.0 or np.isnan(res["auc_good"])


def test_ckpt_info(tmp_path, capsys):
    """ckpt-info reports steps, resume position, payload composition and
    the frozen fingerprint without building a model."""
    import json
    from mmoe_multimodal_rec_tpu.cli import main as cli_main
    from mmoe_multimodal_rec_tpu.train import CheckpointManager, Trainer
    from util import stacked_batch, tiny_config

    cfg = tiny_config("baseline")
    trainer = Trainer(cfg)
    trainer.run_step(stacked_batch(cfg, seed=0))
    mngr = CheckpointManager(str(tmp_path / "ck"))
    mngr.save(1, trainer.state,
              extra={"epoch": 0, "opt_step_in_epoch": 1, "host_step": 1},
              wait=True)
    mngr.close()
    rc = cli_main(["ckpt-info", "--checkpoint", str(tmp_path / "ck")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["steps"] == [1] and out["latest_step"] == 1
    assert out["resume"]["opt_step_in_epoch"] == 1
    assert out["param_counts"]["trainable"] > 0
    assert out["frozen_once"] is True and out["frozen_fingerprint"]


@pytest.mark.slow
def test_full_offline_dag_feeds_training(tmp_path, capsys):
    """The REAL offline DAG end to end: raw meta/review jsonl -> features
    CLI (causal feats, negatives, time split) -> build-dataset CLI (prompt
    templates, tar shards) -> validate -> pretokenize -> train 2 steps ->
    eval.  Everything upstream of training exists in reference-parity
    form; this pins the whole chain's INTEGRATION (authentic built texts
    through decode -> split -> pack -> model), which the synth-shard
    tests bypass."""
    meta_path = tmp_path / "meta.jsonl"
    rev_path = tmp_path / "reviews.jsonl"
    with open(meta_path, "w") as f:
        for i in range(8):
            f.write(json.dumps({"parent_asin": f"p{i}",
                                "main_category": "Sports",
                                "title": f"Trail Item {i}",
                                "price": 5.0 + i,
                                "features": ["Light.", "Durable."],
                                "description": ["Good for hiking trips."],
                                "images": [{"hi_res": f"http://x/{i}"}]}) + "\n")
    with open(rev_path, "w") as f:
        for u in range(4):
            for j in range(4):
                f.write(json.dumps({
                    "user_id": f"u{u}", "parent_asin": f"p{(u + j) % 8}",
                    "rating": 3 + (j % 3), "title": "solid",
                    "text": "Pretty solid gear. Took it camping twice. "
                            "Zippers held up fine.",
                    "sort_timestamp": 1670000000000 + j * 86400000}) + "\n")
    assert cli_main(["features", "--meta", str(meta_path),
                     "--reviews", str(rev_path),
                     "--output", str(tmp_path / "feat"),
                     "--neg-k", "1", "--rate-5", "1.0"]) == 0
    capsys.readouterr()
    assert cli_main(["build-dataset",
                     "--rows", str(tmp_path / "feat" / "train" / "*.jsonl"),
                     "--output", str(tmp_path / "wds"),
                     "--samples-per-shard", "16"]) == 0
    capsys.readouterr()

    pattern = str(tmp_path / "wds" / "*.tar.gz")
    assert cli_main(["validate", "--input", pattern]) == 0   # zero drops
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["ok"] == report["samples"] > 0

    from util import tiny_cli_flags
    tiny = tiny_cli_flags() + [
        "--train.batch_size=2", "--train.optim.grad_accum=1",
    ]
    assert cli_main(["pretokenize", "--input", pattern,
                     "--output", str(tmp_path / "wds_tok")] + tiny) == 0
    capsys.readouterr()
    tok_pattern = str(tmp_path / "wds_tok" / "*.tar.gz")
    assert cli_main(["train",
                     f"--data.train_pattern={tok_pattern}",
                     f"--train.checkpoint_dir={tmp_path}/ckpt",
                     f"--train.output_dir={tmp_path}/out",
                     "--train.epochs=1", "--train.steps_per_epoch=2",
                     "--train.log_every=1"] + tiny) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["epoch_losses"]) == 1
    assert np.isfinite(out["epoch_losses"][0])
    assert cli_main(["eval",
                     f"--data.valid_pattern={tok_pattern}",
                     f"--train.checkpoint_dir={tmp_path}/ckpt",
                     f"--train.output_dir={tmp_path}/out"] + tiny) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["n"] == report["samples"]


def test_bench_wedge_artifact_is_well_formed():
    """Wedge-proofing (VERDICT r3 next#8): when the device probe is blocked
    (simulated via BENCH_SIMULATE_WEDGE), bench.py must still emit ONE
    well-formed JSON line carrying the last-measured context instead of a
    bare failure."""
    import json as _json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["BENCH_SIMULATE_WEDGE"] = "1"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                          env=env, capture_output=True, text=True,
                          timeout=120, cwd=repo)
    assert proc.returncode == 1, (proc.returncode, proc.stderr[-500:])
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, lines
    out = _json.loads(lines[0])
    assert out["metric"] == "train_examples_per_sec_per_chip"
    assert out["value"] == 0.0
    assert "SIMULATED" in out["error"]
    ctx = out["extra"]["last_measured_not_this_run"]
    assert ctx["train"] > 0 and "source" in ctx

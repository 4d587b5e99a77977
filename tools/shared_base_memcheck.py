"""Compare the compiled train step's HBM footprint: two-tower vs shared
text base, at the bench shape (b64 accum2), on the live backend.

The shared-base layout (model.shared_text_base) runs the 12 encoder layers
at 2x rows instead of 24 layer-instances at 1x.  Total FLOPs/bytes are
identical, but PEAK liveness doubles for the text-encoder portion: during a
merged layer's remat backward, the [2M, ...] recompute buffers of BOTH sides
are live at once.  If XLA reports a materially larger temp allocation for
the merged program, the measured end-to-end slowdown (954 vs 919 ms/step,
BENCHMARKS.md "shared text base") is scheduling/spill pressure, not matmul
rate.

Uses jit(...).lower(...).compile() + memory_analysis(); with the persistent
compile cache warm (.jax_cache) this does not pay the multi-minute compile.

Run: python tools/shared_base_memcheck.py [--batch 64] [--accum 2]
"""
import argparse
import json

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def footprint(shared: bool, batch: int, accum: int):
    import numpy as np

    from mmoe_multimodal_rec_tpu.parallel.mesh import make_mesh
    from mmoe_multimodal_rec_tpu.train.loop import Trainer, dummy_batch
    from mmoe_multimodal_rec_tpu.config import Config

    cfg = Config()
    cfg.model.variant = "baseline"
    cfg.model.remat = True
    cfg.model.remat_policy = "quant"
    cfg.train.batch_size = batch
    cfg.train.optim.grad_accum = accum
    cfg.model.packer.chunk_budget = batch * 2
    cfg.model.shared_text_base = shared
    if jax.default_backend() == "tpu":
        cfg.train.compiler_options = {
            "xla_tpu_scoped_vmem_limit_kib": "65536",
            "xla_tpu_enable_experimental_fusion_cost_model": "true"}
    mesh = make_mesh(cfg.train.mesh, devices=jax.devices()[:1])
    trainer = Trainer(cfg, mesh=mesh)
    b = dummy_batch(cfg)
    stacked = {k: np.broadcast_to(v, (accum,) + v.shape).copy()
               for k, v in b.items()}
    lowered = trainer.train_step.lower(trainer.state, stacked)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    out = {"shared": shared}
    for name in ("temp_size_in_bytes", "argument_size_in_bytes",
                 "output_size_in_bytes", "alias_size_in_bytes",
                 "generated_code_size_in_bytes"):
        v = getattr(ma, name, None)
        if v is not None:
            out[name] = int(v)
    out["peak_gb"] = round((out.get("temp_size_in_bytes", 0)
                            + out.get("argument_size_in_bytes", 0)) / 2**30, 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--accum", type=int, default=2)
    args = ap.parse_args()
    res = [footprint(False, args.batch, args.accum),
           footprint(True, args.batch, args.accum)]
    for r in res:
        print(json.dumps(r))
    t0, t1 = res[0].get("temp_size_in_bytes"), res[1].get("temp_size_in_bytes")
    if t0 and t1:
        print(f"[memcheck] temp bytes shared/tower = {t1 / t0:.3f}x "
              f"({t1 / 2**30:.2f} vs {t0 / 2**30:.2f} GiB)")


if __name__ == "__main__":
    main()

"""Measure the MXU-rate case for the shared-base dual text encoder
(model.shared_text_base, models/text_expert.DualTextExpert).

The two-tower layout runs every encoder matmul TWICE at M rows (one
launch per side); the shared-base layout runs each ONCE at 2M rows.
Total FLOPs are identical — the win is launch count and per-launch MXU
utilization at larger M.  This tool times the exact encoder matmul
shapes of the b64/accum2 bench step (M = chunks x tokens per side per
micro) at M and 2M on the live chip and reports achieved TF/s, plus the
per-side LoRA slice chain on the merged batch vs two separate chains so
the adapter overhead of the merged pass is measured, not assumed.

Timing discipline == tools/roofline.py: ITERS serialized fori_loop
iterations via a scalar bf16 carry folded into the operand (compiles
once, nothing hoistable), drained with device_get (block_until_ready
does not drain this tunnel transport).

Run: python tools/shared_base_bench.py  (TPU; ~1-2 min incl. compiles)
Outputs a table + one JSON line; BENCHMARKS.md "shared text base" quotes it.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 256     # chained in-graph: amortizes the ~25-35 ms tunnel RTT
M_SIDE = 128 * 384          # chunks x tokens per side per micro (bench shape)
D, F, R = 768, 3072, 8


def timed_ms(fn, *args, iters=ITERS):
    out = fn(*args)
    float(jax.device_get(out).ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.device_get(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def _chain(body):
    """Serialized fori_loop: scalar bf16 carry folded into the input."""
    def run(*args):
        def step(_, acc):
            return body(acc, *args)
        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.bfloat16))
    return jax.jit(run)


def mm_rate(m, k, n):
    """bf16 [m,k]@[k,n] with fp32 accumulation; returns (ms/op, TF/s)."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.bfloat16)

    def body(acc, a, b):
        y = jax.lax.dot_general(a + acc, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-9)

    ms = timed_ms(_chain(body), a, b)
    return ms, 2 * m * k * n / (ms / 1e3) / 1e12


def lora_rate(mode):
    """Per-side rank-8 LoRA over a 2M-row merged activation:
    'dual'  — slice the merged rows, one adapter chain per side, concat
              (models/layers.Attention lora_sides=2);
    'tower' — the same math as two independent M-row chains (what the
              two-tower layout pays).  Returns ms per application."""
    rng = np.random.default_rng(0)
    la = jnp.asarray(rng.standard_normal((2, D, R)) * 0.02, jnp.bfloat16)
    lb = jnp.asarray(rng.standard_normal((2, R, D)) * 0.02, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((2 * M_SIDE, D)), jnp.bfloat16)

    if mode == "dual":
        # production formulation (models/layers.Attention): the two side
        # adapters folded into ONE rank-2r chain with a block mask — plain
        # 2D matmuls that fuse into the projection epilogue
        def body(acc, la, lb, x):
            h = x + acc
            a2 = jnp.concatenate([la[0], la[1]], axis=-1)   # [D, 2r]
            b2 = lb.reshape(2 * R, D)                       # [2r, D]
            t = h @ a2
            keep = (jnp.arange(2 * M_SIDE)[:, None] >= M_SIDE) == \
                (jnp.arange(2 * R)[None, :] >= R)
            t = jnp.where(keep, t, jnp.zeros((), t.dtype))
            d = t @ b2
            return d[0, 0] * jnp.bfloat16(1e-9)
    else:
        def body(acc, la, lb, x):
            h = x + acc
            d0 = (h[:M_SIDE] @ la[0]) @ lb[0] + h[:M_SIDE]
            d1 = (h[M_SIDE:] @ la[1]) @ lb[1] + h[M_SIDE:]
            return (d0[0, 0] + d1[0, 0]) * jnp.bfloat16(1e-9)

    return timed_ms(_chain(body), la, lb, x)


def main():
    dev = jax.devices()[0]
    print(f"[shared_base_bench] device: {dev.device_kind} ({dev.platform})")
    results = {}
    for name, k_in, k_out in (("proj_DxD", D, D),
                              ("fc1_DxF", D, F),
                              ("fc2_FxD", F, D)):
        for label, m in (("1x", M_SIDE), ("2x", 2 * M_SIDE)):
            ms, tf = mm_rate(m, k_in, k_out)
            results[f"{name}_{label}"] = {"ms": round(ms, 4),
                                          "tfs": round(tf, 1)}
            print(f"  {name} {label:>2} M={m:7d}: {ms:8.4f} ms  "
                  f"{tf:6.1f} TF/s")

    for mode in ("dual", "tower"):
        ms = lora_rate(mode)
        results[f"lora_{mode}"] = {"ms": round(ms, 4)}
        print(f"  lora {mode:>5}: {ms:8.4f} ms")

    # headline per matmul class: wall for both sides, two 1x launches vs
    # one 2x launch
    summary = {}
    for name in ("proj_DxD", "fc1_DxF", "fc2_FxD"):
        pair = 2 * results[f"{name}_1x"]["ms"]
        one = results[f"{name}_2x"]["ms"]
        summary[name] = {"two_1x_ms": round(pair, 4),
                         "one_2x_ms": round(one, 4),
                         "speedup": round(pair / one, 3)}
        print(f"[shared_base_bench] {name} both sides: two 1x launches "
              f"{pair:.4f} ms vs one 2x launch {one:.4f} ms "
              f"({pair / one:.3f}x)")
    results["summary"] = summary
    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Measured (not estimated) single-chip roofline for the flagship train step.

VERDICT r2 required the throughput plateau be justified "with measured
numbers": this tool times every constituent class of the b64xaccum2 train
step standalone at its EXACT shapes on the live chip —

  - HBM copy bandwidth (the elementwise/loop-fusion ceiling),
  - each dense-matmul shape of the text/ViT encoders (fwd + both dx
    orientations), with and without the "quant" policy's int8 epilogue,
  - the rank-8 LoRA chains (fwd delta, dx, dw),
  - the Pallas attention kernel fwd and fwd+bwd at step shapes —

then assembles the per-step op inventory (24 text layer-sides x 2 micros,
12 frozen ViT layers x 2 micros) into a floor step-time: the sum of every
constituent at its measured-best rate.  The gap between that floor and the
measured step is scheduling/fusion overhead XLA could in principle remove;
the floor itself is the measured ceiling of this workload on this chip.

Run: python tools/roofline.py  (TPU; ~2-4 min incl. compiles)
Outputs a table + one JSON line; BENCHMARKS.md quotes the results.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 256          # chained in-graph via fori_loop: amortizes the ~25-35ms
                     # tunnel dispatch RTT of this remote chip to <1%
M_SIDE = 128 * 384          # chunks x tokens per micro per text side
M_VIT = 64 * 197            # patches+cls per micro
D, F, R = 768, 3072, 8


def timed_ms(fn, *args, iters=None):
    iters = iters or ITERS
    out = fn(*args)
    float(jax.device_get(jax.tree.leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.device_get(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def _chain(body):
    """fori_loop with a scalar carry folded into the input: compiles once,
    runs `ITERS` serialized iterations regardless of unroll budget."""
    def run(*args):
        def step(_, acc):
            return body(acc, *args)
        return jax.lax.fori_loop(0, ITERS, step, jnp.zeros((), jnp.bfloat16))
    return jax.jit(run)


def copy_bw():
    """Measured HBM read+write bandwidth on a step-sized bf16 tensor."""
    x = jnp.ones((M_SIDE, F), jnp.bfloat16)

    @jax.jit
    def f(x):
        def step(_, y):
            return y + jnp.bfloat16(1.0)
        return jax.lax.fori_loop(0, ITERS, step, x)[0, 0]

    ms = timed_ms(f, x)
    gb = 2 * x.size * x.dtype.itemsize / 1e9
    return gb / (ms / 1e3)


def mm_rate(m, k, n, quant_epilogue=False):
    """bf16 [m,k]@[k,n] (chained ITERS times); returns (ms/op, TF/s)."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.bfloat16)

    def body(acc, a, b):
        y = jax.lax.dot_general(a + acc, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if quant_epilogue:
            sc = jnp.max(jnp.abs(y), axis=-1, keepdims=True) / 127.0
            q8 = jnp.round(y / jnp.maximum(sc, 1e-12)).astype(jnp.int8)
            return (q8[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-9)
                    + sc[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-9))
        return y[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-9)

    ms = timed_ms(_chain(body), a, b)
    return ms, 2 * m * k * n / (ms / 1e3) / 1e12


def mm_rate_orient(m, k, n, orient):
    """Time [m,k(,n)] dots in the three layouts that occur in the step:
      nn     — y = x@W:        dot(a[m,k], b[k,n], contract (1,0))  (fwd)
      nt     — dx = g@W^T:     dot(a[m,n], b[k,n], contract (1,1))  (what
               autodiff emits for the backward-dx of x@W)
      nt_pre — dx = g@Wt:      dot(a[m,n], bt[n,k], contract (1,0)) with
               the transpose MATERIALIZED once outside the loop (the
               candidate fix: pre-transposed weights refreshed per step)
    Returns (ms/op, TF/s).  All three perform 2*m*k*n FLOPs."""
    rng = np.random.default_rng(0)
    if orient == "nn":
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.bfloat16)
        dims = (((1,), (0,)), ((), ()))
    elif orient == "nt":
        a = jnp.asarray(rng.standard_normal((m, n)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.bfloat16)
        dims = (((1,), (1,)), ((), ()))
    elif orient == "nt_pre":
        a = jnp.asarray(rng.standard_normal((m, n)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((n, k)) * 0.02, jnp.bfloat16)
        dims = (((1,), (0,)), ((), ()))
    else:
        raise ValueError(orient)

    def body(acc, a, b):
        y = jax.lax.dot_general(a + acc, b, dims,
                                preferred_element_type=jnp.float32)
        return y[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-9)

    ms = timed_ms(_chain(body), a, b)
    return ms, 2 * m * k * n / (ms / 1e3) / 1e12


def dx_orientation_study():
    """ROADMAP round-3 experiment (a): is the in-step matmul gap (601 ms
    actual vs 485 ms floor) explained by the backward-dx orientation, and
    would once-per-step pre-transposed weights buy it back?  Prints
    nn/nt/nt_pre rates for the three dx shape classes of the text encoder;
    the floor assembly prices dx at the nn rate, so (nt - nn) x count is
    the orientation share of the gap and (nt - nt_pre) x count is the
    recoverable part."""
    cases = {
        # (name, m, k, n): dx of y=x@W with W[k,n] -> out [m,k]
        "dx_proj": (M_SIDE, D, D),
        "dx_fc1": (M_SIDE, D, F),    # g[m,3072] x W[768,3072]
        "dx_fc2": (M_SIDE, F, D),    # g[m,768]  x W[3072,768]
    }
    out = {}
    # per-step instance counts (48 text layer-instances: 12 layers x 2
    # sides x 2 micros): 4 proj-class dx (q,k,v,out), 1 fc1, 1 fc2
    counts = {"dx_proj": 48 * 4, "dx_fc1": 48, "dx_fc2": 48}
    gap_orient = gap_recover = 0.0
    for name, (m, k, n) in cases.items():
        row = {}
        for orient in ("nn", "nt", "nt_pre"):
            ms, tf = mm_rate_orient(m, k, n, orient)
            row[orient] = (ms, tf)
            out[f"{name}_{orient}_ms"] = round(ms, 3)
            out[f"{name}_{orient}_tfs"] = round(tf, 1)
        print(f"{name:8s} [{m},{k}x{n}]  "
              + "  ".join(f"{o}: {row[o][0]:.3f} ms ({row[o][1]:.0f} TF/s)"
                          for o in ("nn", "nt", "nt_pre")))
        gap_orient += counts[name] * (row["nt"][0] - row["nn"][0])
        gap_recover += counts[name] * (row["nt"][0] - row["nt_pre"][0])
    out["dx_gap_orientation_ms_per_step"] = round(gap_orient, 1)
    out["dx_gap_recoverable_ms_per_step"] = round(gap_recover, 1)
    print(f"\norientation share of the matmul gap: {gap_orient:.0f} ms/step; "
          f"recoverable via pre-transposed weights: {gap_recover:.0f} ms/step")
    print(json.dumps(out))
    return out


def lora_chain(m):
    """fwd delta [m,D]@[D,R]@[R,D] + bwd dw pair, as in training."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, D)), jnp.bfloat16)
    a = jnp.asarray(rng.standard_normal((D, R)) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((R, D)) * 0.02, jnp.bfloat16)

    def fwd_body(acc, x, a, b):
        d = ((x + acc) @ a) @ b
        return d[0, 0] * jnp.bfloat16(1e-9)

    def dw_body(acc, x, a, b):
        # dB = (x@a)^T @ dy ; dA = x^T @ (dy@b^T): both reduce over m
        h = (x + acc) @ a
        db = jax.lax.dot_general(h, x, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        da = jax.lax.dot_general(x, x @ jnp.swapaxes(b, 0, 1)
                                 * jnp.bfloat16(1e-3),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return (db[0, 0] + da[0, 0]).astype(jnp.bfloat16) * jnp.bfloat16(1e-9)

    return timed_ms(_chain(fwd_body), x, a, b), \
        timed_ms(_chain(dw_body), x, a, b)


def attn_kernel(chunks, heads, l, dh, bwd=False):
    """Repo Pallas attention at step shapes; returns ms/op."""
    import sys
    sys.path.insert(0, "/root/repo")
    from mmoe_multimodal_rec_tpu.ops.flash_attention import flash_attention
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((chunks, l, heads * dh)),
                    jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((chunks, l, heads * dh)),
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((chunks, l, heads * dh)),
                    jnp.bfloat16)

    if not bwd:
        def body(acc, q, k, v):
            o = flash_attention(q + acc, k, v, None, None, heads)
            return o[0, 0, 0] * jnp.bfloat16(1e-9)
        return timed_ms(_chain(body), q, k, v)
    else:
        iters = 64

        @jax.jit
        def g(q, k, v):
            def step(_, acc):
                def loss(qq):
                    return flash_attention(qq, k, v, None, None, heads) \
                        .astype(jnp.float32).sum()
                return jax.grad(loss)(q + acc)[0, 0, 0] \
                    .astype(jnp.bfloat16) * jnp.bfloat16(1e-9)
            return jax.lax.fori_loop(0, iters, step,
                                     jnp.zeros((), jnp.bfloat16))
        return timed_ms(g, q, k, v, iters=iters)


def main():
    import sys
    if "--tiny" in sys.argv:
        # CPU smoke of the harness (shapes small enough for this 1-core
        # host; numbers meaningless)
        global ITERS, M_SIDE, M_VIT, D, F
        ITERS, M_SIDE, M_VIT, D, F = 4, 256, 128, 64, 128
        jax.config.update("jax_platforms", "cpu")
    if "--dx" in sys.argv:
        dx_orientation_study()
        return
    res = {}
    res["hbm_copy_gbps"] = round(copy_bw(), 1)
    print(f"HBM add-copy bandwidth: {res['hbm_copy_gbps']} GB/s")

    shapes = {
        "proj_768": (M_SIDE, D, D),
        "qkv_2304": (M_SIDE, D, 3 * D),
        "fc1": (M_SIDE, D, F),
        "fc2": (M_SIDE, F, D),
        "proj_768_2x": (2 * M_SIDE, D, D),
        "qkv_2304_2x": (2 * M_SIDE, D, 3 * D),
        "fc1_2x": (2 * M_SIDE, D, F),
        "fc2_2x": (2 * M_SIDE, F, D),
        "vit_qkv": (M_VIT, D, 3 * D),
        "vit_fc1": (M_VIT, D, F),
        "vit_fc2": (M_VIT, F, D),
    }
    for name, (m, k, n) in shapes.items():
        ms, tf = mm_rate(m, k, n)
        res[f"mm_{name}_ms"] = round(ms, 3)
        res[f"mm_{name}_tfs"] = round(tf, 1)
        line = f"mm {name:12s} [{m:6d},{k:4d}]x[{k:4d},{n:4d}]  " \
               f"{ms:7.3f} ms  {tf:6.1f} TF/s"
        if name in ("fc1", "qkv_2304"):
            msq, tfq = mm_rate(m, k, n, quant_epilogue=True)
            res[f"mm_{name}_q8_ms"] = round(msq, 3)
            line += f"   (+int8 epilogue {msq:7.3f} ms, {tfq:6.1f} TF/s)"
        print(line)

    fms, dwms = lora_chain(M_SIDE)
    res["lora_fwd_ms"], res["lora_dw_ms"] = round(fms, 3), round(dwms, 3)
    print(f"lora r{R} fwd-delta chain {fms:.3f} ms, dw pair {dwms:.3f} ms")

    a_f = attn_kernel(128, 12, 384, 64, bwd=False)
    a_b = attn_kernel(128, 12, 384, 64, bwd=True)
    v_f = attn_kernel(64, 12, 197, 64, bwd=False)  # ViT seq incl. [CLS]
    res["attn_fwd_ms"] = round(a_f, 3)
    res["attn_fwdbwd_ms"] = round(a_b, 3)
    res["vit_attn_fwd_ms"] = round(v_f, 3)
    print(f"pallas attn text fwd {a_f:.3f} ms, fwd+bwd {a_b:.3f} ms; "
          f"vit fwd {v_f:.3f} ms")

    # ---- assemble the floor: per-step inventory (b64 x accum2) ----------
    # Text: 12 layers x 2 sides x 2 micros = 48 layer-instances.
    #  fwd: q,k,v (3x proj_768; q,v carry lora fwd), out proj, fc1(+q8),
    #       fc2, attn fwd.
    #  bwd (remat "quant": zero matmul recompute): dx out, dx q,k,v (3x),
    #       dx fc1 (fc1 shape), dx fc2 (fc2 shape... transposed same cost
    #       class), attn bwd includes its fwd recompute, lora dx + dw.
    t_text = 48 * (
        (3 + 1) * res["mm_proj_768_ms"]              # fwd qkv + out
        + res.get("mm_fc1_q8_ms", res["mm_fc1_ms"])  # fwd fc1 (+quant)
        + res["mm_fc2_ms"]                           # fwd fc2
        + (3 + 1) * res["mm_proj_768_ms"]            # dx qkv + dx out
        + res["mm_fc1_ms"] + res["mm_fc2_ms"]        # dx fc1 + dx fc2
        + 2 * res["lora_fwd_ms"] + 2 * res["lora_dw_ms"]
        + res["attn_fwdbwd_ms"])
    # ViT (frozen in baseline): 12 layers x 2 micros, forward only.
    t_vit = 24 * (res["mm_vit_qkv_ms"] + res["mm_vit_fc1_ms"]
                  + res["mm_vit_fc2_ms"] + res["vit_attn_fwd_ms"]
                  + res["mm_vit_fc2_ms"] * 0)  # out-proj ~ fc2/4, folded low
    # Elementwise/loop-fusion traffic measured from the step trace:
    # 93.8 GB/step (xprof, BENCHMARKS round-3) at the measured copy BW.
    t_elem = 93.8 / res["hbm_copy_gbps"] * 1e3
    # Residual small classes measured in the trace (reduce, copies, pads,
    # optimizer): ~20 ms.
    t_other = 20.0
    floor = t_text + t_vit + t_elem + t_other
    res["floor_text_ms"] = round(t_text, 1)
    res["floor_vit_ms"] = round(t_vit, 1)
    res["floor_elem_ms"] = round(t_elem, 1)
    res["floor_step_ms"] = round(floor, 1)
    res["floor_examples_per_sec"] = round(128 / (floor / 1e3), 1)
    print(f"\nfloor: text {t_text:.0f} + vit {t_vit:.0f} + elementwise "
          f"{t_elem:.0f} + other {t_other:.0f} = {floor:.0f} ms/step "
          f"-> {res['floor_examples_per_sec']} ex/s ceiling")
    print(json.dumps(res))


if __name__ == "__main__":
    main()

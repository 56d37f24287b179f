"""Roofline ledger + one-lever sweep for the student and ASDQE serving
paths (round 5, VERDICT item 4). The teacher has a dated per-category
ledger in docs/perf_plan.md; this gives the other two serving families
the same treatment:

  - XLA cost model (compiled.cost_analysis): FLOPs + bytes accessed
  - measured steady-state time (scalar-fetch synced, real chip)
  - implied fraction of the v5e compute (197 TF/s bf16 / ~99 fp32) and
    HBM (819 GB/s) rooflines
  - hlo_category time split (device trace)
  - the single most promising lever each: batch-shape sweep

Writes /root/repo/artifacts/roofline_r5/roofline.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

OUT_DIR = "/root/repo/artifacts/roofline_r5"
HBM_GBPS = 819.0
PEAK_BF16_TFS = 197.0
PEAK_FP32_TFS = 99.0  # v5e fp32 ~ half of bf16 MXU


def timed(fn, args, iters=6, warmup=2):
    for _ in range(warmup):
        float(jnp.mean(fn(*args)[0] if isinstance(fn(*args), tuple)
                       else fn(*args)))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    float(jnp.mean(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / iters


def ledger(name, jfn, args, dtype_peak_tfs, report, trace_dir=None):
    lowered = jax.jit(jfn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    fn = jax.jit(jfn)
    dt = timed(fn, args)
    entry = {
        "measured_ms": round(dt * 1e3, 2),
        "xla_flops_G": round(flops / 1e9, 1),
        "xla_bytes_GB": round(bytes_acc / 1e9, 3),
        "compute_floor_ms": round(flops / (dtype_peak_tfs * 1e12) * 1e3, 2),
        "hbm_floor_ms": round(bytes_acc / (HBM_GBPS * 1e9) * 1e3, 2),
    }
    floor = max(entry["compute_floor_ms"], entry["hbm_floor_ms"])
    entry["bound"] = ("hbm" if entry["hbm_floor_ms"]
                      >= entry["compute_floor_ms"] else "compute")
    entry["roofline_fraction"] = round(floor / entry["measured_ms"], 3)
    if trace_dir:
        from rethink_acoustic_image_enhancement_tpu.utils.profiling import (
            aggregate_trace,
            trace,
        )

        with trace(trace_dir):
            for _ in range(4):
                out = fn(*args)
            float(jnp.mean(out[0] if isinstance(out, tuple) else out))
        cats = aggregate_trace(trace_dir)
        entry["hlo_category_ms_per_call"] = {
            k: round(v / 4, 2) for k, v in list(cats.items())[:8]}
    report[name] = entry
    print(name, json.dumps(entry), flush=True)
    return entry


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    from rethink_acoustic_image_enhancement_tpu.models import (
        DenoiseRatePredictor,
        KDLAEStudent,
    )

    report = {"jax": jax.__version__,
              "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
              "assumed_peaks": {"hbm_GBps": HBM_GBPS,
                                "bf16_TFs": PEAK_BF16_TFS,
                                "fp32_TFs": PEAK_FP32_TFS}}

    # ---------------- student: b32 x 7 x 256^2 bf16 (BENCH_SUITE) ------
    student = KDLAEStudent(inp_channels=1, out_channels=1, residual=True,
                           hidden_channels=(16, 32, 64))
    sp = jax.jit(lambda r: student.init(
        r, jnp.zeros((1, 7, 32, 32)))["params"])(jax.random.PRNGKey(0))
    sp16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), sp)
    rng = np.random.default_rng(0)

    def student_fn(p, x):
        return jnp.clip(student.apply({"params": p}, x), 0.0, 1.0)

    x32 = jnp.asarray(rng.random((32, 7, 256, 256)), jnp.bfloat16)
    base = ledger("student_b32_256_bf16", student_fn, (sp16, x32),
                  PEAK_BF16_TFS, report,
                  trace_dir=os.path.join(OUT_DIR, "trace_student"))

    # lever: batch shape sweep (per-frame normalized)
    sweep = {}
    for b in (8, 16, 64, 128):
        xb = jnp.asarray(rng.random((b, 7, 256, 256)), jnp.bfloat16)
        dt = timed(jax.jit(student_fn), (sp16, xb))
        sweep[f"b{b}"] = round(dt / (b * 7) * 1e6, 2)  # us/frame
    sweep["b32"] = round(base["measured_ms"] / (32 * 7) * 1e3, 2)
    # lever: spatial shape (512px at matched pixel count: b8)
    x512 = jnp.asarray(rng.random((8, 7, 512, 512)), jnp.bfloat16)
    sweep["b8_512px_us_per_frame"] = round(
        timed(jax.jit(student_fn), (sp16, x512)) / (8 * 7) * 1e6, 2)
    x128 = jnp.asarray(rng.random((128, 7, 128, 128)), jnp.bfloat16)
    sweep["b128_128px_us_per_frame"] = round(
        timed(jax.jit(student_fn), (sp16, x128)) / (128 * 7) * 1e6, 2)
    report["student_sweep_us_per_frame"] = sweep
    print("student sweep:", sweep, flush=True)

    # ---------------- ASDQE: b4 x 512^2 fp32 (parity-pinned) -----------
    am = DenoiseRatePredictor()
    variables = jax.jit(lambda: am.init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 64, 64, 3)),
                                        jnp.zeros((1, 64, 64, 3))))()

    def asdqe_fn(v, a, b):
        return am.apply(v, a, b)

    lq = jnp.asarray(rng.random((4, 512, 512, 3)), jnp.float32)
    gt = jnp.asarray(rng.random((4, 512, 512, 3)), jnp.float32)
    ledger("asdqe_b4_512_fp32", asdqe_fn, (variables, lq, gt),
           PEAK_FP32_TFS, report,
           trace_dir=os.path.join(OUT_DIR, "trace_asdqe"))

    # levers: batch sweep (us/pair) + opt-in bf16 speed mode
    asweep = {}
    for b in (1, 2, 8, 16):
        a = jnp.asarray(rng.random((b, 512, 512, 3)), jnp.float32)
        g = jnp.asarray(rng.random((b, 512, 512, 3)), jnp.float32)
        asweep[f"b{b}_fp32"] = round(
            timed(jax.jit(asdqe_fn), (variables, a, g)) / b * 1e3, 2)
    v16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                       if x.dtype == jnp.float32 else x, variables)
    lq16 = lq.astype(jnp.bfloat16)
    gt16 = gt.astype(jnp.bfloat16)
    asweep["b4_bf16"] = round(
        timed(jax.jit(asdqe_fn), (v16, lq16, gt16)) / 4 * 1e3, 2)
    # bf16 score deviation vs fp32 (random weights — indicative only)
    s32 = np.asarray(asdqe_fn(variables, lq, gt), np.float64)
    s16 = np.asarray(asdqe_fn(v16, lq16, gt16), np.float64)
    asweep["bf16_vs_fp32_max_absdiff"] = float(np.abs(s32 - s16).max())
    report["asdqe_sweep_ms_per_pair"] = asweep
    print("asdqe sweep:", asweep, flush=True)

    with open(os.path.join(OUT_DIR, "roofline.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", os.path.join(OUT_DIR, "roofline.json"))


if __name__ == "__main__":
    main()

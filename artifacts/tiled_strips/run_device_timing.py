"""Device-side throughput for the strip/halo/fused tile modes (round 5).

The run_study.py throughput section timed through the predictor API, which
includes tunnel wire time (H2D/D2H of every batch) — that term drifts by
session and swamps the device-side ratios VERDICT items 1-2 ask about.
This script times the raw jitted programs with device-resident inputs and
scalar-fetch sync (the bench.py protocol), interleaved rounds, min-of-N.

Per-512px-image-equivalent accounting: a b8 dispatch of 256x512 strips
covers 4 images; of 256x256 tiles covers 2; halo strips run the padded
program shape (272x512 / 288x512) but still credit 4 images (the halo
rows are recomputed context, cropped at stitch).

Writes /root/repo/artifacts/tiled_strips/device_timing.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

OUT = "/root/repo/artifacts/tiled_strips/device_timing.json"
DT = jnp.bfloat16


def main():
    from rethink_acoustic_image_enhancement_tpu.models import flagship_teacher

    m = flagship_teacher(static="test")
    params = jax.jit(lambda: m.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 64, 64, 3)),
         "denoise_rate": jnp.zeros((1, 64, 64, 1))})["params"])()
    p16 = jax.tree.map(lambda x: x.astype(DT), params)
    mf = m.clone(fused=True, fused_resample=True)

    rng = np.random.default_rng(0)

    def batch(n, h, w):
        return (jnp.asarray(rng.random((n, h, w, 3)), DT),
                jnp.full((n, h, w, 1), 1.0, DT))

    def fwd(mod):
        def f(p, i, r):
            return jnp.clip(mod.apply({"params": p},
                                      {"img": i, "denoise_rate": r})["hq"],
                            0, 1)
        return jax.jit(f)

    def scan8(mod):
        def f(p, i, r):
            def body(_, xs):
                out = mod.apply({"params": p},
                                {"img": xs[0][None],
                                 "denoise_rate": xs[1][None]})
                return None, jnp.clip(out["hq"][0], 0, 1)
            return jax.lax.scan(body, None, (i, r))[1]
        return jax.jit(f)

    # mode name -> (fn, args, images_per_call)
    modes = {}
    i512, r512 = batch(8, 512, 512)
    modes["whole_scan8_512"] = (scan8(m), (p16, i512, r512), 8)
    isq, rsq = batch(8, 256, 256)
    modes["sq256_b8"] = (fwd(m), (p16, isq, rsq), 2)
    modes["sq256_b8_fused"] = (fwd(mf), (p16, isq, rsq), 2)
    ist, rst = batch(8, 256, 512)
    modes["strip256x512_b8"] = (fwd(m), (p16, ist, rst), 4)
    modes["strip256x512_b8_fused"] = (fwd(mf), (p16, ist, rst), 4)
    ih8, rh8 = batch(8, 272, 512)
    modes["strip272x512_b8_halo8"] = (fwd(m), (p16, ih8, rh8), 4)
    ih16, rh16 = batch(8, 288, 512)
    modes["strip288x512_b8_halo16"] = (fwd(m), (p16, ih16, rh16), 4)
    # 1024 bucket
    i1k, r1k = batch(4, 1024, 1024)
    modes["whole_scan4_1024"] = (scan8(m), (p16, i1k, r1k), 4)
    i1s, r1s = batch(8, 256, 1024)
    modes["strip256x1024_b8"] = (fwd(m), (p16, i1s, r1s), 2)

    for name, (fn, args, _) in modes.items():
        t0 = time.perf_counter()
        float(jnp.mean(fn(*args)))
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    times = {k: [] for k in modes}
    for _ in range(5):
        for name, (fn, args, _) in modes.items():
            t0 = time.perf_counter()
            float(jnp.mean(fn(*args)))
            times[name].append(time.perf_counter() - t0)

    report = {"jax": jax.__version__,
              "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
              "protocol": "device-resident bf16 inputs, scalar-fetch sync, "
                          "min of 5 interleaved rounds"}
    report["ms_per_512img_equiv"] = {
        k: round(min(v) / modes[k][2] * 1e3, 2) for k, v in times.items()}
    base = report["ms_per_512img_equiv"]["whole_scan8_512"]
    report["speedup_vs_whole512"] = {
        k: round(base / v, 3)
        for k, v in report["ms_per_512img_equiv"].items()}
    b1k = report["ms_per_512img_equiv"]["whole_scan4_1024"]
    report["note_1024"] = ("1024px entries are ms per 1024px image "
                           "(4x the pixels of a 512 image); strip mode "
                           f"speedup vs whole-1024 = "
                           f"{round(b1k / report['ms_per_512img_equiv']['strip256x1024_b8'], 3)}")
    print(json.dumps(report, indent=1))
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()

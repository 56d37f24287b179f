"""Headline-candidate A/B under the exact bench.py timing protocol
(pipelined back-to-back dispatches, ONE scalar sync at the end) — the
per-dispatch-sync protocol in run_device_timing.py taxes small-dispatch
modes ~2-5 ms/img of tunnel sync latency that a real serving pipeline
(and bench.py) amortizes.

Writes /root/repo/artifacts/tiled_strips/bench_protocol.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

OUT = "/root/repo/artifacts/tiled_strips/bench_protocol.json"
DT = jnp.bfloat16
ITERS = 3       # measurement repeats
DISPATCHES = 4  # back-to-back dispatches per measurement, sync once


def main():
    from rethink_acoustic_image_enhancement_tpu.models import flagship_teacher

    m = flagship_teacher(static="test")
    params = jax.jit(lambda: m.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 64, 64, 3)),
         "denoise_rate": jnp.zeros((1, 64, 64, 1))})["params"])()
    p16 = jax.tree.map(lambda x: x.astype(DT), params)
    rng = np.random.default_rng(0)

    def batch(n, h, w):
        return (jnp.asarray(rng.random((n, h, w, 3)), DT),
                jnp.full((n, h, w, 1), 1.0, DT))

    def fwd(p, i, r):
        return jnp.clip(m.apply({"params": p},
                                {"img": i, "denoise_rate": r})["hq"], 0, 1)

    def scan8(p, i, r):
        def body(_, xs):
            out = m.apply({"params": p},
                          {"img": xs[0][None], "denoise_rate": xs[1][None]})
            return None, jnp.clip(out["hq"][0], 0, 1)
        return jax.lax.scan(body, None, (i, r))[1]

    jf = jax.jit(fwd)
    js = jax.jit(scan8)
    i512, r512 = batch(8, 512, 512)
    isq, rsq = batch(8, 256, 256)
    ist, rst = batch(8, 256, 512)
    ih8, rh8 = batch(8, 272, 512)
    i1k, r1k = batch(4, 1024, 1024)
    i1s, r1s = batch(8, 256, 1024)
    # name -> (fn, args, images_per_dispatch)
    modes = {
        "whole_scan8_512": (js, (p16, i512, r512), 8),
        "sq256_b8": (jf, (p16, isq, rsq), 2),
        "strip256x512_b8": (jf, (p16, ist, rst), 4),
        "strip272x512_b8_halo8": (jf, (p16, ih8, rh8), 4),
        "whole_scan4_1024": (js, (p16, i1k, r1k), 4),
        "strip256x1024_b8": (jf, (p16, i1s, r1s), 2),
    }
    for name, (fn, args, _) in modes.items():
        t0 = time.perf_counter()
        float(jnp.mean(fn(*args)))
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    times = {k: [] for k in modes}
    for _ in range(ITERS):
        for name, (fn, args, n_img) in modes.items():
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(DISPATCHES)]
            float(jnp.mean(outs[-1]))
            times[name].append(
                (time.perf_counter() - t0) / (DISPATCHES * n_img))

    report = {"jax": jax.__version__,
              "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
              "protocol": f"{DISPATCHES} back-to-back dispatches, one "
                          "scalar sync (bench.py protocol), min of "
                          f"{ITERS} interleaved rounds"}
    report["ms_per_img"] = {
        k: round(min(v) * 1e3, 2) for k, v in times.items()}
    base = report["ms_per_img"]["whole_scan8_512"]
    report["speedup_vs_whole512"] = {
        k: round(base / v, 3) for k, v in report["ms_per_img"].items()}
    report["speedup_1024_strip_vs_whole"] = round(
        report["ms_per_img"]["whole_scan4_1024"]
        / report["ms_per_img"]["strip256x1024_b8"], 3)
    print(json.dumps(report, indent=1))
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()

"""Tiled-serving probe — perf_plan.md strategy #2 (the last open candidate).

Question: can overlap-tiled serving (split a big frame into T x T tiles,
batch them, stitch with blend ramps) beat whole-image serving at 512px?
Tiling pays an overlap-pixel tax (1.1-1.5x pixels depending on tile/overlap
geometry), so it only wins if the model's per-pixel throughput at small
tile sizes with batch>1 exceeds whole-image per-pixel throughput by more
than that factor. This script measures exactly that curve on-chip
(bf16, static='test', random weights — throughput is weight-independent).

Writes PERF_TILED.json. Quality study (MDTA attention is global per tile,
so tiled outputs deviate from whole-image semantics) only matters if the
speed curve says tiling can win at all.

Reference context: the reference evaluates whole-image only
(Train/basicsr/models/image_restoration_model.py:226-237 pad_test).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, args, n=6, warmup=2):
    for _ in range(warmup):
        float(jnp.asarray(fn(*args)).mean())
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        float(jnp.asarray(outs[-1]).mean())
        times.append((time.perf_counter() - t0) / n)
    return min(times)


def main():
    from rethink_acoustic_image_enhancement_tpu.models import flagship_teacher

    m = flagship_teacher(static="test")
    params = jax.jit(lambda: m.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 64, 64, 3)),
         "denoise_rate": jnp.zeros((1, 64, 64, 1))})["params"])()
    params = jax.tree.map(lambda v: v.astype(jnp.bfloat16), params)

    def fwd(p, i, r):
        out = m.apply({"params": p}, {"img": i, "denoise_rate": r})
        return jnp.clip(out["hq"], 0, 1).mean()

    fn = jax.jit(fwd)
    rng = np.random.default_rng(0)
    results = {}

    # (batch, H, W) points: whole-image controls + tiled candidates.
    # 272-b4 with 32px overlap reconstructs 512 (2*272-32=512); 256-b4 is
    # the no-overlap 2x2 tiling of 512; 344x232-b6 covers 664x440 (the
    # MDD whole-frame pad) with >=24px overlap; 1024-b1 is the huge-frame
    # scaling control.
    points = [
        (1, 512, 512),
        (4, 272, 272),
        (4, 256, 256),
        (2, 384, 384),
        (1, 256, 256),
        (8, 256, 256),
        (1, 664, 440),
        (6, 272, 272),
        (1, 1024, 1024),
    ]
    for b, h, w in points:
        img = jnp.asarray(rng.random((b, h, w, 3)), jnp.bfloat16)
        rate = jnp.full((b, h, w, 1), 1.0, jnp.bfloat16)
        dt = timed(fn, (params, img, rate))
        px = b * h * w
        key = f"b{b}_{h}x{w}"
        results[key] = {
            "ms": round(dt * 1e3, 2),
            "mpx_per_s": round(px / dt / 1e6, 2),
        }
        print(key, results[key], flush=True)

    # derived verdicts
    ctl = results["b1_512x512"]
    for cand, factor in [("b4_272x272", (4 * 272 * 272) / 512**2),
                         ("b4_256x256", 1.0)]:
        r = results[cand]
        results[f"tiled_512_via_{cand}_effective_ms"] = round(
            r["ms"], 2)
        results[f"tiled_512_via_{cand}_speedup"] = round(
            ctl["ms"] / r["ms"], 3)
        results[f"tiled_512_via_{cand}_pixel_tax"] = round(factor, 3)
    whole = results["b1_664x440"]
    tiled = results["b6_272x272"]
    results["tiled_mdd_frame_speedup"] = round(whole["ms"] / tiled["ms"], 3)

    with open("PERF_TILED.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

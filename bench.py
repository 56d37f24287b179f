"""Headline benchmark: KDLAE-T 512px denoise throughput, images/sec/chip.

Measures the flagship teacher (full 26.9M-param notebook config,
static='test' denoise path) on the available accelerator in bf16 — the
production serving configuration. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

vs_baseline is relative to the PyTorch reference stack run on this host's
CPU (the only hardware the reference ships support for that we can run:
no CUDA here, and the reference publishes no throughput numbers —
BASELINE.md). Measured once with torch 2.13 (8 threads): 31.48 s/img at
256px => 125.9 s/img at 512px (conv cost scales with pixel count)
= 7.94e-3 img/s. BASELINE.md's north star is >= 10x CPU baseline.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# torch-CPU reference throughput on this host (see module docstring).
CPU_BASELINE_IMG_PER_S = 1.0 / 125.9

BATCH = 1  # measured best on v5e (batch 2/4 are HBM-bound slower per image)
SIZE = 512
DTYPE = jnp.bfloat16
WARMUP = 2
ITERS = 10


def main() -> None:
    from rethink_acoustic_image_enhancement_tpu.models import KDLAETeacher

    model = KDLAETeacher(
        dim=48, num_blocks=(4, 6, 6, 8), num_refinement_blocks=4,
        heads=(1, 2, 4, 8), ffn_expansion_factor=2.66,
        layernorm_type="BiasFree", static="test", params="cat",
    )
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 64, 64, 3)),
         "denoise_rate": jnp.zeros((1, 64, 64, 1))})["params"])()
    params = jax.tree.map(lambda x: x.astype(DTYPE), params)

    img = jnp.asarray(np.random.default_rng(0).random((BATCH, SIZE, SIZE, 3)),
                      DTYPE)
    rate = jnp.full((BATCH, SIZE, SIZE, 1), 1.0, DTYPE)

    @jax.jit
    def denoise(params, img, rate):
        out = model.apply({"params": params},
                          {"img": img, "denoise_rate": rate})
        return jnp.clip(out["hq"], 0.0, 1.0)

    # NB: sync via a scalar device_get — block_until_ready() does not
    # actually block on the experimental axon TPU platform.
    for _ in range(WARMUP):
        float(denoise(params, img, rate).mean())

    t0 = time.perf_counter()
    outs = [denoise(params, img, rate) for _ in range(ITERS)]
    float(outs[-1].mean())
    dt = time.perf_counter() - t0

    img_per_s = BATCH * ITERS / dt
    print(json.dumps({
        "metric": f"KDLAE-T {SIZE}px denoise throughput (bf16, batch {BATCH})",
        "value": round(img_per_s, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / CPU_BASELINE_IMG_PER_S, 1),
    }))


if __name__ == "__main__":
    main()

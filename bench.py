"""Headline benchmark: KDLAE-T 512px denoise throughput, images/sec/chip.

Measures the flagship teacher (full 26.9M-param notebook config,
static='test' denoise path) on the available accelerator in bf16 — the
production serving configuration. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

vs_baseline is relative to the PyTorch reference stack run on this host's
CPU (the only hardware the reference ships support for that we can run:
no CUDA here, and the reference publishes no throughput numbers —
BASELINE.md). Measured DIRECTLY at 512px with torch 2.13.0+cpu
(8 threads, static='test', one fp32 forward): 631.01 s/img = 1.58e-3
img/s. (Round 1 extrapolated 125.9 s from a 256px measurement; the direct
512px number is 5x worse — CPU conv cost scales superlinearly here.)
BASELINE.md's north star is >= 10x CPU baseline.

Serving mode (round 2): SCAN_IMAGES single-image forwards run back-to-back
inside ONE jit via lax.scan — numerics are bit-identical to dispatching
each image separately (verified on-chip, PERF_SWEEP2.json
scan_parity_max_abs_diff = 0.0; scan iterates the leading dim, and every
op in the model is per-image), but the per-dispatch tunnel/host overhead
amortizes across the group. Measured r2: scan8 126.95 ms/img vs 132.05
dispatch-per-image; plain batch 2/4 are SLOWER per image (157/184 ms —
XLA picks worse layouts), and no XLA compiler flag beat the default
compile (PERF_SWEEP.json). MFU at 127 ms/img: 1641 GF / 0.127 s
= 12.9 TF/s ≈ 6.6% of v5e bf16 peak — the model is HBM-bound
(conv+formatting traffic ~62 GB/img ≈ 76 ms at 819 GB/s).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

# torch-CPU reference throughput on this host (see module docstring).
CPU_BASELINE_IMG_PER_S = 1.0 / 631.01

SCAN_IMAGES = 8  # images per dispatch (serving group); batch stays 1
SIZE = 512
DTYPE = jnp.bfloat16
WARMUP = 2
ITERS = 3  # dispatches; total images = SCAN_IMAGES * ITERS


def _backend_answers(timeout_s: float = 120.0) -> bool:
    """Probe the accelerator backend in a throwaway subprocess. The
    tunnel-attached client can wedge at claim time (stale device claim),
    blocking jax.devices() forever — better to fail fast with a clear
    message than hang the caller (same guard as __graft_entry__)."""
    import subprocess
    import sys

    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            capture_output=True, text=True, timeout=timeout_s)
        return out.returncode == 0 and "ok" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def _wait_for_backend() -> bool:
    """Retry the probe with bounded patience: a wedged tunnel claim has
    been observed to clear server-side after a while (CLAUDE.md), so a
    one-shot probe throws away recoverable benches. Total patience via
    RAIE_BENCH_PROBE_PATIENCE_S (default 1800 s, 0 = single probe)."""
    import os
    import sys

    patience = float(os.environ.get("RAIE_BENCH_PROBE_PATIENCE_S", "1800"))
    deadline = time.monotonic() + patience
    while True:
        if _backend_answers():
            return True
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        print(f"bench.py: backend probe failed; retrying "
              f"({remaining:.0f}s of patience left)", file=sys.stderr)
        time.sleep(min(60.0, max(1.0, remaining)))


def main() -> None:
    if not _wait_for_backend():
        import sys

        print("bench.py: accelerator backend did not answer any probe "
              "(wedged tunnel claim?) — refusing to hang", file=sys.stderr)
        raise SystemExit(1)

    from rethink_acoustic_image_enhancement_tpu.models import flagship_teacher

    model = flagship_teacher(static="test")
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 64, 64, 3)),
         "denoise_rate": jnp.zeros((1, 64, 64, 1))})["params"])()
    params = jax.tree.map(lambda x: x.astype(DTYPE), params)

    imgs = jnp.asarray(
        np.random.default_rng(0).random((SCAN_IMAGES, 1, SIZE, SIZE, 3)),
        DTYPE)
    rates = jnp.full((SCAN_IMAGES, 1, SIZE, SIZE, 1), 1.0, DTYPE)

    @jax.jit
    def denoise_group(params, imgs, rates):
        def body(_, xs):
            img, rate = xs
            out = model.apply({"params": params},
                              {"img": img, "denoise_rate": rate})
            return None, jnp.clip(out["hq"], 0.0, 1.0)

        _, outs = jax.lax.scan(body, None, (imgs, rates))
        return outs

    # NB: sync via a scalar device_get — block_until_ready() does not
    # actually block on the experimental axon TPU platform.
    for _ in range(WARMUP):
        float(denoise_group(params, imgs, rates).mean())

    t0 = time.perf_counter()
    outs = [denoise_group(params, imgs, rates) for _ in range(ITERS)]
    float(outs[-1].mean())
    dt = time.perf_counter() - t0

    img_per_s = SCAN_IMAGES * ITERS / dt
    print(json.dumps({
        "metric": f"KDLAE-T {SIZE}px denoise throughput "
                  f"(bf16, serving group {SCAN_IMAGES})",
        "value": round(img_per_s, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / CPU_BASELINE_IMG_PER_S, 1),
    }))


if __name__ == "__main__":
    main()

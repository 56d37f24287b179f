"""Weight-streaming probe (round 5, VERDICT item 6): does int8 weight
STORAGE with dequant-on-read cut the tile program's HBM traffic enough
to matter? int8 MXU *compute* already lost (PERF_SWEEP3), but
bandwidth-bound serving could in principle win from halved weight bytes.

First, the arithmetic this probe exists to check: the teacher is 26.9M
params = 54 MB bf16. A b8x256 tile dispatch moves each weight ONCE
(batched convs share weights across the batch), so weights are ~54 MB of
the ~150+ GB/s-seconds the 186 ms dispatch streams — well under 1%. The
measured A/B below settles whether XLA's dequant placement changes
anything anyway (it can fuse the int8->bf16 cast into the conv's weight
read, or materialize a dequantized copy — the latter would ADD traffic).

Writes /root/repo/artifacts/roofline_r5/weight_streaming.json.
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


def timed(fn, args, iters=5, warmup=2):
    for _ in range(warmup):
        float(jnp.mean(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.mean(out))
    return (time.perf_counter() - t0) / iters


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    from rethink_acoustic_image_enhancement_tpu.models import flagship_teacher

    m = flagship_teacher(static="test")
    params = jax.jit(lambda: m.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 64, 64, 3)),
         "denoise_rate": jnp.zeros((1, 64, 64, 1))})["params"])()
    p16 = jax.tree.map(lambda v: v.astype(jnp.bfloat16), params)

    # int8 weight storage: per-tensor symmetric scales for every leaf
    # with >= 2 dims (conv kernels / matmuls); small vectors stay bf16
    def quant(v):
        v = np.asarray(v, np.float32)
        if v.ndim < 2:
            return None
        s = np.abs(v).max() / 127.0 + 1e-12
        return (np.round(v / s).astype(np.int8), np.float32(s))

    q = jax.tree.map(lambda v: quant(v), params,
                     is_leaf=lambda v: hasattr(v, "shape"))

    def dequant_tree(q, p16):
        return jax.tree.map(
            lambda qq, v16: (qq[0].astype(jnp.bfloat16) * qq[1]
                             if qq is not None else v16),
            q, p16, is_leaf=lambda v: v is None or isinstance(v, tuple))

    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.random((8, 256, 256, 3)), jnp.bfloat16)
    rates = jnp.full((8, 256, 256, 1), 1.0, jnp.bfloat16)

    def fwd(p, i, r):
        return jnp.clip(m.apply({"params": p},
                                {"img": i, "denoise_rate": r})["hq"], 0, 1)

    def fwd_q(qp, p16, i, r):
        return fwd(dequant_tree(qp, p16), i, r)

    q_dev = jax.device_put(q)
    report = {"jax": jax.__version__,
              "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
              "shape": "b8 x 256x256 bf16 tiles, 'test' mode"}
    report["bf16_ms_per_dispatch"] = round(
        timed(jax.jit(fwd), (p16, tiles, rates)) * 1e3, 2)
    report["int8_weights_ms_per_dispatch"] = round(
        timed(jax.jit(fwd_q), (q_dev, p16, tiles, rates)) * 1e3, 2)
    report["speedup"] = round(report["bf16_ms_per_dispatch"]
                              / report["int8_weights_ms_per_dispatch"], 4)
    # HBM-size accounting for the ledger
    n_params = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    report["weight_bytes_bf16_MB"] = round(n_params * 2 / 1e6, 1)
    print(json.dumps(report, indent=1))
    with open(os.path.join(OUT_DIR, "weight_streaming.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()

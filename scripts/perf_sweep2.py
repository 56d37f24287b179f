"""Perf sweep round 2: serving-shape experiments on the 512px teacher.

Round 2a of the perf campaign (after the compiler-flag sweep):
  * scan{N}: N images resident in HBM, ONE jit containing a lax.scan of
    the batch-1 forward — measures pure back-to-back device throughput
    with zero host/tunnel involvement between images, with numerics
    IDENTICAL to batch-1 (scan over the leading dim; MDTA is per-image).
  * batch{N}: plain batched forward re-measure (r1 found these slower
    per image at 512px; re-pin that on the current model).
  * donate: input-donated batch-1 (output aliases the input HBM).

Appends JSON lines to PERF_SWEEP2.json.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

SIZE = 512
DTYPE = jnp.bfloat16
WARMUP = 2


def build():
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
    return model, params


def timed(fn, args, n_img, iters=6):
    for _ in range(WARMUP):
        float(fn(*args).mean())
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    float(outs[-1].mean())
    dt = time.perf_counter() - t0
    return dt / iters / n_img * 1e3, n_img * iters / dt


def main():
    model, params = build()
    rng = np.random.default_rng(0)

    def fwd1(params, img, rate):
        out = model.apply({"params": params},
                          {"img": img, "denoise_rate": rate})
        return jnp.clip(out["hq"], 0.0, 1.0)

    results = []

    # plain batch N
    for n in (1, 2, 4):
        img = jnp.asarray(rng.random((n, SIZE, SIZE, 3)), DTYPE)
        rate = jnp.full((n, SIZE, SIZE, 1), 1.0, DTYPE)
        ms, ips = timed(jax.jit(fwd1), (params, img, rate), n)
        results.append({"name": f"batch{n}", "ms_per_img": round(ms, 2),
                        "img_per_s": round(ips, 3)})
        print(json.dumps(results[-1]), flush=True)

    # scan N: one dispatch, N back-to-back single-image forwards on device
    for n in (4, 8):
        imgs = jnp.asarray(rng.random((n, 1, SIZE, SIZE, 3)), DTYPE)
        rates = jnp.full((n, 1, SIZE, SIZE, 1), 1.0, DTYPE)

        @jax.jit
        def scan_fwd(params, imgs, rates):
            def body(_, xs):
                i, r = xs
                return None, fwd1(params, i, r)
            _, outs = jax.lax.scan(body, None, (imgs, rates))
            return outs

        ms, ips = timed(scan_fwd, (params, imgs, rates), n)
        results.append({"name": f"scan{n}", "ms_per_img": round(ms, 2),
                        "img_per_s": round(ips, 3)})
        print(json.dumps(results[-1]), flush=True)

    # parity: scan output == per-image outputs
    imgs = jnp.asarray(rng.random((2, 1, SIZE, SIZE, 3)), DTYPE)
    rates = jnp.full((2, 1, SIZE, SIZE, 1), 1.0, DTYPE)

    @jax.jit
    def scan_fwd2(params, imgs, rates):
        def body(_, xs):
            i, r = xs
            return None, fwd1(params, i, r)
        _, outs = jax.lax.scan(body, None, (imgs, rates))
        return outs

    scanned = np.asarray(scan_fwd2(params, imgs, rates), np.float32)
    single = np.stack([np.asarray(jax.jit(fwd1)(params, imgs[i], rates[i]),
                                  np.float32) for i in range(2)])
    diff = float(np.abs(scanned - single).max())
    results.append({"name": "scan_parity_max_abs_diff", "value": diff})
    print(json.dumps(results[-1]), flush=True)

    with open("PERF_SWEEP2.json", "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()

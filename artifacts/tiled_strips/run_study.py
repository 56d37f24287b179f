"""Strip-tiled serving study (round 5, VERDICT item 2): can a tiled mode
be quality-neutral (<=0.15 dB vs whole-image-vs-golden) at >=1.25x?

Strips halve the seam surface of the 2x2 grid (one seam direction), and
the round-4 table already measured 256x512 strips at 1.29x device-side.
This study measures, same-session interleaved:

  (a) DEVICE throughput at the bench shape (512px synthetic, b8-equiv
      dispatches) for: whole scan8 control, square 2x2x256 halo-0,
      strips 256x512 halo (0,0), strips halo (8,0) [272x512 program],
      strips halo (16,0) [288x512 program];
  (b) QUALITY with the trained teacher on the 10 real MDD frames
      (658x438 -> strip tile (256, 448)) vs whole-image outputs, vs the
      reference goldens, plus trained-ASDQE scores.

Writes /root/repo/artifacts/tiled_strips/study.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import cv2
import numpy as np

import jax
import jax.numpy as jnp

SAMPLE = "/root/reference/Sample/MDD"
OUT_DIR = "/root/repo/artifacts/tiled_strips"


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(10 * np.log10(255.0 ** 2 / mse)) if mse else float("inf")


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    from rethink_acoustic_image_enhancement_tpu.eval.infer import (
        ASDQEScorer,
        TeacherPredictor,
    )
    from rethink_acoustic_image_enhancement_tpu.models import flagship_teacher
    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        load_asdqe_weights,
        load_weights,
    )
    from rethink_acoustic_image_enhancement_tpu.utils.image_io import (
        imread_rgb_ubyte,
    )

    pred = TeacherPredictor(
        params=load_weights("/root/repo/artifacts/kdlaet_full50k/weights/"
                            "net_g_50000_bf16"),
        model=flagship_teacher(static="test"), dtype=jnp.bfloat16)
    report = {"jax": jax.__version__,
              "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())}

    # ================= (a) device throughput, bench shape ==============
    # One uint8 512px image repeated: host prep is identical across
    # modes; timing = dispatch-to-fetch of 8 image-equivalents, min of 3
    # interleaved rounds after warmup (device-side compare only).
    rng = np.random.default_rng(0)
    im512 = (rng.uniform(0, 1, (512, 512, 3)) * 255).astype(np.uint8)
    batch = [im512] * 8

    pred_fused = TeacherPredictor(
        params=pred.params, model=pred.model, dtype=jnp.bfloat16,
        fused=True, fused_resample=True)
    modes = {
        "whole_scan8": lambda: pred.denoise_group(batch, group_size=8),
        "sq256_h0": lambda: pred.denoise_tiled(
            batch, tile=256, halo=0, tile_batch=8),
        "strip256x512_h0": lambda: pred.denoise_tiled(
            batch, tile=(256, 512), halo=(0, 0), tile_batch=8),
        "strip256x512_h8": lambda: pred.denoise_tiled(
            batch, tile=(256, 512), halo=(8, 0), tile_batch=8),
        "strip256x512_h16": lambda: pred.denoise_tiled(
            batch, tile=(256, 512), halo=(16, 0), tile_batch=8),
        # round-5 batched stage megakernel (weights VMEM-resident across
        # the tile batch) + folded resamplers, at both tile geometries
        "sq256_h0_fusedbatched": lambda: pred_fused.denoise_tiled(
            batch, tile=256, halo=0, tile_batch=8),
        "strip256x512_h0_fusedbatched": lambda: pred_fused.denoise_tiled(
            batch, tile=(256, 512), halo=(0, 0), tile_batch=8),
    }
    for name, fn in modes.items():
        t0 = time.perf_counter()
        fn()  # warm/compile
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s", flush=True)
    times = {k: [] for k in modes}
    for _ in range(3):
        for name, fn in modes.items():
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)
    report["bench512_ms_per_img"] = {
        k: round(min(v) / 8 * 1e3, 2) for k, v in times.items()}
    base = report["bench512_ms_per_img"]["whole_scan8"]
    report["bench512_speedup_vs_whole"] = {
        k: round(base / v, 3)
        for k, v in report["bench512_ms_per_img"].items()}
    print("bench512:", report["bench512_ms_per_img"], flush=True)

    # ---- 1024px bucket (VERDICT r4 item 10): whole vs tiled/strips ----
    im1024 = (rng.uniform(0, 1, (1024, 1024, 3)) * 255).astype(np.uint8)
    b1024 = [im1024] * 4
    modes1024 = {
        "whole_scan4": lambda: pred.denoise_group(b1024, group_size=4),
        "sq256_h0": lambda: pred.denoise_tiled(
            b1024, tile=256, halo=0, tile_batch=8),
        "strip256x1024_h0": lambda: pred.denoise_tiled(
            b1024, tile=(256, 1024), halo=(0, 0), tile_batch=4),
    }
    for name, fn in modes1024.items():
        t0 = time.perf_counter()
        fn()
        print(f"warm 1024/{name}: {time.perf_counter() - t0:.1f}s",
              flush=True)
    t1024 = {k: [] for k in modes1024}
    for _ in range(3):
        for name, fn in modes1024.items():
            t0 = time.perf_counter()
            fn()
            t1024[name].append(time.perf_counter() - t0)
    report["bench1024_ms_per_img"] = {
        k: round(min(v) / 4 * 1e3, 2) for k, v in t1024.items()}
    print("bench1024:", report["bench1024_ms_per_img"], flush=True)

    # ================= (b) quality on real MDD frames ==================
    names = sorted(os.listdir(os.path.join(SAMPLE, "origin")))
    imgs = [imread_rgb_ubyte(os.path.join(SAMPLE, "origin", n))
            for n in names]
    goldens = [cv2.cvtColor(cv2.imread(
        os.path.join(SAMPLE, "denoise/KDLAE-T", n)), cv2.COLOR_BGR2RGB)
        for n in names]
    whole = [r["hq"] for r in pred.denoise_group(imgs, group_size=8)]
    report["whole_vs_golden_psnr"] = round(float(np.mean(
        [psnr(w, g) for w, g in zip(whole, goldens)])), 3)

    params, bs = load_asdqe_weights()
    scorer = ASDQEScorer(variables={"params": params, "batch_stats": bs})

    def score_set(outs):
        vals = [float(np.asarray(scorer(i, o)).reshape(()))
                for i, o in zip(imgs, outs)]
        return round(float(np.mean(vals)), 4)

    # frames are 658x438: full-width strips = tile (256, 448)
    quality = {}
    for key, tile, halo in (
            ("sq256_h0", 256, 0),
            ("strip_h0", (256, 448), (0, 0)),
            ("strip_h8", (256, 448), (8, 0)),
            ("strip_h16", (256, 448), (16, 0))):
        outs = [r["hq"] for r in pred.denoise_tiled(
            imgs, tile=tile, halo=halo, tile_batch=8)]
        quality[key] = {
            "vs_whole_psnr": round(float(np.mean(
                [psnr(o, w) for o, w in zip(outs, whole)])), 3),
            "vs_golden_psnr": round(float(np.mean(
                [psnr(o, g) for o, g in zip(outs, goldens)])), 3),
            "asdqe": score_set(outs),
        }
        print(f"{key}: {quality[key]}", flush=True)
    quality["whole"] = {"asdqe": score_set(whole)}
    report["quality_mdd"] = quality

    with open(os.path.join(OUT_DIR, "study.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", os.path.join(OUT_DIR, "study.json"))


if __name__ == "__main__":
    main()

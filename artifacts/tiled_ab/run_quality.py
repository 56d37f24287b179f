"""Tiled-vs-whole serving quality study with the TRAINED teacher (round 4
perf item): 10 Sample/MDD sonar frames, halos {0, 8, 16}, metrics vs the
whole-image output AND vs the reference's released-weights goldens, plus
trained-ASDQE scores and same-session interleaved e2e timings.
Writes /root/repo/artifacts/tiled_ab/ab.json.
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
OUT_DIR = "/root/repo/artifacts/tiled_ab"


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

    names = sorted(os.listdir(os.path.join(SAMPLE, "origin")))
    imgs = [imread_rgb_ubyte(os.path.join(SAMPLE, "origin", n))
            for n in names]
    goldens = [cv2.cvtColor(cv2.imread(
        os.path.join(SAMPLE, "denoise/KDLAE-T", n)), cv2.COLOR_BGR2RGB)
        for n in names]

    report = {"jax": jax.__version__, "n_images": len(imgs),
              "image_shape": list(imgs[0].shape),
              "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())}

    # ---- whole-image control (scan-group serving, the bench mode) ----
    whole = [r["hq"] for r in pred.denoise_group(imgs, group_size=8)]
    report["whole_vs_golden_psnr"] = round(float(np.mean(
        [psnr(w, g) for w, g in zip(whole, goldens)])), 3)

    variants = {}
    for halo in (0, 8, 16):
        outs = [r["hq"] for r in pred.denoise_tiled(
            imgs, tile=256, halo=halo, tile_batch=8)]
        v = {
            "vs_whole_psnr": round(float(np.mean(
                [psnr(o, w) for o, w in zip(outs, whole)])), 3),
            "vs_whole_max_absdiff": int(max(
                np.abs(o.astype(int) - w.astype(int)).max()
                for o, w in zip(outs, whole))),
            "vs_whole_frac_gt2": round(float(np.mean(
                [(np.abs(o.astype(int) - w.astype(int)) > 2).mean()
                 for o, w in zip(outs, whole)])), 6),
            "vs_golden_psnr": round(float(np.mean(
                [psnr(o, g) for o, g in zip(outs, goldens)])), 3),
        }
        variants[f"halo{halo}"] = v
        print(f"halo {halo}: {v}", flush=True)
        if halo == 8:
            for n, o in zip(names, outs):
                cv2.imwrite(os.path.join(
                    OUT_DIR, "tiled_h8_" + n.replace(".jpg", ".png")),
                    cv2.cvtColor(o, cv2.COLOR_RGB2BGR))
    report["tiled"] = variants

    # ---- ASDQE scores (trained scorer): whole vs tiled outputs --------
    params, bs = load_asdqe_weights()
    scorer = ASDQEScorer(variables={"params": params, "batch_stats": bs})
    def score_set(outs):
        vals = [float(np.asarray(scorer(im, o)).reshape(()))
                for im, o in zip(imgs, outs)]
        return round(float(np.mean(vals)), 4)
    report["asdqe_mean_score"] = {
        "whole": score_set(whole),
        "tiled_h0": score_set([r["hq"] for r in pred.denoise_tiled(
            imgs, tile=256, halo=0, tile_batch=8)]),
        "tiled_h8": score_set([r["hq"] for r in pred.denoise_tiled(
            imgs, tile=256, halo=8, tile_batch=8)]),
    }
    print("asdqe:", report["asdqe_mean_score"], flush=True)

    # ---- same-session interleaved e2e timing (host-inclusive) --------
    def t_whole():
        t0 = time.perf_counter()
        pred.denoise_group(imgs, group_size=8)
        return time.perf_counter() - t0

    def t_tiled(h):
        t0 = time.perf_counter()
        pred.denoise_tiled(imgs, tile=256, halo=h, tile_batch=8)
        return time.perf_counter() - t0

    for fn, key in ((t_whole, "whole"), (lambda: t_tiled(0), "tiled_h0"),
                    (lambda: t_tiled(8), "tiled_h8")):
        fn()  # warm
    times = {"whole": [], "tiled_h0": [], "tiled_h8": []}
    for _ in range(3):  # interleaved rounds
        times["whole"].append(t_whole())
        times["tiled_h0"].append(t_tiled(0))
        times["tiled_h8"].append(t_tiled(8))
    report["e2e_ms_per_img"] = {
        k: round(min(v) / len(imgs) * 1e3, 2) for k, v in times.items()}
    print("timing:", report["e2e_ms_per_img"], flush=True)

    with open(os.path.join(OUT_DIR, "ab.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", os.path.join(OUT_DIR, "ab.json"))


if __name__ == "__main__":
    main()

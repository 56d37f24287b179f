"""Quality scoreboard: the in-repo TRAINED models vs the reference's
committed golden fixtures (VERDICT r3 #3).

One regenerable table covering {trained teacher, student, scorer} x
{PSNR, SSIM, ASDQE-stats}:

  * teacher: serve every Sample/MDD origin frame with the 50k-trained
    bf16 teacher (notebook protocol: static='train', denoise_rate 1.0,
    pad-to-8, clamp, fan-beam zero-mask — KDLAE/KDLAE_T.ipynb cell 5)
    and score PSNR/SSIM against the reference's released-weights goldens
    at Sample/MDD/denoise/KDLAE-T/ (ASDQE_test.py:139-149 names them the
    de-facto regression fixtures). The origin-vs-golden row is the
    no-op baseline.
  * student: serve the CAMUS and MDD origin frames as 7-frame stacks
    with the 100k-distilled student (KDLAE-S.ipynb cell 3 protocol) and
    score against Sample/*/denoise/KDLAE-S_prob@0.05/.
  * scorer: the full ASDQE stats protocol (ASDQE_test.py:107-133) with
    the in-repo trained scorer over origin / reference-golden dirs /
    OUR outputs, per dataset.

Writes QUALITY.json at the repo root (tests/test_quality_scoreboard.py
locks the claims) and leaves the served images under --tmp.

    python scripts/quality_scoreboard.py [--out QUALITY.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SAMPLE = "/root/reference/Sample"


def _psnr_ssim(a: np.ndarray, b: np.ndarray) -> tuple[float, float]:
    from rethink_acoustic_image_enhancement_tpu.metrics.psnr_ssim import (
        calculate_psnr,
        calculate_ssim,
    )

    return (float(calculate_psnr(a, b, crop_border=0)),
            float(calculate_ssim(a, b, crop_border=0)))


def teacher_board(tmp: str, weights: str | None = None,
                  out_name: str = "MDD_teacher",
                  denoise_rate: float = 1.0) -> dict:
    import cv2

    from rethink_acoustic_image_enhancement_tpu.eval.infer import (
        TeacherPredictor,
    )
    from rethink_acoustic_image_enhancement_tpu.models import flagship_teacher
    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        load_weights,
    )

    if weights is None:
        weights = os.path.join(REPO, "artifacts/kdlaet_full50k/weights/"
                                     "net_g_50000_bf16")
    import jax.numpy as jnp

    pred = TeacherPredictor(params=load_weights(weights),
                            model=flagship_teacher(static="train"),
                            dtype=jnp.bfloat16)
    out_dir = os.path.join(tmp, out_name)
    os.makedirs(out_dir, exist_ok=True)
    origin = os.path.join(SAMPLE, "MDD/origin")
    golden = os.path.join(SAMPLE, "MDD/denoise/KDLAE-T")
    rows, base_rows = {}, {}
    for name in sorted(os.listdir(origin)):
        t0 = time.time()
        out = pred.denoise_file(os.path.join(origin, name),
                                denoise_rate=denoise_rate)["hq"]
        g = cv2.cvtColor(cv2.imread(os.path.join(golden, name)),
                         cv2.COLOR_BGR2RGB)
        o = cv2.cvtColor(cv2.imread(os.path.join(origin, name)),
                         cv2.COLOR_BGR2RGB)
        cv2.imwrite(os.path.join(out_dir, name.replace(".jpg", ".png")),
                    cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
        p, s = _psnr_ssim(out, g)
        rows[name] = {"psnr": round(p, 3), "ssim": round(s, 5)}
        p0, s0 = _psnr_ssim(o, g)
        base_rows[name] = {"psnr": round(p0, 3), "ssim": round(s0, 5)}
        print(f"[teacher] {name}: psnr {p:.2f} (origin {p0:.2f}) "
              f"ssim {s:.4f} ({s0:.4f})  [{time.time() - t0:.1f}s]",
              flush=True)
    mean = lambda key, rs: round(  # noqa: E731
        float(np.mean([r[key] for r in rs.values()])), 4)
    return {"weights": os.path.relpath(weights, REPO),
            "golden": golden, "out_dir": out_dir, "per_image": rows,
            "mean_psnr": mean("psnr", rows), "mean_ssim": mean("ssim", rows),
            "origin_baseline_mean_psnr": mean("psnr", base_rows),
            "origin_baseline_mean_ssim": mean("ssim", base_rows)}


def student_board(tmp: str, dataset: str) -> dict:
    import cv2

    from rethink_acoustic_image_enhancement_tpu.eval.infer import (
        StudentPredictor,
    )
    from rethink_acoustic_image_enhancement_tpu.models import KDLAEStudent
    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        load_weights,
    )

    # per-domain presets, mirroring the reference's KDLAE-S-US /
    # KDLAE-S-FLS serving split (KDLAE-S.ipynb cell 2): the US student is
    # distilled on CAMUS, the FLS student on the MDD sonar corpus
    weights = os.path.join(REPO,
                           "artifacts/kdlaes_full100k/weights/net_g_100000")
    if dataset == "MDD":
        fls = os.path.join(REPO,
                           "artifacts/kdlaes_flsft5k/weights/net_g_5000")
        if os.path.isdir(fls):
            weights = fls
    pred = StudentPredictor(
        params=load_weights(weights),
        model=KDLAEStudent(residual=True, hidden_channels=(16, 32, 64)))
    origin = os.path.join(SAMPLE, dataset, "origin")
    golden = os.path.join(SAMPLE, dataset, "denoise/KDLAE-S_prob@0.05")
    names = sorted(os.listdir(origin))
    frames = pred.denoise_all_frames(origin)
    out_dir = os.path.join(tmp, f"{dataset}_student")
    os.makedirs(out_dir, exist_ok=True)
    rows, base_rows = {}, {}
    for i, name in enumerate(names):
        g = cv2.imread(os.path.join(golden, name), 0)
        o = cv2.imread(os.path.join(origin, name), 0)
        ours = frames[i]
        if ours.shape != g.shape:  # stack loader resizes to first frame
            ours = cv2.resize(ours, (g.shape[1], g.shape[0]),
                              interpolation=cv2.INTER_LINEAR)
        cv2.imwrite(os.path.join(out_dir,
                                 os.path.splitext(name)[0] + ".png"), ours)
        p, s = _psnr_ssim(ours[..., None], g[..., None])
        rows[name] = {"psnr": round(p, 3), "ssim": round(s, 5)}
        if o.shape != g.shape:
            o = cv2.resize(o, (g.shape[1], g.shape[0]))
        p0, s0 = _psnr_ssim(o[..., None], g[..., None])
        base_rows[name] = {"psnr": round(p0, 3), "ssim": round(s0, 5)}
    mean = lambda key, rs: round(  # noqa: E731
        float(np.mean([r[key] for r in rs.values()])), 4)
    print(f"[student/{dataset}] mean psnr {mean('psnr', rows):.2f} "
          f"(origin {mean('psnr', base_rows):.2f}) "
          f"ssim {mean('ssim', rows):.4f}", flush=True)
    return {"weights": os.path.relpath(weights, REPO), "golden": golden,
            "out_dir": out_dir, "per_image": rows,
            "mean_psnr": mean("psnr", rows), "mean_ssim": mean("ssim", rows),
            "origin_baseline_mean_psnr": mean("psnr", base_rows),
            "origin_baseline_mean_ssim": mean("ssim", base_rows)}


def asdqe_board(tmp: str, teacher_out: str, student_outs: dict,
                extra_mdd_methods: dict | None = None) -> dict:
    from rethink_acoustic_image_enhancement_tpu.eval.asdqe_eval import (
        run_asdqe_eval,
    )
    from rethink_acoustic_image_enhancement_tpu.eval.infer import ASDQEScorer
    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        load_asdqe_weights,
    )

    params, batch_stats = load_asdqe_weights()
    scorer = ASDQEScorer(variables={"params": params,
                                    "batch_stats": batch_stats})
    boards = {}
    for dataset in ("MDD", "CAMUS"):
        origin = os.path.join(SAMPLE, dataset, "origin")
        methods = {
            "origin": origin,
            "ref_KDLAE-T": os.path.join(SAMPLE, dataset, "denoise/KDLAE-T"),
            "ref_KDLAE-S": os.path.join(SAMPLE, dataset,
                                        "denoise/KDLAE-S_prob@0.05"),
            "ours_student": student_outs[dataset],
        }
        if dataset == "MDD":
            methods["ours_teacher"] = teacher_out
            methods.update(extra_mdd_methods or {})
        csv = os.path.join(tmp, f"stats_{dataset}.csv")
        boards[dataset] = run_asdqe_eval(scorer, origin, methods,
                                         csv_path=csv, verbose=True)
    return boards


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "QUALITY.json"))
    ap.add_argument("--tmp", default="/tmp/quality_out")
    args = ap.parse_args()
    os.makedirs(args.tmp, exist_ok=True)

    import jax

    board = {"generated": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
             "platform": jax.devices()[0].platform,
             "protocol": {
                 "teacher": "KDLAE_T.ipynb cell 5 (rate 1.0, zero-mask) vs "
                            "Sample/MDD/denoise/KDLAE-T",
                 "student": "KDLAE-S.ipynb cell 3 (7-frame stacks) vs "
                            "Sample/*/denoise/KDLAE-S_prob@0.05",
                 "asdqe": "ASDQE_test.py:107-133 stats with the in-repo "
                          "trained scorer"}}
    board["teacher_mdd"] = teacher_board(args.tmp)
    # L2-Dice teacher variant (reference README.md:107 KDLAE_T_L2Dice.pth;
    # served at denoise_rate 0.6 per KDLAE_T.ipynb cell 5 commentary).
    # PSNR context row at rate 1.0 vs the L1-Shadow-teacher goldens; the
    # 0.6 preset gets its own ASDQE stats column below.
    l2dice = os.path.join(REPO, "artifacts/kdlaet_l2dice50k/weights/"
                                "net_g_50000_bf16")
    extra_methods = {}
    if os.path.isdir(l2dice):
        board["teacher_mdd_l2dice"] = teacher_board(
            args.tmp, weights=l2dice, out_name="MDD_teacher_l2dice")
        board["teacher_mdd_l2dice_rate06"] = teacher_board(
            args.tmp, weights=l2dice, out_name="MDD_teacher_l2dice_rate06",
            denoise_rate=0.6)
        extra_methods = {
            "ours_teacher_l2dice":
                board["teacher_mdd_l2dice"]["out_dir"],
            "ours_teacher_l2dice_rate06":
                board["teacher_mdd_l2dice_rate06"]["out_dir"]}
    board["student_camus"] = student_board(args.tmp, "CAMUS")
    board["student_mdd"] = student_board(args.tmp, "MDD")
    board["asdqe_stats"] = asdqe_board(
        args.tmp, board["teacher_mdd"]["out_dir"],
        {"CAMUS": board["student_camus"]["out_dir"],
         "MDD": board["student_mdd"]["out_dir"]},
        extra_mdd_methods=extra_methods)
    with open(args.out, "w") as f:
        json.dump(board, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

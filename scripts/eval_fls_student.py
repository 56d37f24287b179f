"""Score an FLS (sonar) student checkpoint on the Sample/MDD protocol.

Serves every Sample/MDD origin frame with
``StudentPredictor.denoise_all_frames`` (the KDLAE-S.ipynb cell-3
protocol: consecutive 7-frame stacks, pad-to-32, clamp — see
eval/infer.py) and reports PSNR/SSIM against

  * the reference's committed ``denoise/KDLAE-S_prob@0.05`` goldens
    (the QUALITY.json student_mdd protocol), and
  * our own teacher's outputs (the student's distillation TARGETS) —
    the distillation-fidelity number that separates "training gap"
    from "target gap": targets-vs-goldens is ~34.7 dB, so any
    student-vs-golden shortfall beyond that is trainable headroom.

    python scripts/eval_fls_student.py <weights_dir> [<weights_dir> ...]
        [--teacher-out /tmp/quality_out/MDD_teacher] [--json OUT]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SAMPLE = "/root/reference/Sample/MDD"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("weights", nargs="+")
    ap.add_argument("--teacher-out", default="/tmp/quality_out/MDD_teacher")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import cv2

    from rethink_acoustic_image_enhancement_tpu.eval.infer import (
        StudentPredictor,
    )
    from rethink_acoustic_image_enhancement_tpu.metrics.psnr_ssim import (
        calculate_psnr,
        calculate_ssim,
    )
    from rethink_acoustic_image_enhancement_tpu.models import KDLAEStudent
    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        load_weights,
    )

    origin = os.path.join(SAMPLE, "origin")
    golden = os.path.join(SAMPLE, "denoise/KDLAE-S_prob@0.05")
    names = sorted(os.listdir(origin))

    def score(ours: np.ndarray, ref_dir: str, name: str,
              ext: str | None = None) -> tuple[float, float]:
        rn = os.path.splitext(name)[0] + ext if ext else name
        ref = cv2.imread(os.path.join(ref_dir, rn), 0)
        if ref is None:
            return float("nan"), float("nan")
        if ours.shape != ref.shape:
            ours = cv2.resize(ours, (ref.shape[1], ref.shape[0]),
                              interpolation=cv2.INTER_LINEAR)
        return (float(calculate_psnr(ours[..., None], ref[..., None],
                                     crop_border=0)),
                float(calculate_ssim(ours[..., None], ref[..., None],
                                     crop_border=0)))

    results = {}
    for wdir in args.weights:
        pred = StudentPredictor(
            params=load_weights(wdir),
            model=KDLAEStudent(residual=True, hidden_channels=(16, 32, 64)))
        frames = pred.denoise_all_frames(origin)
        vs_g, vs_t = [], []
        for i, name in enumerate(names):
            vs_g.append(score(frames[i], golden, name))
            if os.path.isdir(args.teacher_out):
                vs_t.append(score(frames[i], args.teacher_out, name,
                                  ext=".png"))
        row = {
            "vs_golden_psnr": round(float(np.mean([p for p, _ in vs_g])), 4),
            "vs_golden_ssim": round(float(np.mean([s for _, s in vs_g])), 4),
        }
        if vs_t:
            row["vs_teacher_psnr"] = round(
                float(np.mean([p for p, _ in vs_t])), 4)
            row["vs_teacher_ssim"] = round(
                float(np.mean([s for _, s in vs_t])), 4)
        results[wdir] = row
        print(f"{wdir}: {row}", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

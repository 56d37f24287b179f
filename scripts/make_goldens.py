"""Regenerate the shipped golden outputs of the in-repo trained weights.

The reference ships `Sample/{MDD,CAMUS}/denoise/*` goldens produced by its
released checkpoints (ASDQE/ASDQE_test.py:139-149); with zero egress those
checkpoints are unreachable, so the rebuild ships its OWN trained weights
(artifacts/kdlaes_full100k/weights — the completed 100k-iteration
distillation run) and goldens produced from them. Run on CPU fp32 with
matmul precision pinned (the tests/conftest.py settings) so the outputs
are reproducible byte-for-byte on the test platform:

    python scripts/make_goldens.py

Writes artifacts/kdlaes_full100k/goldens/camus_XX.png; the regression test
is tests/test_trained_goldens.py.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS = os.path.join(REPO, "artifacts/kdlaes_full100k/weights/net_g_100000")
OUT = os.path.join(REPO, "artifacts/kdlaes_full100k/goldens")
FRAMES = "/root/reference/Sample/CAMUS/origin"


T_WEIGHTS = os.path.join(
    REPO, "artifacts/kdlaet_full50k/weights/net_g_50000_bf16")
T_OUT = os.path.join(REPO, "artifacts/kdlaet_full50k/goldens")


def make_teacher_goldens() -> None:
    """MDD crop goldens of the shipped 50k-trained teacher (fp32 quality
    path — crop-sized because a full-frame fp32 teacher forward takes
    minutes on the CPU test platform)."""
    import cv2

    from rethink_acoustic_image_enhancement_tpu.eval.infer import (
        TeacherPredictor,
    )
    from rethink_acoustic_image_enhancement_tpu.models import (
        flagship_teacher,
    )
    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        load_weights,
    )

    pred = TeacherPredictor(params=load_weights(T_WEIGHTS),
                            model=flagship_teacher(static="train"))
    img = cv2.imread("/root/reference/Sample/MDD/origin/0001_sort.jpg")
    crop = cv2.cvtColor(img[100:196, 200:328], cv2.COLOR_BGR2RGB)
    out = pred(crop, denoise_rate=1.0, zero_mask=False)
    os.makedirs(T_OUT, exist_ok=True)
    for key in ("hq", "sr"):
        cv2.imwrite(os.path.join(T_OUT, f"mdd_crop_{key}.png"),
                    cv2.cvtColor(out[key], cv2.COLOR_RGB2BGR))
    print(f"wrote teacher crop goldens to {T_OUT}")


L2D_WEIGHTS = os.path.join(
    REPO, "artifacts/kdlaet_l2dice50k/weights/net_g_50000_bf16")
L2D_OUT = os.path.join(REPO, "artifacts/kdlaet_l2dice50k/goldens")


def make_l2dice_goldens() -> None:
    """MDD crop goldens of the L2-Dice teacher variant (the reference's
    released KDLAE_T_L2Dice.pth, README.md:107) at both rate 1.0 and the
    notebook's 0.6 serving preset (KDLAE_T.ipynb cell 5 commentary)."""
    import cv2

    from rethink_acoustic_image_enhancement_tpu.eval.infer import (
        TeacherPredictor,
    )
    from rethink_acoustic_image_enhancement_tpu.models import (
        flagship_teacher,
    )
    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        load_weights,
    )

    pred = TeacherPredictor(params=load_weights(L2D_WEIGHTS),
                            model=flagship_teacher(static="train"))
    img = cv2.imread("/root/reference/Sample/MDD/origin/0001_sort.jpg")
    crop = cv2.cvtColor(img[100:196, 200:328], cv2.COLOR_BGR2RGB)
    os.makedirs(L2D_OUT, exist_ok=True)
    for rate, tag in ((1.0, "r10"), (0.6, "r06")):
        out = pred(crop, denoise_rate=rate, zero_mask=False)
        for key in ("hq", "sr"):
            cv2.imwrite(os.path.join(L2D_OUT, f"mdd_crop_{tag}_{key}.png"),
                        cv2.cvtColor(out[key], cv2.COLOR_RGB2BGR))
    print(f"wrote L2-Dice teacher crop goldens to {L2D_OUT}")


FLS_WEIGHTS = os.path.join(
    REPO, "artifacts/kdlaes_flsft5k/weights/net_g_5000")
FLS_OUT = os.path.join(REPO, "artifacts/kdlaes_flsft5k/goldens")
FLS_FRAMES = "/root/reference/Sample/MDD/origin"


def make_fls_goldens() -> None:
    """MDD (sonar) goldens of the FLS student — the reference ships
    separate KDLAE-S-FLS weights for sonar (KDLAE-S.ipynb cell 2
    presets); this is the rebuild's analog, distilled on the MDD
    corpus."""
    import cv2

    from rethink_acoustic_image_enhancement_tpu.eval.infer import (
        StudentPredictor,
    )
    from rethink_acoustic_image_enhancement_tpu.models import KDLAEStudent
    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        load_weights,
    )

    pred = StudentPredictor(
        params=load_weights(FLS_WEIGHTS),
        model=KDLAEStudent(residual=True, hidden_channels=(16, 32, 64)))
    out = pred.denoise_folder(FLS_FRAMES, start=0)
    os.makedirs(FLS_OUT, exist_ok=True)
    for i in range(out.shape[0]):
        cv2.imwrite(os.path.join(FLS_OUT, f"mdd_{i:02d}.png"), out[i])
    print(f"wrote {out.shape[0]} FLS goldens to {FLS_OUT}")


def main() -> None:
    import cv2

    from rethink_acoustic_image_enhancement_tpu.eval.infer import (
        StudentPredictor,
    )
    from rethink_acoustic_image_enhancement_tpu.models import KDLAEStudent
    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        load_weights,
    )

    params = load_weights(WEIGHTS)
    pred = StudentPredictor(
        params=params,
        model=KDLAEStudent(residual=True, hidden_channels=(16, 32, 64)))
    out = pred.denoise_folder(FRAMES, start=0)
    os.makedirs(OUT, exist_ok=True)
    for i in range(out.shape[0]):
        cv2.imwrite(os.path.join(OUT, f"camus_{i:02d}.png"), out[i])
    print(f"wrote {out.shape[0]} goldens to {OUT}")
    if os.path.isdir(T_WEIGHTS):
        make_teacher_goldens()
    if os.path.isdir(L2D_WEIGHTS):
        make_l2dice_goldens()
    if os.path.isdir(FLS_WEIGHTS):
        make_fls_goldens()


if __name__ == "__main__":
    main()

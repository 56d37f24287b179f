"""Regression against the in-repo TRAINED weights and their goldens.

The reference's de-facto regression fixtures are Sample/*/denoise goldens
produced by its released checkpoints (ASDQE/ASDQE_test.py:139-149). Those
checkpoints are unreachable offline, so the rebuild ships its own: the
completed 100k-iteration KDLAE-S distillation run's final weights
(artifacts/kdlaes_full100k/weights) plus goldens regenerable with
scripts/make_goldens.py. Two claims are locked in:

  * serving the trained weights reproduces the shipped goldens (drift in
    model/serving code shows up here), and
  * the from-scratch distillation actually learned the reference
    pipeline: >= 30 dB PSNR against the reference's OWN released-weights
    KDLAE-T goldens on CAMUS (raw input scores ~18.6 dB).
"""

import os

import numpy as np
import pytest

from tests.conftest import requires_reference

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS = os.path.join(REPO, "artifacts/kdlaes_full100k/weights/net_g_100000")
GOLDENS = os.path.join(REPO, "artifacts/kdlaes_full100k/goldens")

requires_weights = pytest.mark.skipif(
    not os.path.isdir(WEIGHTS), reason="trained weights not in repo")


@pytest.fixture(scope="module")
def student_outputs():
    from rethink_acoustic_image_enhancement_tpu.eval.infer import (
        StudentPredictor,
    )
    from rethink_acoustic_image_enhancement_tpu.models import KDLAEStudent
    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        load_weights,
    )

    pred = StudentPredictor(
        params=load_weights(WEIGHTS),
        model=KDLAEStudent(residual=True, hidden_channels=(16, 32, 64)))
    return pred.denoise_folder(
        "/root/reference/Sample/CAMUS/origin", start=0)


TEACHER_WEIGHTS = os.path.join(
    REPO, "artifacts/kdlaet_full50k/weights/net_g_50000_bf16")
TEACHER_GOLDENS = os.path.join(REPO, "artifacts/kdlaet_full50k/goldens")


@requires_reference
@pytest.mark.skipif(
    not (os.path.isdir(TEACHER_WEIGHTS)
         and os.environ.get("RAIE_SLOW_GOLDENS")),
    reason="teacher golden forward takes ~3 min on CPU; set "
           "RAIE_SLOW_GOLDENS=1 (regenerate via the snippet in "
           "artifacts/kdlaet_full50k/goldens)")
def test_trained_teacher_matches_shipped_goldens():
    """The shipped 50k-trained teacher (bf16) serves the committed MDD
    crop goldens: hq/sr reproduce to <=1 level, and hq scores >=30 dB
    against the reference's released-weights golden for the same crop
    (raw input: 15.5 dB) — the rebuilt teacher training pipeline
    converges to the reference pipeline's behavior."""
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

    pred = TeacherPredictor(params=load_weights(TEACHER_WEIGHTS),
                            model=flagship_teacher(static="train"))
    img = cv2.imread("/root/reference/Sample/MDD/origin/0001_sort.jpg")
    crop = cv2.cvtColor(img[100:196, 200:328], cv2.COLOR_BGR2RGB)
    out = pred(crop, denoise_rate=1.0, zero_mask=False)
    for key in ("hq", "sr"):
        golden = cv2.cvtColor(
            cv2.imread(os.path.join(TEACHER_GOLDENS, f"mdd_crop_{key}.png")),
            cv2.COLOR_BGR2RGB)
        diff = np.abs(out[key].astype(np.int16) - golden.astype(np.int16))
        assert diff.max() <= 1 and (diff == 0).mean() > 0.999, key

    ref = cv2.imread("/root/reference/Sample/MDD/denoise/KDLAE-T/"
                     "0001_sort.jpg", 0)[100:196, 200:328].astype(np.float64)
    ours = cv2.cvtColor(out["hq"], cv2.COLOR_RGB2GRAY).astype(np.float64)
    psnr = 10 * np.log10(255.0 ** 2 / np.mean((ours - ref) ** 2))
    assert psnr >= 30.0, psnr


@requires_reference
@requires_weights
def test_trained_student_matches_shipped_goldens(student_outputs):
    import cv2

    for i in range(student_outputs.shape[0]):
        golden = cv2.imread(os.path.join(GOLDENS, f"camus_{i:02d}.png"), 0)
        assert golden is not None
        diff = np.abs(student_outputs[i].astype(np.int16)
                      - golden.astype(np.int16))
        # byte-exact on the generating platform; allow 1 quantization
        # level on rare pixels for XLA-CPU version drift
        assert diff.max() <= 1, f"frame {i}: max diff {diff.max()}"
        assert (diff == 0).mean() > 0.999, f"frame {i}"


@requires_reference
@requires_weights
def test_trained_student_matches_reference_released_goldens(student_outputs):
    """The distilled student vs the goldens the REFERENCE produced with
    its released KDLAE-T weights — proof the rebuilt training pipeline
    converges to the reference pipeline's behavior on real sonar data."""
    import cv2

    ref_dir = "/root/reference/Sample/CAMUS/denoise/KDLAE-T"
    names = sorted(os.listdir(ref_dir))[: student_outputs.shape[0]]
    psnrs = []
    for i, name in enumerate(names):
        ref = cv2.imread(os.path.join(ref_dir, name), 0).astype(np.float64)
        ours = student_outputs[i].astype(np.float64)
        mse = np.mean((ours - ref) ** 2)
        psnrs.append(10 * np.log10(255.0 ** 2 / mse))
    assert float(np.mean(psnrs)) >= 30.0, psnrs


FLS_WEIGHTS = os.path.join(REPO,
                           "artifacts/kdlaes_flsft5k/weights/net_g_5000")
FLS_GOLDENS = os.path.join(REPO, "artifacts/kdlaes_flsft5k/goldens")


@requires_reference
@pytest.mark.skipif(not os.path.isdir(FLS_WEIGHTS),
                    reason="FLS student weights not in repo")
def test_trained_fls_student_matches_shipped_goldens():
    """The FLS (sonar) student — distilled on the MDD corpus, the
    rebuild's analog of the reference's KDLAE-S-FLS preset
    (KDLAE-S.ipynb cell 2) — reproduces its committed MDD goldens and
    beats the origin baseline against the reference's released-weights
    KDLAE-T goldens."""
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
    outs = pred.denoise_folder("/root/reference/Sample/MDD/origin", start=0)
    ref_dir = "/root/reference/Sample/MDD/denoise/KDLAE-T"
    names = sorted(os.listdir(ref_dir))
    psnrs, base = [], []
    for i in range(outs.shape[0]):
        golden = cv2.imread(os.path.join(FLS_GOLDENS, f"mdd_{i:02d}.png"), 0)
        assert golden is not None
        diff = np.abs(outs[i].astype(np.int16) - golden.astype(np.int16))
        assert diff.max() <= 1 and (diff == 0).mean() > 0.999, f"frame {i}"
        ref = cv2.imread(os.path.join(ref_dir, names[i]), 0)
        org = cv2.imread(os.path.join(
            "/root/reference/Sample/MDD/origin", names[i]), 0)
        mse = np.mean((outs[i].astype(np.float64) - ref) ** 2)
        psnrs.append(10 * np.log10(255.0 ** 2 / mse))
        mse0 = np.mean((org.astype(np.float64) - ref) ** 2)
        base.append(10 * np.log10(255.0 ** 2 / mse0))
    assert float(np.mean(psnrs)) >= float(np.mean(base)) + 5.0, (psnrs, base)


# ------------------------------------------------------------- ASDQE --
ASDQE_WEIGHTS = os.path.join(REPO, "artifacts/asdqe_full50ep/weights/net_g_best")
ASDQE_GOLDENS = os.path.join(REPO, "artifacts/asdqe_full50ep/goldens.json")

requires_asdqe_weights = pytest.mark.skipif(
    not os.path.isdir(ASDQE_WEIGHTS), reason="trained scorer not in repo")


@requires_asdqe_weights
@requires_reference
def test_trained_asdqe_scorer_recovers_denoise_rate():
    """The shipped 50-epoch-trained ASDQE scorer (the full reference
    Train/ASDQE.py budget, driven on-chip — artifacts/asdqe_full50ep/)
    must (a) reproduce its committed golden scores and (b) actually work
    as a quality metric: on unseen-center-crop graded candidates
    (lambda-mixes of origin and reference KDLAE-T golden), scores are
    monotonic in lambda and recover it to ~0.05."""
    import json

    import cv2

    from rethink_acoustic_image_enhancement_tpu.eval.infer import ASDQEScorer
    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        load_asdqe_weights,
    )

    params, batch_stats = load_asdqe_weights(ASDQE_WEIGHTS)
    scorer = ASDQEScorer(variables={
        "params": params, "batch_stats": batch_stats})
    fixture = json.load(open(ASDQE_GOLDENS))
    lams = fixture["lambdas"]

    for name, golden_row in fixture["scores"].items():
        dset, base = name.split("_", 1)
        lq = cv2.imread(
            f"/root/reference/Sample/{dset}/origin/{base}.jpg")
        if lq is None:
            lq = cv2.imread(
                f"/root/reference/Sample/{dset}/origin/{base}.png")
        dn = cv2.imread(
            f"/root/reference/Sample/{dset}/denoise/KDLAE-T/{base}.png")
        if dn is None:
            dn = cv2.imread(
                f"/root/reference/Sample/{dset}/denoise/KDLAE-T/{base}.jpg")
        assert lq is not None and dn is not None, name
        if dn.shape != lq.shape:
            dn = cv2.resize(dn, (lq.shape[1], lq.shape[0]),
                            interpolation=cv2.INTER_CUBIC)
        # BGR -> RGB uint8, center 512 crop (the golden-generation recipe)
        lq = lq[..., ::-1].astype(np.float32)
        dn = dn[..., ::-1].astype(np.float32)
        h, wdt = lq.shape[:2]
        t, l = max(0, (h - 512) // 2), max(0, (wdt - 512) // 2)
        lq_c, dn_c = lq[t:t + 512, l:l + 512], dn[t:t + 512, l:l + 512]
        scores = []
        for lam in lams:
            cand = np.rint(lam * dn_c + (1 - lam) * lq_c).astype(np.uint8)
            scores.append(float(np.asarray(
                scorer(lq_c.astype(np.uint8), cand)).reshape(-1)[0]))
        assert np.allclose(scores, golden_row, atol=2e-3), (name, scores)
        assert all(b > a for a, b in zip(scores, scores[1:])), (name, scores)
        assert np.max(np.abs(np.asarray(scores) - np.asarray(lams))) < 0.08


L2D_WEIGHTS = os.path.join(
    REPO, "artifacts/kdlaet_l2dice50k/weights/net_g_50000_bf16")
L2D_GOLDENS = os.path.join(REPO, "artifacts/kdlaet_l2dice50k/goldens")


@requires_reference
@pytest.mark.skipif(
    not (os.path.isdir(L2D_WEIGHTS)
         and os.environ.get("RAIE_SLOW_GOLDENS")),
    reason="L2-Dice teacher golden forward takes minutes on CPU; set "
           "RAIE_SLOW_GOLDENS=1 (regenerate via scripts/make_goldens.py)")
def test_trained_l2dice_teacher_matches_shipped_goldens():
    """The L2-Dice teacher variant (reference README.md:107
    KDLAE_T_L2Dice.pth analog; fine-tuned with losses/pixel.py:l2_dice
    on the full 50k reference curriculum) reproduces its committed crop
    goldens at BOTH serving rates, and the denoise_rate conditioning is
    live (rate 0.6 output differs from rate 1.0)."""
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
    outs = {}
    for rate, tag in ((1.0, "r10"), (0.6, "r06")):
        out = pred(crop, denoise_rate=rate, zero_mask=False)
        outs[tag] = out
        for key in ("hq", "sr"):
            golden = cv2.cvtColor(cv2.imread(os.path.join(
                L2D_GOLDENS, f"mdd_crop_{tag}_{key}.png")),
                cv2.COLOR_BGR2RGB)
            diff = np.abs(out[key].astype(np.int16)
                          - golden.astype(np.int16))
            assert diff.max() <= 1 and (diff == 0).mean() > 0.999, (tag, key)
    assert np.abs(outs["r10"]["hq"].astype(np.int16)
                  - outs["r06"]["hq"].astype(np.int16)).max() > 1

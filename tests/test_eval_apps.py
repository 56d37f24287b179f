"""End-to-end inference/eval apps on the reference's Sample fixtures.

Weights are seeded-random (the repo ships none), converted from a torch
reference model — so besides exercising the full serving path on real
sonar/ultrasound images, the ASDQE protocol test is a genuine
numbers-parity check against the reference's own scoring pipeline.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.convert.torch_import import (
    convert_asdqe,
)
from rethink_acoustic_image_enhancement_tpu.eval.asdqe_eval import (
    calculate_statistics,
    default_methods,
    paired_files,
    write_stats_csv,
)
from rethink_acoustic_image_enhancement_tpu.eval.infer import (
    ASDQEScorer,
    StudentPredictor,
    TeacherPredictor,
)
from rethink_acoustic_image_enhancement_tpu.models import (
    DenoiseRatePredictor,
    KDLAEStudent,
    KDLAETeacher,
)
from rethink_acoustic_image_enhancement_tpu.utils.image_io import (
    imread_gray,
    imread_rgb,
    list_images,
)
from tests.conftest import REFERENCE_ROOT, requires_reference

SAMPLE = os.path.join(REFERENCE_ROOT, "Sample")


def _small_teacher():
    """Tiny-config teacher for CPU-speed e2e tests."""
    model = KDLAETeacher(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
                         heads=(1, 2, 4, 8), layernorm_type="BiasFree",
                         static="train", params="cat")
    params = model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 16, 16, 3)), "denoise_rate": jnp.zeros((1, 16, 16, 1))},
    )["params"]
    return model, params


@requires_reference
def test_teacher_predictor_on_sample_sonar():
    model, params = _small_teacher()
    pred = TeacherPredictor(params=params, model=model)
    path = list_images(os.path.join(SAMPLE, "MDD", "origin"))[0]
    img = imread_rgb(path)[:96, :120]  # crop for speed; odd size on purpose
    out = pred(img, denoise_rate=1.0)
    assert out["hq"].shape == img.shape and out["hq"].dtype == np.uint8
    assert out["sr"].shape == (2 * img.shape[0], 2 * img.shape[1], 3)
    # fan-beam zero-mask: input zero pixels stay zero in the output
    zero = (img == 0).all(axis=-1)
    if zero.any():
        assert (out["hq"][zero] == 0).all()


@requires_reference
def test_student_predictor_on_sample_ultrasound():
    model = KDLAEStudent(residual=True, hidden_channels=(16, 32, 64))
    stack = np.stack([imread_gray(p)[:80, :100] for p in
                      list_images(os.path.join(SAMPLE, "CAMUS", "origin"))[:7]])
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 7, 32, 32)))["params"]
    pred = StudentPredictor(params=params, model=model)
    out = pred(stack)
    assert out.shape == stack.shape and out.dtype == np.uint8


def test_student_denoise_all_frames_covers_folder(tmp_path):
    """denoise_all_frames: every frame served exactly once via
    consecutive stacks with an overlapping tail; frames covered by one
    stack match the corresponding denoise_folder outputs exactly."""
    import cv2

    model = KDLAEStudent(residual=True, hidden_channels=(16, 32, 64))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 16, 16)))["params"]
    pred = StudentPredictor(params=params, model=model, num_frames=3,
                            multiple_of=4)
    folder = tmp_path / "frames"
    os.makedirs(folder)
    rng = np.random.default_rng(0)
    for i in range(8):  # 8 frames, num_frames 3 -> stacks at 0, 3, 5
        cv2.imwrite(str(folder / f"{i:02d}.png"),
                    (rng.uniform(0, 1, (20, 24)) * 255).astype(np.uint8))
    out = pred.denoise_all_frames(str(folder))
    assert out.shape == (8, 20, 24) and out.dtype == np.uint8
    np.testing.assert_array_equal(
        out[:3], pred.denoise_folder(str(folder), start=0))
    np.testing.assert_array_equal(
        out[3:6], pred.denoise_folder(str(folder), start=3))
    # tail stack covers frames 5..7; frames 6,7 come from it
    np.testing.assert_array_equal(
        out[6:], pred.denoise_folder(str(folder), start=5)[1:])


@requires_reference
def test_asdqe_protocol_parity_on_sample(torch_asdqe_module, tmp_path):
    """Full protocol vs the reference scoring run with the same (random)
    weights on Sample/MDD: per-method statistics must agree."""
    import torch

    torch.manual_seed(0)
    ref = torch_asdqe_module.DenoiseRatePredictor().eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, batch_stats = convert_asdqe(sd)
    scorer = ASDQEScorer(variables={
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, batch_stats),
    })

    base, methods = default_methods(SAMPLE, "MDD")
    # limit to two methods and downscaled crops for CPU speed
    methods = {k: methods[k] for k in ["origin", "Teacher"]}

    crop = 160
    all_stats = {}
    ref_stats = {}
    for name, mdir in methods.items():
        ours, theirs = [], []
        for lq_path, gt_path in paired_files(base, mdir):
            lq = imread_rgb(lq_path)[:crop, :crop]
            gt = imread_rgb(gt_path)[:crop, :crop]
            ours.append(scorer(lq, gt)[0])
            with torch.no_grad():
                t = ref(torch.from_numpy(lq.transpose(2, 0, 1)[None]),
                        torch.from_numpy(gt.transpose(2, 0, 1)[None]))
            theirs.append(float(t))
        all_stats[name] = calculate_statistics(np.asarray(ours))
        ref_stats[name] = calculate_statistics(np.asarray(theirs))

    for name in methods:
        for key, val in all_stats[name].items():
            assert abs(val - ref_stats[name][key]) < 1e-5, (name, key)

    csv_path = tmp_path / "stats_transposed.csv"
    write_stats_csv(all_stats, str(csv_path))
    lines = csv_path.read_text().strip().splitlines()
    assert lines[0].split(",")[1:] == list(methods)
    assert len(lines) == 8  # header + 7 stats


def test_stats_csv_format(tmp_path):
    stats = {"origin": calculate_statistics(np.asarray([0.1, 0.2, 0.3]))}
    p = tmp_path / "s.csv"
    write_stats_csv(stats, str(p))
    rows = p.read_text().strip().splitlines()
    assert rows[1].startswith("mean,0.200000")


def test_denoise_group_matches_per_image_including_tail():
    """Scan serving groups are bit-identical to per-image calls, and a
    short tail chunk routes through the per-image path (no scan retrace)."""
    model, params = _small_teacher()
    pred = TeacherPredictor(params=params, model=model)
    rng = np.random.default_rng(0)
    imgs = [rng.random((24, 32, 3)).astype(np.float32) for _ in range(5)]

    grouped = pred.denoise_group(imgs, denoise_rate=0.8, zero_mask=False,
                                 group_size=4)  # 4 via scan + 1 tail
    singles = [pred(im, denoise_rate=0.8, zero_mask=False) for im in imgs]
    assert len(grouped) == 5
    for g, s in zip(grouped, singles):
        np.testing.assert_array_equal(g["hq"], s["hq"])
        np.testing.assert_array_equal(g["sr"], s["sr"])

    # mixed shapes: whole list falls back to per-image calls
    mixed = [imgs[0], rng.random((32, 24, 3)).astype(np.float32)]
    outs = pred.denoise_group(mixed, zero_mask=False)
    assert [o["hq"].shape for o in outs] == [im.shape for im in mixed]


def test_student_denoise_batch_matches_single():
    """Batched student serving is exact: per-stack results equal batch-1
    calls (no cross-image coupling in the 3D-conv U-Net)."""
    model = KDLAEStudent(residual=True, hidden_channels=(4, 8))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 32, 32)))["params"]
    pred = StudentPredictor(params=params, model=model, multiple_of=4,
                            num_frames=3)
    rng = np.random.default_rng(0)
    stacks = rng.random((3, 3, 20, 24)).astype(np.float32)
    batched = pred.denoise_batch(stacks)
    assert batched.shape == stacks.shape and batched.dtype == np.uint8
    for i in range(3):
        np.testing.assert_array_equal(batched[i], pred(stacks[i]))


def test_denoise_group_bucketed_mixed_shapes():
    """With shape_bucket set, mixed-size images sharing a bucketed padded
    size scan together and match the bucketed per-image path exactly."""
    model, params = _small_teacher()
    pred = TeacherPredictor(params=params, model=model, shape_bucket=16)
    rng = np.random.default_rng(1)
    shapes = [(20, 28), (24, 30), (18, 32), (22, 26)]  # all -> (32, 32)
    imgs = [rng.random((h, w, 3)).astype(np.float32) for h, w in shapes]

    grouped = pred.denoise_group(imgs, denoise_rate=0.5, zero_mask=False,
                                 group_size=4)
    for im, g in zip(imgs, grouped):
        s = pred(im, denoise_rate=0.5, zero_mask=False)
        assert g["hq"].shape == im.shape
        np.testing.assert_array_equal(g["hq"], s["hq"])


def _assert_within_one_level(a, b, max_frac=0.001):
    """uint8 outputs from the uint8 vs float input boundary: the float
    values fed to the model are identical, but XLA may fuse the in-jit
    /255 differently (e.g. fold it into the first conv), so isolated
    pixels can round across a quantization boundary. Contract: <=1 uint8
    level, on a vanishing fraction of pixels."""
    d = np.abs(a.astype(np.int16) - b.astype(np.int16))
    assert d.max() <= 1, d.max()
    assert (d != 0).mean() <= max_frac, (d != 0).mean()


def test_uint8_input_boundary_matches_float():
    """uint8 inputs (1 byte/px H2D, in-jit /255) feed the model float
    values identical to the float32 boundary; outputs agree to <=1 uint8
    level (ulp-boundary rounding under different XLA fusions), per-image
    and grouped — including the scalar denoise rate broadcast on device
    replacing the old host rate plane."""
    model, params = _small_teacher()
    pred = TeacherPredictor(params=params, model=model)
    rng = np.random.default_rng(3)
    imgs_u8 = [rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
               for _ in range(4)]
    imgs_f = [im.astype(np.float32) / 255.0 for im in imgs_u8]

    for u8, f in zip(imgs_u8[:2], imgs_f[:2]):
        a = pred(u8, denoise_rate=0.7, zero_mask=False)
        b = pred(f, denoise_rate=0.7, zero_mask=False)
        _assert_within_one_level(a["hq"], b["hq"])
        _assert_within_one_level(a["sr"], b["sr"])

    ga = pred.denoise_group(imgs_u8, denoise_rate=0.7, zero_mask=False,
                            group_size=4)
    gb = pred.denoise_group(imgs_f, denoise_rate=0.7, zero_mask=False,
                            group_size=4)
    for a, b in zip(ga, gb):
        _assert_within_one_level(a["hq"], b["hq"])
        _assert_within_one_level(a["sr"], b["sr"])

    # zero-mask works on the uint8 path (input zeros stay zero)
    z = imgs_u8[0].copy()
    z[:5, :7] = 0
    out = pred(z, denoise_rate=0.7, zero_mask=True)
    assert (out["hq"][:5, :7] == 0).all()


def test_uint8_mixed_dtype_group_is_consistent():
    """A group mixing uint8 and float images must still match per-image
    results (the stack must not promote raw uint8 without /255)."""
    model, params = _small_teacher()
    pred = TeacherPredictor(params=params, model=model)
    rng = np.random.default_rng(4)
    u8 = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    f = rng.random((24, 32, 3)).astype(np.float32)
    mixed = [u8, f, u8, f]
    grouped = pred.denoise_group(mixed, denoise_rate=1.0, zero_mask=False,
                                 group_size=4)
    singles = [pred(im, denoise_rate=1.0, zero_mask=False) for im in mixed]
    for g, s in zip(grouped, singles):
        _assert_within_one_level(g["hq"], s["hq"])


def test_student_uint8_stack_boundary():
    """Student stacks in uint8 ship 1 byte/px; outputs agree with the
    float boundary to <=1 level; load_stack emits uint8 for uniform-size
    sequences and float when a frame was resized."""
    from rethink_acoustic_image_enhancement_tpu.eval.infer import (
        StudentPredictor,
    )

    model = KDLAEStudent(residual=True, hidden_channels=(4, 8))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 7, 32, 32)))["params"]
    pred = StudentPredictor(params=params, model=model)
    rng = np.random.default_rng(5)
    u8 = rng.integers(0, 256, (7, 32, 32), dtype=np.uint8)
    f = u8.astype(np.float32) / 255.0
    _assert_within_one_level(pred(u8), pred(f))
    _assert_within_one_level(pred.denoise_batch(u8[None])[0],
                             pred.denoise_batch(f[None])[0])


def test_asdqe_scorer_uint8_boundary_score_parity():
    """ASDQE fp32 scoring through the uint8 boundary matches the float
    boundary to the BASELINE parity tolerance (in-jit f32 /255 is
    value-exact; only fusion-order ulps remain)."""
    from rethink_acoustic_image_enhancement_tpu.eval.infer import ASDQEScorer
    from rethink_acoustic_image_enhancement_tpu.models import (
        DenoiseRatePredictor,
    )

    model = DenoiseRatePredictor(dim=4)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 32, 32, 3)))
    scorer = ASDQEScorer(variables=variables, model=model)
    rng = np.random.default_rng(6)
    lq = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    gt = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    s_u8 = scorer(lq, gt)
    s_f = scorer(lq.astype(np.float32) / 255.0, gt.astype(np.float32) / 255.0)
    np.testing.assert_allclose(s_u8, s_f, atol=2e-6)


def test_pipelined_score_method_bit_identical(tmp_path):
    """score_method's upload-prefetch pipeline must be bit-identical to
    sequential scorer calls — same jitted program, only the host-side
    overlap changes (asdqe_eval.score_method)."""
    from rethink_acoustic_image_enhancement_tpu.eval.asdqe_eval import (
        score_method,
    )
    from rethink_acoustic_image_enhancement_tpu.utils.image_io import (
        imread_rgb_ubyte,
        imwrite,
    )

    model = DenoiseRatePredictor(dim=4)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 32, 32, 3)))
    scorer = ASDQEScorer(variables=variables, model=model)

    lq_dir, gt_dir = tmp_path / "lq", tmp_path / "gt"
    lq_dir.mkdir(), gt_dir.mkdir()
    rng = np.random.default_rng(7)
    for i in range(5):
        imwrite(str(lq_dir / f"im{i}.png"),
                rng.integers(0, 256, (40, 48, 3), dtype=np.uint8))
        imwrite(str(gt_dir / f"im{i}.png"),
                rng.integers(0, 256, (40, 48, 3), dtype=np.uint8))

    piped = score_method(scorer, str(lq_dir), str(gt_dir), verbose=False)
    seq = np.asarray([
        scorer(imread_rgb_ubyte(str(lq_dir / f"im{i}.png")),
               imread_rgb_ubyte(str(gt_dir / f"im{i}.png")))[0]
        for i in range(5)], np.float64)
    np.testing.assert_array_equal(piped, seq)


def test_student_denoise_batch_data_mesh_parity():
    """A 'data'-axis mesh shards the stack batch across devices; stacks
    are independent so the DP split matches single-device to <=1 uint8
    quantization level (same convention as the tiled teacher DP). Batch
    6 on a 4-way axis exercises the internal pad-to-even-split."""
    from rethink_acoustic_image_enhancement_tpu.parallel.mesh import (
        make_mesh,
    )

    model = KDLAEStudent(residual=True, hidden_channels=(16, 32, 64))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 16, 16)))["params"]
    rng = np.random.default_rng(3)
    stacks = (rng.uniform(0, 1, (6, 3, 40, 48)) * 255).astype(np.uint8)
    single = StudentPredictor(params=params, model=model, num_frames=3,
                              multiple_of=4).denoise_batch(stacks)
    meshed = StudentPredictor(params=params, model=model, num_frames=3,
                              multiple_of=4,
                              mesh=make_mesh(n_data=4)).denoise_batch(stacks)
    assert meshed.shape == single.shape
    diff = np.abs(single.astype(np.int16) - meshed.astype(np.int16))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_student_mesh_refuses_non_data_axes():
    from rethink_acoustic_image_enhancement_tpu.parallel.mesh import (
        make_mesh,
    )

    model = KDLAEStudent(residual=True, hidden_channels=(16, 32, 64))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 16, 16)))["params"]
    with pytest.raises(ValueError, match="data"):
        StudentPredictor(params=params, model=model,
                         mesh=make_mesh(n_data=2, n_spatial=2))


def test_asdqe_scorer_data_mesh_parity():
    """Batched pair scoring sharded over a 'data' mesh axis matches the
    single-device scores (BN in inference mode on frozen batch_stats, so
    DP is exact to fp tolerance)."""
    from rethink_acoustic_image_enhancement_tpu.parallel.mesh import (
        make_mesh,
    )

    model = DenoiseRatePredictor()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 32, 32, 3)))
    rng = np.random.default_rng(7)
    lq = rng.uniform(0, 1, (4, 48, 48, 3)).astype(np.float32)
    gt = rng.uniform(0, 1, (4, 48, 48, 3)).astype(np.float32)
    single = ASDQEScorer(variables=variables, model=model)(lq, gt)
    meshed = ASDQEScorer(variables=variables, model=model,
                         mesh=make_mesh(n_data=4))(lq, gt)
    np.testing.assert_allclose(meshed, single, rtol=1e-5, atol=1e-6)
    # indivisible batches (incl. the reference protocol's batch-1
    # streaming) pad to an even split internally and slice back
    scorer = ASDQEScorer(variables=variables, model=model,
                         mesh=make_mesh(n_data=4))
    odd = scorer(lq[:3], gt[:3])
    assert odd.shape == (3,)
    np.testing.assert_allclose(odd, single[:3], rtol=1e-5, atol=1e-6)
    one = scorer(lq[0], gt[0])
    assert one.shape == (1,)
    np.testing.assert_allclose(one, single[:1], rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="data"):
        ASDQEScorer(variables=variables, model=model,
                    mesh=make_mesh(n_data=2, n_spatial=2))

"""CLI smoke tests: convert (.pth -> orbax), infer-student, score."""

import json
import os

import numpy as np

from rethink_acoustic_image_enhancement_tpu.cli import main
from rethink_acoustic_image_enhancement_tpu.utils.image_io import imwrite
from tests.conftest import requires_reference


@requires_reference
def test_convert_and_infer_student_cli(tmp_path, torch_kdlae_module):
    import torch

    torch.manual_seed(0)
    ref = torch_kdlae_module.KDLAE_student(
        inp_channels=1, out_channels=1, residual=True,
        hidden_channels=[16, 32, 64])
    pth = tmp_path / "student.pth"
    torch.save({"params": ref.state_dict()}, str(pth))

    ckpt = tmp_path / "student_jax"
    assert main(["convert", "--pth", str(pth), "--arch", "KDLAE_student",
                 "--out", str(ckpt)]) == 0

    frames_dir = tmp_path / "frames"
    os.makedirs(frames_dir)
    for i in range(7):
        img = (np.random.default_rng(i).uniform(0.2, 0.8, (64, 64)) * 255
               ).astype(np.uint8)
        imwrite(str(frames_dir / f"{i:03d}.png"), img, rgb=False)

    out_dir = tmp_path / "out"
    assert main(["infer-student", "--weights", str(ckpt),
                 "--input", str(frames_dir), "--output", str(out_dir)]) == 0
    outs = sorted(os.listdir(out_dir))
    assert len(outs) == 7


@requires_reference
def test_score_cli_custom_methods(tmp_path, torch_asdqe_module):
    import torch

    torch.manual_seed(0)
    ref = torch_asdqe_module.DenoiseRatePredictor().eval()
    pth = tmp_path / "asdqe.pth"
    torch.save(ref.state_dict(), str(pth))

    lq_dir = tmp_path / "origin"
    m_dir = tmp_path / "method_a"
    os.makedirs(lq_dir)
    os.makedirs(m_dir)
    for i in range(3):
        rng = np.random.default_rng(i)
        img = (rng.uniform(0, 1, (48, 48, 3)) * 255).astype(np.uint8)
        imwrite(str(lq_dir / f"{i}.png"), img)
        imwrite(str(m_dir / f"{i}.png"), np.clip(img + 10, 0, 255).astype(np.uint8))

    csv = tmp_path / "stats.csv"
    assert main(["score", "--weights", str(pth), "--lq-dir", str(lq_dir),
                 "--methods", f"origin={lq_dir}", f"A={m_dir}",
                 "--csv", str(csv)]) == 0
    lines = csv.read_text().strip().splitlines()
    assert lines[0] == ",origin,A"
    assert len(lines) == 8


def test_train_asdqe_cli(tmp_path):
    """train-asdqe subcommand: the working replacement for the reference's
    broken Train/ASDQE.py entry (imports a nonexistent S_IQA_model)."""
    import json

    lq = tmp_path / "lq"
    gt = tmp_path / "gt"
    par = tmp_path / "param"
    for d in (lq, gt, par):
        os.makedirs(d)
    for i in range(5):
        rng = np.random.default_rng(i)
        img = (rng.uniform(0, 1, (40, 40, 3)) * 255).astype(np.uint8)
        imwrite(str(lq / f"{i}.png"), img)
        imwrite(str(gt / f"{i}.png"), np.clip(img + 5, 0, 255).astype(np.uint8))
        (par / f"{i}.json").write_text(json.dumps({"score": 0.5}))

    out = tmp_path / "ckpt"
    assert main(["train-asdqe", "--lq", str(lq), "--gt", str(gt),
                 "--param", str(par), "--out", str(out),
                 "--epochs", "1", "--gt-size", "32", "--accum", "2",
                 "--max-steps-per-epoch", "2"]) == 0
    assert os.listdir(out)  # best/latest checkpoints written

    # the train-asdqe -> score handoff: the orbax checkpoint written above
    # must load through `raie score` (regression: the nested
    # {'params': {'params', 'batch_stats'}} payload raised KeyError)
    csv = tmp_path / "stats.csv"
    assert main(["score", "--weights", str(out / "net_g_best"),
                 "--lq-dir", str(lq), "--methods", f"origin={lq}",
                 f"gtish={gt}", "--csv", str(csv)]) == 0
    assert csv.read_text().strip().splitlines()[0] == ",origin,gtish"


def test_infer_teacher_cli_group_mode(tmp_path):
    """infer-teacher --group-size scans same-shape images through one
    dispatch; outputs must match the per-image CLI path exactly."""
    import jax
    import jax.numpy as jnp

    from rethink_acoustic_image_enhancement_tpu.models import flagship_teacher
    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        save_weights,
    )

    model = flagship_teacher(static="test")
    params = model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 16, 16, 3)),
         "denoise_rate": jnp.zeros((1, 16, 16, 1))})["params"]
    w = save_weights(str(tmp_path / "w"), 0, jax.device_get(params))

    src = tmp_path / "in"
    os.makedirs(src)
    rng = np.random.default_rng(0)
    for i in range(3):
        img = (rng.uniform(0, 1, (16, 24, 3)) * 255).astype(np.uint8)
        imwrite(str(src / f"{i}.png"), img)

    out_g = tmp_path / "out_g"
    out_s = tmp_path / "out_s"
    assert main(["infer-teacher", "--weights", w, "--input", str(src),
                 "--output", str(out_g), "--group-size", "2"]) == 0
    assert main(["infer-teacher", "--weights", w, "--input", str(src),
                 "--output", str(out_s)]) == 0
    import cv2

    for i in range(3):
        a = cv2.imread(str(out_g / f"{i}.png"))
        b = cv2.imread(str(out_s / f"{i}.png"))
        np.testing.assert_array_equal(a, b)


def test_infer_teacher_cli_tile_mode(tmp_path):
    """infer-teacher --tile drives the tiled batched fast path end to end
    (approximate by design; the CLI contract is shapes + files written)."""
    import jax
    import jax.numpy as jnp

    from rethink_acoustic_image_enhancement_tpu.models import flagship_teacher
    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        save_weights,
    )

    model = flagship_teacher(static="test")
    params = model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 16, 16, 3)),
         "denoise_rate": jnp.zeros((1, 16, 16, 1))})["params"]
    w = save_weights(str(tmp_path / "w"), 0, jax.device_get(params))

    src = tmp_path / "in"
    os.makedirs(src)
    rng = np.random.default_rng(1)
    for i in range(2):
        img = (rng.uniform(0, 1, (48, 48, 3)) * 255).astype(np.uint8)
        imwrite(str(src / f"{i}.png"), img)

    out = tmp_path / "out_t"
    assert main(["infer-teacher", "--weights", w, "--input", str(src),
                 "--output", str(out), "--tile", "16",
                 "--tile-halo", "8"]) == 0
    import cv2

    for i in range(2):
        a = cv2.imread(str(out / f"{i}.png"))
        assert a is not None and a.shape == (48, 48, 3)


def test_serve_cli_once_idempotent(tmp_path):
    """serve --once drains the backlog, skips already-produced outputs on
    the next invocation (restart-safe), and picks up new files."""
    import jax
    import jax.numpy as jnp

    from rethink_acoustic_image_enhancement_tpu.models import flagship_teacher
    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        save_weights,
    )

    model = flagship_teacher(static="test")
    params = model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 16, 16, 3)),
         "denoise_rate": jnp.zeros((1, 16, 16, 1))})["params"]
    w = save_weights(str(tmp_path / "w"), 0, jax.device_get(params))

    watch = tmp_path / "watch"
    out = tmp_path / "out"
    os.makedirs(watch)
    rng = np.random.default_rng(0)
    for i in range(2):
        img = (rng.uniform(0, 1, (16, 24, 3)) * 255).astype(np.uint8)
        imwrite(str(watch / f"{i}.png"), img)

    assert main(["serve", "--weights", w, "--watch", str(watch),
                 "--output", str(out), "--once", "--group-size", "2"]) == 0
    assert sorted(os.listdir(out)) == ["0.png", "1.png"]

    # second pass: nothing reprocessed; a new file IS processed
    before = {f: (out / f).stat().st_mtime_ns for f in os.listdir(out)}
    img = (rng.uniform(0, 1, (16, 24, 3)) * 255).astype(np.uint8)
    imwrite(str(watch / "2.png"), img)
    assert main(["serve", "--weights", w, "--watch", str(watch),
                 "--output", str(out), "--once", "--group-size", "2"]) == 0
    assert sorted(os.listdir(out)) == ["0.png", "1.png", "2.png"]
    for f, ts in before.items():
        assert (out / f).stat().st_mtime_ns == ts  # untouched


def test_serve_cli_tile_mode(tmp_path):
    """serve --tile routes the backlog through the tiled fast path and
    stays idempotent across invocations."""
    import jax
    import jax.numpy as jnp

    from rethink_acoustic_image_enhancement_tpu.models import flagship_teacher
    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        save_weights,
    )

    model = flagship_teacher(static="test")
    params = model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 16, 16, 3)),
         "denoise_rate": jnp.zeros((1, 16, 16, 1))})["params"]
    w = save_weights(str(tmp_path / "w"), 0, jax.device_get(params))

    watch = tmp_path / "watch"
    out = tmp_path / "out"
    os.makedirs(watch)
    rng = np.random.default_rng(0)
    for i in range(2):
        img = (rng.uniform(0, 1, (48, 48, 3)) * 255).astype(np.uint8)
        imwrite(str(watch / f"{i}.png"), img)

    argv = ["serve", "--weights", w, "--watch", str(watch),
            "--output", str(out), "--once", "--tile", "16",
            "--tile-halo", "8"]
    assert main(argv) == 0
    assert sorted(os.listdir(out)) == ["0.png", "1.png"]
    before = {f: (out / f).stat().st_mtime_ns for f in os.listdir(out)}
    assert main(argv) == 0  # idempotent second pass
    for f, ts in before.items():
        assert (out / f).stat().st_mtime_ns == ts


def test_train_cli_builds_data_parallel_mesh(tmp_path, capsys):
    """raie train auto-builds a data mesh over all local devices (the
    torchrun-DDP analog); runs a 4-iter student smoke on the 8-virtual-
    device CPU backend."""
    import yaml

    from test_train_loop import _student_config, _write_frames

    _write_frames(tmp_path / "data")
    cfg = _student_config(tmp_path)
    cfg["name"] = "cli_mesh_smoke"
    path = tmp_path / "opt.yml"
    path.write_text(yaml.safe_dump(cfg))

    import os as _os

    cwd = _os.getcwd()
    _os.chdir(tmp_path)  # exp dirs resolve under tmp
    try:
        assert main(["train", "-opt", str(path), "--max-iters", "4"]) == 0
    finally:
        _os.chdir(cwd)
    outp = capsys.readouterr().out
    assert "data-parallel mesh over 8 devices" in outp


def test_zoo_alias_resolution():
    """--weights zoo aliases resolve to in-repo artifact dirs; the
    teacher-l2dice alias carries the reference notebook's denoise_rate
    0.6 serving preset (KDLAE_T.ipynb cell 5); unknown specs pass
    through as paths."""
    import pytest

    from rethink_acoustic_image_enhancement_tpu.cli import _resolve_weights

    path, rate = _resolve_weights("teacher")
    assert os.path.isdir(path) and rate == 1.0

    path, rate = _resolve_weights("student-us")
    assert os.path.isdir(path) and rate is None

    # real paths untouched
    assert _resolve_weights("/some/where.pth") == ("/some/where.pth", None)

    # aliases whose artifact is absent fail with a pointed error,
    # never a silent fall-through to a bogus path
    from rethink_acoustic_image_enhancement_tpu import cli as _cli

    if not os.path.isdir(os.path.join(
            os.path.dirname(os.path.dirname(_cli.__file__)),
            _cli._ZOO["teacher-l2dice"][0])):
        with pytest.raises(SystemExit, match="zoo alias"):
            _resolve_weights("teacher-l2dice")
    else:
        path, rate = _resolve_weights("teacher-l2dice")
        assert rate == 0.6

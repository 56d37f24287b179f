"""Tests for FID math, SuperRestoration (3-modality) dataset, profiling,
parallel init helpers."""

import os

import numpy as np

from rethink_acoustic_image_enhancement_tpu.data.datasets import create_dataset
from rethink_acoustic_image_enhancement_tpu.metrics.fid import (
    calculate_fid,
    calculate_stats,
    fid_between_feature_sets,
)
from rethink_acoustic_image_enhancement_tpu.parallel import is_master
from rethink_acoustic_image_enhancement_tpu.utils.image_io import imwrite
from rethink_acoustic_image_enhancement_tpu.utils.profiling import StepTimer


def test_fid_identical_is_zero():
    f = np.random.default_rng(0).normal(size=(200, 16))
    mu, sigma = calculate_stats(f)
    assert abs(calculate_fid(mu, sigma, mu, sigma)) < 1e-6


def test_fid_orders_by_distribution_distance():
    rng = np.random.default_rng(1)
    base = rng.normal(size=(300, 8))
    near = rng.normal(loc=0.1, size=(300, 8))
    far = rng.normal(loc=2.0, size=(300, 8))
    assert fid_between_feature_sets(base, near) < fid_between_feature_sets(base, far)


def test_super_restoration_3modality(tmp_path):
    for sub in ["lq", "gt", "sr"]:
        os.makedirs(tmp_path / sub)
    for i in range(3):
        rng = np.random.default_rng(i)
        img = (rng.uniform(0.1, 0.9, (40, 40, 3)) * 255).astype(np.uint8)
        imwrite(str(tmp_path / "lq" / f"{i}.png"), img)
        imwrite(str(tmp_path / "gt" / f"{i}.png"), img)
        big = (rng.uniform(0.1, 0.9, (80, 80, 3)) * 255).astype(np.uint8)
        imwrite(str(tmp_path / "sr" / f"{i}.png"), big)
    ds = create_dataset({
        "type": "Dataset_SuperRestoration",
        "dataroot_lq": str(tmp_path / "lq"),
        "dataroot_gt": str(tmp_path / "gt"),
        "dataroot_sr": str(tmp_path / "sr"),
        "phase": "train", "scale": 1, "gt_size": 32,
        "geometric_augs": True, "seed": 0,
    })
    s = ds[0]
    assert s["lq"]["img"].shape == (32, 32, 3)
    assert s["gt"]["sr"].shape == (64, 64, 3)
    np.testing.assert_allclose(s["lq"]["denoise_rate"], 1.0)


def test_step_timer():
    t = StepTimer()
    t.data_ready()
    t.step_done()
    assert t.iter_time >= 0 and t.data_time >= 0
    assert t.eta_seconds(10) >= 0


def test_is_master_single_process():
    assert is_master()


def test_bundle_submissions(tmp_path):
    import scipy.io as sio

    from rethink_acoustic_image_enhancement_tpu.eval.bundle_submissions import (
        bundle_submissions_srgb,
    )

    rng = np.random.default_rng(0)
    for i in range(2):
        for bb in range(3):
            sio.savemat(str(tmp_path / f"{i+1:04d}_{bb+1:02d}.mat"),
                        {"Idenoised_crop": rng.random((4, 4, 3))})
    out = bundle_submissions_srgb(str(tmp_path), "bundled",
                                  num_images=2, num_blocks=3)
    bundled = sio.loadmat(os.path.join(out, "0001.mat"))
    assert bundled["Idenoised"].shape[-1] == 3
    assert bundled["israw"] == False  # noqa: E712


def test_bench_probe_patience(monkeypatch):
    """bench.py retries the backend probe with bounded patience (a wedged
    tunnel claim can clear server-side minutes later — CLAUDE.md) and
    still fails fast at patience 0."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    calls = []
    monkeypatch.setenv("RAIE_BENCH_PROBE_PATIENCE_S", "0")
    monkeypatch.setattr(bench, "_backend_answers",
                        lambda timeout_s=120.0: (calls.append(1), False)[1])
    assert bench._wait_for_backend() is False
    assert len(calls) == 1  # patience 0 = the old single-probe behavior

    calls.clear()
    monkeypatch.setenv("RAIE_BENCH_PROBE_PATIENCE_S", "5")
    monkeypatch.setattr(bench, "_backend_answers",
                        lambda timeout_s=120.0: (calls.append(1),
                                                 len(calls) >= 3)[1])
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._wait_for_backend() is True
    assert len(calls) == 3


def test_doctor_cpu_and_wedge_classification(monkeypatch):
    """`raie doctor` runs its device diagnostic in a bounded child
    process: healthy CPU probe fills the metrics, a probe timeout is
    classified as a wedged backend instead of hanging the caller."""
    import subprocess

    from rethink_acoustic_image_enhancement_tpu.utils import doctor

    rep = doctor.run_doctor(probe_timeout=300.0, bandwidth_mb=1.0,
                            platform="cpu")
    b = rep["backend"]
    assert b["status"] == "ok"
    assert b["n_devices"] >= 1 and b["platform"] == "cpu"
    for k in ("dispatch_ms", "h2d_mbps", "d2h_mbps", "first_call_s"):
        assert b[k] > 0
    assert "backend OK" in doctor.format_report(rep)

    def fake_run(*a, **kw):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=kw["timeout"])

    monkeypatch.setattr(doctor.subprocess, "run", fake_run)
    rep = doctor.run_doctor(probe_timeout=1.0, platform="cpu")
    assert rep["backend"]["status"] == "wedged"
    assert "WEDGED" in doctor.format_report(rep)

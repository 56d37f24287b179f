"""Tests: FileClient, MATLAB-compat utils, GaussianDenoising dataset."""

import numpy as np
import pytest

from rethink_acoustic_image_enhancement_tpu.data.datasets import create_dataset
from rethink_acoustic_image_enhancement_tpu.data.file_client import FileClient
from rethink_acoustic_image_enhancement_tpu.utils.image_io import imwrite
from rethink_acoustic_image_enhancement_tpu.utils.matlab import (
    imresize,
    rgb2ycbcr,
    to_y_channel,
    ycbcr2rgb,
)


def test_file_client_disk(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"hello")
    fc = FileClient("disk")
    assert fc.get(str(p)) == b"hello"
    with pytest.raises(ValueError):
        FileClient("nope")


def test_matlab_imresize_properties():
    img = np.random.default_rng(0).random((24, 32, 3))
    half = imresize(img, 0.5)
    assert half.shape == (12, 16, 3)
    twice = imresize(img, 2.0)
    assert twice.shape == (48, 64, 3)
    # constant image stays constant
    const = imresize(np.full((16, 16), 0.5), 0.5)
    np.testing.assert_allclose(const, 0.5, atol=1e-9)
    # downsample of a smooth ramp stays close to the ramp
    ramp = np.tile(np.linspace(0, 1, 32), (32, 1))
    down = imresize(ramp, 0.5)
    np.testing.assert_allclose(down.mean(), 0.5, atol=0.01)


def test_matlab_imresize_matches_reference_implementation():
    """Oracle: the reference's own MATLAB-compatible imresize
    (Train/basicsr/utils/matlab_functions.py)."""
    import importlib.util
    import os

    from tests.conftest import REFERENCE_ROOT, reference_available

    if not reference_available():
        pytest.skip("reference not mounted")
    pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "ref_matlab", os.path.join(REFERENCE_ROOT, "Train", "basicsr",
                                   "utils", "matlab_functions.py"))
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    img = np.random.default_rng(2).random((17, 23, 3)).astype(np.float64)
    for scale in (0.5, 2.0, 0.3):
        expected = np.asarray(ref.imresize(img, scale, antialiasing=True))
        got = imresize(img, scale, antialiasing=True)
        assert got.shape == expected.shape, scale
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_ycbcr_roundtrip():
    from rethink_acoustic_image_enhancement_tpu.utils.matlab import (
        bgr2ycbcr,
        ycbcr2bgr,
    )

    img = np.random.default_rng(1).random((5, 7, 3))
    ycc = rgb2ycbcr(img)
    back = ycbcr2rgb(ycc)
    np.testing.assert_allclose(back, img, atol=1e-10)
    # matlab_functions.py:273 ycbcr2bgr = inverse of bgr2ycbcr
    np.testing.assert_allclose(ycbcr2bgr(bgr2ycbcr(img)), img, atol=1e-10)
    y = to_y_channel((img * 255).astype(np.float32))
    assert y.shape == (5, 7, 1)
    assert 16 <= y.mean() <= 235


def test_gaussian_denoising_dataset(tmp_path):
    import os

    os.makedirs(tmp_path / "gt")
    for i in range(4):
        img = (np.random.default_rng(i).random((40, 40, 3)) * 255
               ).astype(np.uint8)
        imwrite(str(tmp_path / "gt" / f"{i}.png"), img)
    ds = create_dataset({
        "type": "Dataset_GaussianDenoising",
        "dataroot_gt": str(tmp_path / "gt"),
        "phase": "train", "scale": 1, "gt_size": 32,
        "sigma_type": "random", "sigma_range": [5, 25],
        "in_ch": 3, "geometric_augs": True, "seed": 0,
    })
    s = ds[0]
    assert s["lq"].shape == (32, 32, 3) and s["gt"].shape == (32, 32, 3)
    noise = s["lq"] - s["gt"]
    assert 3 / 255 < noise.std() < 30 / 255  # sigma within range

    ds_test = create_dataset({
        "type": "Dataset_GaussianDenoising",
        "dataroot_gt": str(tmp_path / "gt"),
        "phase": "val", "scale": 1, "sigma_test": 15, "in_ch": 1,
    })
    s = ds_test[1]
    assert s["lq"].shape[-1] == 1
    assert abs((s["lq"] - s["gt"]).std() - 15 / 255) < 3 / 255


def test_gdrive_download_confirm_token_flow(tmp_path):
    """Google-Drive fetcher: large-file confirm-token retry + chunked
    write (reference download_util.py:8-44), with an injected transport."""
    from rethink_acoustic_image_enhancement_tpu.utils.download_weights import (
        download_from_google_drive,
        gdrive_confirm_token,
    )

    assert gdrive_confirm_token({"download_warning_x": "tok"}) == "tok"
    assert gdrive_confirm_token({"other": "v"}) is None

    calls = []
    payload = [b"abc", b"", b"defg"]  # empty chunk must be skipped

    def fake_fetch(url, params):
        calls.append(dict(params))
        if "confirm" not in params:
            return {"download_warning_abc": "T0K"}, iter([b"interstitial"])
        assert params["confirm"] == "T0K"
        return {}, iter(payload)

    dest = tmp_path / "weights" / "w.pth"
    n = download_from_google_drive("FILEID", str(dest), fetch=fake_fetch,
                                  log=lambda m: None)
    assert n == 7
    assert dest.read_bytes() == b"abcdefg"
    assert calls == [{"id": "FILEID"},
                     {"id": "FILEID", "confirm": "T0K"}]

    # small-file path: no token -> first stream is the content
    def fake_fetch_small(url, params):
        return {}, iter([b"xy"])

    dest2 = tmp_path / "w2.pth"
    assert download_from_google_drive("F2", str(dest2),
                                      fetch=fake_fetch_small,
                                      log=lambda m: None) == 2
    assert dest2.read_bytes() == b"xy"


def test_gdrive_download_rejects_html_interstitial(tmp_path):
    """Modern Drive interstitials without the cookie must raise, not save
    an HTML page as the weights file."""
    import pytest

    from rethink_acoustic_image_enhancement_tpu.utils.download_weights import (
        download_from_google_drive,
    )

    def fake_fetch(url, params):
        return {}, iter([b"<!DOCTYPE html><html>virus scan warning</html>"])

    with pytest.raises(IOError, match="HTML page"):
        download_from_google_drive("FID", str(tmp_path / "w.pth"),
                                   fetch=fake_fetch, log=lambda m: None)
    assert not (tmp_path / "w.pth").exists()

"""Stock video/face dataset tests on synthetic clip fixtures."""

import os

import numpy as np

from rethink_acoustic_image_enhancement_tpu.data.datasets import create_dataset
from rethink_acoustic_image_enhancement_tpu.data.video_datasets import (
    generate_frame_indices,
)
from rethink_acoustic_image_enhancement_tpu.utils.image_io import imwrite


def _make_clips(root, n_clips=2, n_frames=12, lq_hw=(16, 20), scale=2):
    gh, gw = lq_hw[0] * scale, lq_hw[1] * scale
    for c in range(n_clips):
        clip = f"{c:03d}"
        os.makedirs(root / "lq" / clip, exist_ok=True)
        os.makedirs(root / "gt" / clip, exist_ok=True)
        for i in range(n_frames):
            rng = np.random.default_rng(c * 100 + i)
            imwrite(str(root / "lq" / clip / f"{i:08d}.png"),
                    (rng.random((*lq_hw, 3)) * 255).astype(np.uint8))
            imwrite(str(root / "gt" / clip / f"{i:08d}.png"),
                    (rng.random((gh, gw, 3)) * 255).astype(np.uint8))


def test_generate_frame_indices():
    assert generate_frame_indices(0, 9, 5, "reflection") == [2, 1, 0, 1, 2]
    assert generate_frame_indices(0, 9, 5, "replicate") == [0, 0, 0, 1, 2]
    assert generate_frame_indices(9, 9, 5, "reflection") == [7, 8, 9, 8, 7]
    assert generate_frame_indices(5, 9, 5, "reflection") == [3, 4, 5, 6, 7]


def test_reds_dataset(tmp_path):
    _make_clips(tmp_path, n_frames=12)
    ds = create_dataset({
        "type": "REDSDataset",
        "dataroot_gt": str(tmp_path / "gt"),
        "dataroot_lq": str(tmp_path / "lq"),
        "num_frame": 5, "interval_list": [1], "random_reverse": True,
        "frames_per_clip": 12, "scale": 2, "gt_size": 16, "seed": 0,
    })
    assert len(ds) == 24
    s = ds[3]
    assert s["lq"].shape == (5, 8, 8, 3)   # gt_size/scale patches
    assert s["gt"].shape == (16, 16, 3)


def test_vimeo90k_dataset(tmp_path):
    # septuplet layout: <key>/im1..im7
    for key in ["00001/0001", "00001/0002"]:
        os.makedirs(tmp_path / "lq" / key, exist_ok=True)
        os.makedirs(tmp_path / "gt" / key, exist_ok=True)
        for i in range(1, 8):
            rng = np.random.default_rng(i)
            imwrite(str(tmp_path / "lq" / key / f"im{i}.png"),
                    (rng.random((12, 16, 3)) * 255).astype(np.uint8))
            imwrite(str(tmp_path / "gt" / key / f"im{i}.png"),
                    (rng.random((24, 32, 3)) * 255).astype(np.uint8))
    meta = tmp_path / "meta.txt"
    meta.write_text("00001/0001 7 (256,448,3)\n00001/0002 7 (256,448,3)\n")
    ds = create_dataset({
        "type": "Vimeo90KDataset",
        "dataroot_gt": str(tmp_path / "gt"),
        "dataroot_lq": str(tmp_path / "lq"),
        "meta_info_file": str(meta),
        "num_frame": 7, "scale": 2, "gt_size": 16, "seed": 0,
    })
    assert len(ds) == 2
    s = ds[0]
    assert s["lq"].shape == (7, 8, 8, 3)
    assert s["gt"].shape == (16, 16, 3)
    assert s["key"] == "00001/0001"


def test_video_test_dataset(tmp_path):
    _make_clips(tmp_path, n_clips=1, n_frames=6, scale=1,
                lq_hw=(16, 20))
    ds = create_dataset({
        "type": "VideoTestDataset",
        "dataroot_gt": str(tmp_path / "gt"),
        "dataroot_lq": str(tmp_path / "lq"),
        "num_frame": 5, "padding": "reflection",
    })
    assert len(ds) == 6
    first = ds[0]
    assert first["lq"].shape == (5, 16, 20, 3)
    assert first["border"] == 1
    mid = ds[3]
    assert mid["border"] == 0


def test_ffhq_dataset(tmp_path):
    os.makedirs(tmp_path / "gt")
    for i in range(3):
        imwrite(str(tmp_path / "gt" / f"{i:08d}.png"),
                (np.random.default_rng(i).random((16, 16, 3)) * 255
                 ).astype(np.uint8))
    ds = create_dataset({
        "type": "FFHQDataset", "dataroot_gt": str(tmp_path / "gt"),
        "use_hflip": True, "mean": [0.5, 0.5, 0.5], "std": [0.5, 0.5, 0.5],
    })
    s = ds[0]
    assert s["gt"].shape == (16, 16, 3)
    assert -1.1 <= s["gt"].min() and s["gt"].max() <= 1.1

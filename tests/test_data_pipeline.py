"""Data pipeline tests on synthetic fixture folders."""

import json
import os

import numpy as np
import pytest

from rethink_acoustic_image_enhancement_tpu.data.datasets import (
    PairedMultiImageDataset,
    SuperRestorationParamDataset,
    create_dataset,
)
from rethink_acoustic_image_enhancement_tpu.data.loader import (
    BatchLoader,
    DevicePrefetcher,
    EnlargedShuffleSampler,
    default_collate,
)
from rethink_acoustic_image_enhancement_tpu.data.pairing import (
    paired_multipaths_from_folder,
    paired_paths_from_folder,
    paired_paths_from_folder_param,
)
from rethink_acoustic_image_enhancement_tpu.utils.image_io import imwrite


def _write_img(path, h, w, seed, gray=False):
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = (rng.uniform(0.1, 0.9, size=shape) * 255).astype(np.uint8)
    imwrite(str(path), img, rgb=not gray)


@pytest.fixture()
def teacher_root(tmp_path):
    """lq/gt at 1x, sr at 2x, per-image JSON with denoise_rate."""
    for sub in ["lq", "gt", "sr", "params"]:
        os.makedirs(tmp_path / sub)
    for i in range(6):
        name = f"img{i:03d}"
        _write_img(tmp_path / "lq" / f"{name}.png", 70, 80, seed=i)
        _write_img(tmp_path / "gt" / f"{name}.png", 70, 80, seed=100 + i)
        _write_img(tmp_path / "sr" / f"{name}.png", 140, 160, seed=200 + i)
        (tmp_path / "params" / f"{name}.json").write_text(
            json.dumps({"denoise_rate": 0.1 * i}))
    return tmp_path


@pytest.fixture()
def frames_root(tmp_path):
    """Numeric-prefix frame sequence for the student dataset."""
    for sub in ["lq", "gt"]:
        os.makedirs(tmp_path / sub)
    for i in range(20):
        _write_img(tmp_path / "lq" / f"{i}_f.png", 64, 72, seed=i, gray=True)
        _write_img(tmp_path / "gt" / f"{i}_f.png", 64, 72, seed=50 + i, gray=True)
    return tmp_path


def test_paired_paths_from_folder(teacher_root):
    pairs = paired_paths_from_folder(
        [str(teacher_root / "lq"), str(teacher_root / "gt")], ["lq", "gt"])
    assert len(pairs) == 6
    assert pairs[0]["lq_path"].endswith("img000.png")


def test_paired_paths_from_folder_param(teacher_root):
    pairs = paired_paths_from_folder_param(
        [str(teacher_root / s) for s in ["lq", "gt", "sr", "params"]],
        ["lq", "gt", "sr", "param"])
    assert len(pairs) == 6
    assert all(set(p) == {"lq_path", "gt_path", "sr_path", "param_path"}
               for p in pairs)
    # deterministic ordering
    again = paired_paths_from_folder_param(
        [str(teacher_root / s) for s in ["lq", "gt", "sr", "params"]],
        ["lq", "gt", "sr", "param"])
    assert pairs == again


@pytest.mark.fast
def test_multipaths_grouping_and_seeding(frames_root):
    folders = [str(frames_root / "lq"), str(frames_root / "gt")]
    g1 = paired_multipaths_from_folder(folders, ["lq", "gt"], num_pairs=7,
                                       stride_range=(1, 1), seed=0)
    # stride 1: groups start at 0..n-1-6*1 (range excludes boundary starts)
    assert len(g1) == 20 - 6
    assert all(len(g) == 7 for g in g1)
    # group 0 is frames 0..6 in numeric order
    names = [os.path.basename(d["lq_path"]) for d in g1[0]]
    assert names == [f"{i}_f.png" for i in range(7)]

    ga = paired_multipaths_from_folder(folders, ["lq", "gt"], 5, (1, 3), seed=1)
    gb = paired_multipaths_from_folder(folders, ["lq", "gt"], 5, (1, 3), seed=1)
    gc = paired_multipaths_from_folder(folders, ["lq", "gt"], 5, (1, 3), seed=2)
    assert ga == gb
    assert ga != gc  # different stride rolls


def test_teacher_dataset_train_sample(teacher_root):
    ds = create_dataset({
        "type": "Dataset_SuperRestoration_param",
        "dataroot_lq": str(teacher_root / "lq"),
        "dataroot_gt": str(teacher_root / "gt"),
        "dataroot_sr": str(teacher_root / "sr"),
        "dataroot_param": str(teacher_root / "params"),
        "phase": "train", "scale": 1, "gt_size": 32,
        "geometric_augs": True, "seed": 7,
    })
    assert isinstance(ds, SuperRestorationParamDataset)
    s = ds[2]
    assert s["lq"]["img"].shape == (32, 32, 3)
    assert s["lq"]["denoise_rate"].shape == (32, 32, 1)
    np.testing.assert_allclose(s["lq"]["denoise_rate"], 0.2, atol=1e-6)
    assert s["gt"]["hq"].shape == (32, 32, 3)
    assert s["gt"]["sr"].shape == (64, 64, 3)  # 2x crop
    # deterministic per (epoch, index)
    s2 = ds[2]
    np.testing.assert_array_equal(s["lq"]["img"], s2["lq"]["img"])
    ds.set_epoch(1)
    s3 = ds[2]
    assert not np.array_equal(s["lq"]["img"], s3["lq"]["img"])


def test_student_dataset_train_sample(frames_root):
    ds = PairedMultiImageDataset({
        "dataroot_lq": str(frames_root / "lq"),
        "dataroot_gt": str(frames_root / "gt"),
        "phase": "train", "scale": 1, "gt_size": 48,
        "num_pairs": 7, "stride_range": (1, 1), "prob": 0.1,
        "geometric_augs": True, "seed": 3,
    })
    s = ds[0]
    assert s["lq"].shape == (7, 48, 48)
    assert s["gt"].shape == (7, 48, 48)
    assert s["lq"].dtype == np.float32
    # corruption present: masked pixels pushed to -0.1
    assert (s["lq"] < 0).any()
    assert (s["gt"] >= 0).all()


@pytest.mark.fast
def test_sampler_rank_partition():
    s0 = EnlargedShuffleSampler(10, ratio=2, rank=0, world_size=4, seed=5)
    s1 = EnlargedShuffleSampler(10, ratio=2, rank=1, world_size=4, seed=5)
    i0, i1 = s0.epoch_indices(0), s1.epoch_indices(0)
    assert len(i0) == len(i1) == 5  # ceil(20/4)
    assert (i0 < 10).all() and (i1 < 10).all()
    # deterministic per epoch, different across epochs
    np.testing.assert_array_equal(i0, s0.epoch_indices(0))
    assert not np.array_equal(i0, s0.epoch_indices(1))


@pytest.mark.fast
def test_batch_loader_and_prefetcher(frames_root):
    ds = PairedMultiImageDataset({
        "dataroot_lq": str(frames_root / "lq"),
        "dataroot_gt": str(frames_root / "gt"),
        "phase": "train", "scale": 1, "gt_size": 32,
        "num_pairs": 5, "stride_range": (1, 1), "prob": 0.0,
        "geometric_augs": False, "seed": 0,
    })
    sampler = EnlargedShuffleSampler(len(ds), rank=0, world_size=1, seed=0)
    loader = BatchLoader(ds, batch_size=4, sampler=sampler, num_workers=2)
    loader.set_epoch(0)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    assert batches[0]["lq"].shape == (4, 5, 32, 32)
    assert isinstance(batches[0]["lq_path"], list)

    pf = list(DevicePrefetcher(iter(batches), put=lambda b: b))
    assert len(pf) == len(batches)
    np.testing.assert_array_equal(pf[0]["lq"], batches[0]["lq"])


def test_collate_nested():
    out = default_collate([
        {"a": {"b": np.ones((2, 2))}, "p": "x"},
        {"a": {"b": np.zeros((2, 2))}, "p": "y"},
    ])
    assert out["a"]["b"].shape == (2, 2, 2)
    assert out["p"] == ["x", "y"]


def test_decode_cache_identical_and_hits(teacher_root):
    """cache_decoded: true serves identical items and decodes each source
    file exactly once (host decode was the e2e bottleneck — STATUS.md)."""
    base_opt = {
        "type": "Dataset_SuperRestoration_param",
        "dataroot_lq": str(teacher_root / "lq"),
        "dataroot_gt": str(teacher_root / "gt"),
        "dataroot_sr": str(teacher_root / "sr"),
        "dataroot_param": str(teacher_root / "params"),
        "phase": "train", "scale": 1, "gt_size": 32,
        "geometric_augs": True, "seed": 7,
    }
    plain = create_dataset(base_opt)
    cached = create_dataset(dict(base_opt, cache_decoded=True))

    for idx in (0, 3, 5):
        a, b = plain[idx], cached[idx]
        np.testing.assert_array_equal(a["lq"]["img"], b["lq"]["img"])
        np.testing.assert_array_equal(a["gt"]["hq"], b["gt"]["hq"])
        np.testing.assert_array_equal(a["gt"]["sr"], b["gt"]["sr"])

    # re-reading the same index must hit the cache, not the decoder
    calls = []
    orig = cached._read

    def counting_read(path, reader, key="default"):
        calls.append(path)
        return orig(path, reader, key)

    cached._read = counting_read
    n_before = len(cached._decode_cache)
    _ = cached[0]
    assert len(cached._decode_cache) == n_before  # warm: no new entries
    # cached items must not alias cache memory (downstream mutation safety)
    item = cached[1]
    item["gt"]["hq"][:] = -1.0
    again = cached[1]
    assert not np.array_equal(item["gt"]["hq"], again["gt"]["hq"])

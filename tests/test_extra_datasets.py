"""SingleImage + dual-pixel 16-bit datasets, incl. the teacher's
dual_pixel_task path end to end."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.data.datasets import create_dataset
from rethink_acoustic_image_enhancement_tpu.models import KDLAETeacher
from rethink_acoustic_image_enhancement_tpu.utils.image_io import imwrite


def test_single_image_dataset(tmp_path):
    os.makedirs(tmp_path / "lq")
    for i in range(3):
        img = (np.random.default_rng(i).random((20, 24, 3)) * 255
               ).astype(np.uint8)
        imwrite(str(tmp_path / "lq" / f"{i}.png"), img)
    ds = create_dataset({"type": "Dataset_SingleImage",
                         "dataroot_lq": str(tmp_path / "lq")})
    assert len(ds) == 3
    s = ds[0]
    assert s["lq"].shape == (20, 24, 3)
    assert s["lq_path"].endswith("0.png")


def _write_16bit(path, h, w, seed):
    import cv2

    rng = np.random.default_rng(seed)
    img = (rng.uniform(0, 1, (h, w, 3)) * 65535).astype(np.uint16)
    assert cv2.imwrite(str(path), img)


def test_dual_pixel_dataset_and_teacher(tmp_path):
    pytest.importorskip("cv2")
    for sub in ["lqL", "lqR", "gt"]:
        os.makedirs(tmp_path / sub)
    for i in range(2):
        for sub in ["lqL", "lqR", "gt"]:
            _write_16bit(tmp_path / sub / f"{i}.png", 40, 40,
                         seed=hash((sub, i)) % 1000)
    ds = create_dataset({
        "type": "Dataset_DefocusDeblur_DualPixel_16bit",
        "dataroot_lqL": str(tmp_path / "lqL"),
        "dataroot_lqR": str(tmp_path / "lqR"),
        "dataroot_gt": str(tmp_path / "gt"),
        "phase": "train", "scale": 1, "gt_size": 32,
        "geometric_augs": True, "seed": 0,
    })
    s = ds[0]
    assert s["lq"].shape == (32, 32, 6)  # L and R concatenated
    assert s["gt"].shape == (32, 32, 3)
    assert 0.0 <= s["lq"].min() and s["lq"].max() <= 1.0

    # the dual-pixel teacher consumes 6-channel input (dual_pixel_task)
    model = KDLAETeacher(inp_channels=6, dim=8, num_blocks=(1, 1, 1, 1),
                         num_refinement_blocks=1, heads=(1, 2, 4, 8),
                         layernorm_type="BiasFree", static="test",
                         params="none", dual_pixel_task=True)
    params = model.init(jax.random.PRNGKey(0),
                        {"img": jnp.zeros((1, 32, 32, 6))})["params"]
    out = model.apply({"params": params}, {"img": jnp.asarray(s["lq"][None])})
    assert out["hq"].shape == (1, 32, 32, 3)

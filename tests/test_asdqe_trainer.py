"""ASDQE trainer smoke test on synthetic score triplets."""

import json
import os

import numpy as np

from rethink_acoustic_image_enhancement_tpu.train.asdqe_trainer import (
    ReduceLROnPlateau,
    train_asdqe,
)
from rethink_acoustic_image_enhancement_tpu.utils.image_io import imwrite


def test_plateau_controller():
    p = ReduceLROnPlateau(factor=0.5, patience=1)
    assert p.step(1.0) == 1.0          # new best
    assert p.step(1.0) == 1.0          # bad 1 (<= patience)
    assert p.step(1.0) == 0.5          # bad 2 -> decay
    assert p.step(0.5) == 0.5          # new best resets


def test_train_asdqe_smoke(tmp_path):
    root = tmp_path / "data"
    for sub in ["lq", "gt", "params"]:
        os.makedirs(root / sub)
    for i in range(10):
        rng = np.random.default_rng(i)
        img = (rng.uniform(0, 1, (48, 48, 3)) * 255).astype(np.uint8)
        imwrite(str(root / "lq" / f"{i}.png"), img)
        imwrite(str(root / "gt" / f"{i}.png"),
                np.clip(img + 12, 0, 255).astype(np.uint8))
        (root / "params" / f"{i}.json").write_text(
            json.dumps({"score": float(0.1 * i - 0.4)}))

    result = train_asdqe(
        {"dataroot_lq": str(root / "lq"), "dataroot_gt": str(root / "gt"),
         "dataroot_param": str(root / "params")},
        epochs=2, batch_size=2, accumulation_steps=2, gt_size=48,
        compute_dtype=None, log=lambda m: None, max_steps_per_epoch=3)
    hist = result["history"]
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["train_mse"])
    assert np.isfinite(hist[-1]["val_mse"])
    assert "batch_stats" in result

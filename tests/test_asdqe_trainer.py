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


def test_train_asdqe_h2d_uint8_parity(tmp_path):
    """The uint8 H2D boundary is value-preserving for uint8-decoded
    corpora: the in-jit f32 /255 matches host imread values to <=1 ulp
    (XLA lowers the division differently from numpy — measured 6e-8 max
    over all 256 levels — so bitwise equality is NOT attainable; the
    histories must agree to loss-level tolerance instead)."""
    root = tmp_path / "data"
    for sub in ["lq", "gt", "params"]:
        os.makedirs(root / sub)
    for i in range(8):
        rng = np.random.default_rng(100 + i)
        img = (rng.uniform(0, 1, (40, 40, 3)) * 255).astype(np.uint8)
        imwrite(str(root / "lq" / f"{i}.png"), img)
        imwrite(str(root / "gt" / f"{i}.png"),
                np.clip(img.astype(np.int32) + 9, 0, 255).astype(np.uint8))
        (root / "params" / f"{i}.json").write_text(
            json.dumps({"score": float(0.125 * i)}))

    opt = {"dataroot_lq": str(root / "lq"), "dataroot_gt": str(root / "gt"),
           "dataroot_param": str(root / "params")}
    kw = dict(epochs=1, batch_size=2, accumulation_steps=2, gt_size=40,
              compute_dtype=None, log=lambda m: None, max_steps_per_epoch=2)
    h_u8 = train_asdqe(opt, h2d_uint8=True, **kw)["history"]
    h_f32 = train_asdqe(opt, h2d_uint8=False, **kw)["history"]
    assert abs(h_u8[0]["train_mse"] - h_f32[0]["train_mse"]) < 1e-4
    assert abs(h_u8[0]["val_mse"] - h_f32[0]["val_mse"]) < 5e-3
    assert h_u8[0]["lr_scale"] == h_f32[0]["lr_scale"]


def test_remat_is_exact():
    """remat=True (block-level jax.checkpoint, used by the trainers to
    fit the reference's b32@512 step in HBM) changes NOTHING numerically:
    same param tree, same outputs, same grads, same BN stats update."""
    import jax
    import jax.numpy as jnp

    from rethink_acoustic_image_enhancement_tpu.models.asdqe import (
        DenoiseRatePredictor,
    )

    rng = jax.random.PRNGKey(0)
    lq = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    gt = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    base = DenoiseRatePredictor(remat=False)
    remat = DenoiseRatePredictor(remat=True)
    variables = base.init(rng, lq, gt)
    assert jax.tree.structure(variables) == jax.tree.structure(
        remat.init(rng, lq, gt))

    def loss(model, p):
        out, mut = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            lq, gt, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(3)})
        return jnp.sum(out ** 2), mut["batch_stats"]

    (l0, bs0), g0 = jax.value_and_grad(
        lambda p: loss(base, p), has_aux=True)(variables["params"])
    (l1, bs1), g1 = jax.value_and_grad(
        lambda p: loss(remat, p), has_aux=True)(variables["params"])
    assert float(l0) == float(l1)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), g0, g1)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), bs0, bs1)

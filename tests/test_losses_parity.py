"""Loss parity vs the reference loss classes.

The reference losses live inside the `basicsr` package; we import just the
two modules (loss_util, losses) by file path with the package chain
fabricated, so no heavy basicsr __init__ side effects run.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.losses import build_loss
from tests.conftest import REFERENCE_ROOT, requires_reference


@pytest.fixture(scope="session")
def ref_losses():
    torch = pytest.importorskip("torch")  # noqa: F841
    base = os.path.join(REFERENCE_ROOT, "Train", "basicsr", "models", "losses")

    for name in ["basicsr", "basicsr.models", "basicsr.models.losses"]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)

    def load(mod_name, fname):
        spec = importlib.util.spec_from_file_location(
            mod_name, os.path.join(base, fname))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[mod_name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("basicsr.models.losses.loss_util", "loss_util.py")
    return load("basicsr.models.losses.losses", "losses.py")


def _rand(shape, seed):
    return np.random.default_rng(seed).uniform(size=shape).astype(np.float32)


@requires_reference
@pytest.mark.parametrize("name,kwargs", [
    ("L1Loss", {"loss_weight": 1.0, "reduction": "mean"}),
    ("L1Loss", {"loss_weight": 0.5, "reduction": "sum"}),
    ("MSELoss", {"loss_weight": 1.0, "reduction": "mean"}),
    ("CharbonnierLoss", {}),
    ("PSNRLoss", {"loss_weight": 1.0}),
    ("L1LossSonar", {"loss_weight": 1.0, "reduction": "mean"}),
])
def test_simple_losses(ref_losses, name, kwargs):
    import torch

    pred, target = _rand((2, 3, 8, 8), 0), _rand((2, 3, 8, 8), 1)
    ref = getattr(ref_losses, name)(**kwargs)
    expected = ref(torch.from_numpy(pred), torch.from_numpy(target)).item()
    got = float(build_loss({"type": name, **kwargs})(
        jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)


@requires_reference
def test_l1_loss_sr_parity(ref_losses):
    """Teacher L1-Shadow loss (losses.py:135-194), with and without sr."""
    import torch

    hq_p, hq_t = _rand((2, 3, 8, 8), 0), _rand((2, 3, 8, 8), 1)
    sr_p, sr_t = _rand((2, 3, 16, 16), 2), _rand((2, 3, 16, 16), 3)
    ref = ref_losses.L1LossSr(loss_weight=1.0, reduction="mean")
    loss_fn = build_loss({"type": "L1LossSr", "loss_weight": 1, "reduction": "mean"})

    for sr_pair in [(sr_p, sr_t), (None, None)]:
        pt = {"hq": torch.from_numpy(hq_p),
              "sr": torch.from_numpy(sr_pair[0]) if sr_pair[0] is not None else None}
        tt = {"hq": torch.from_numpy(hq_t),
              "sr": torch.from_numpy(sr_pair[1]) if sr_pair[1] is not None else None}
        expected = ref(pt, tt).item()
        pj = {"hq": jnp.asarray(hq_p),
              "sr": jnp.asarray(sr_pair[0]) if sr_pair[0] is not None else None}
        tj = {"hq": jnp.asarray(hq_t),
              "sr": jnp.asarray(sr_pair[1]) if sr_pair[1] is not None else None}
        np.testing.assert_allclose(float(loss_fn(pj, tj)), expected,
                                   rtol=1e-5, atol=1e-7)


@requires_reference
@pytest.mark.parametrize("reduction", ["mean", "sum", "max"])
def test_video_frames_loss_parity(ref_losses, reduction):
    """Student loss (losses.py:409-526) with KDLAES.yml weights."""
    import torch

    pred, target = _rand((2, 7, 8, 8), 4), _rand((2, 7, 8, 8), 5)
    ref = ref_losses.L1LossForVideoFrames(
        l1loss_weight=0.9, temporal_weight=0.1, reduction=reduction)
    expected = ref(torch.from_numpy(pred), torch.from_numpy(target)).item()
    loss_fn = build_loss({"type": "L1LossForVideoFrames", "l1loss_weight": 0.9,
                          "temporal_weight": 0.1, "reduction": reduction})
    got = float(loss_fn(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)


def test_video_frames_mix_reduction_samples_per_call():
    """'mix' must draw per call (the reference's self-overwrite bug is
    fixed here): both branches reachable, values match mean/max variants."""
    pred, target = _rand((2, 7, 8, 8), 6), _rand((2, 7, 8, 8), 7)
    mix = build_loss({"type": "L1LossForVideoFrames", "reduction": "mix"})
    mean_fn = build_loss({"type": "L1LossForVideoFrames", "reduction": "mean"})
    max_fn = build_loss({"type": "L1LossForVideoFrames", "reduction": "max"})
    vals = sorted({round(float(mix(jnp.asarray(pred), jnp.asarray(target),
                                   rng=jax.random.PRNGKey(i))), 5)
                   for i in range(20)})
    expected = sorted({round(float(mean_fn(jnp.asarray(pred), jnp.asarray(target))), 5),
                       round(float(max_fn(jnp.asarray(pred), jnp.asarray(target))), 5)})
    assert vals == expected  # both branches seen across 20 keys


def test_l2_dice_basics():
    """New L2-Dice variant: zero at perfect prediction, positive otherwise,
    soft mode differentiable."""
    x = jnp.asarray(_rand((1, 8, 8, 3), 8))
    y = jnp.asarray(_rand((1, 8, 8, 3), 9))
    fn = build_loss({"type": "L2Dice"})
    assert float(fn({"hq": x, "sr": None}, {"hq": x, "sr": None})) < 1e-6
    assert float(fn({"hq": x, "sr": None}, {"hq": y, "sr": None})) > 0
    soft = build_loss({"type": "L2Dice", "soft": True})
    g = jax.grad(lambda p: soft({"hq": p, "sr": None}, {"hq": y, "sr": None}))(x)
    assert float(jnp.max(jnp.abs(g))) > 0

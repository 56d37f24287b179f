"""Trainer tests on the 8-virtual-device CPU mesh: schedule parity vs the
reference torch schedulers, progressive stage math, and full train steps
(teacher dict-I/O and student) with sharded batches."""

import importlib.util
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.losses import build_loss
from rethink_acoustic_image_enhancement_tpu.models import KDLAEStudent, KDLAETeacher
from rethink_acoustic_image_enhancement_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
)
from rethink_acoustic_image_enhancement_tpu.train.progressive import (
    ProgressiveSchedule,
)
from rethink_acoustic_image_enhancement_tpu.train.schedules import (
    build_schedule,
    cosine_annealing_restart_cyclic,
)
from rethink_acoustic_image_enhancement_tpu.train.trainer import (
    Trainer,
    build_optimizer,
)
from tests.conftest import REFERENCE_ROOT, requires_reference


def test_eight_virtual_devices():
    assert jax.device_count() == 8


# --------------------------------------------------------------- schedule --

@requires_reference
def test_cosine_restart_cyclic_matches_reference():
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location(
        "ref_lr_sched",
        os.path.join(REFERENCE_ROOT, "Train", "basicsr", "models",
                     "lr_scheduler.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_lr_sched"] = mod
    spec.loader.exec_module(mod)

    base_lr = 3e-4
    periods, weights, etas = [40, 60], [1, 2], [3e-4, 1e-6]
    p = torch.nn.Parameter(torch.zeros(1))
    optim = torch.optim.AdamW([p], lr=base_lr)
    ref = mod.CosineAnnealingRestartCyclicLR(
        optim, periods=periods, restart_weights=weights, eta_mins=etas)

    ours = cosine_annealing_restart_cyclic(base_lr, periods, weights, etas)
    for step in range(100):
        expected = ref.get_lr()[0]
        got = float(ours(step))
        assert got == pytest.approx(expected, rel=1e-5, abs=1e-9), step
        optim.step()
        ref.step()


def test_warmup_override():
    sched = build_schedule(1e-3, {"type": "CosineAnnealingRestartCyclicLR",
                                  "periods": [100], "restart_weights": [1],
                                  "eta_mins": [0.0]}, warmup_iter=10)
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == pytest.approx(5e-4, rel=1e-5)
    assert float(sched(10)) == pytest.approx(
        1e-3 * 0.5 * (1 + np.cos(np.pi * 0.1)), rel=1e-5)


# ------------------------------------------------------------- progressive --

def test_progressive_stage_selection_matches_reference_logic():
    """Mirror of train.py:375-387 with the KDLAET.yml arrays."""
    sched = ProgressiveSchedule(
        iters=[3000, 2000, 1600, 1200, 1200, 800],
        mini_batch_sizes=[6, 6, 2, 1, 1, 1],
        gt_sizes=[32, 64, 96, 128, 128, 128],
        probs=[0.2, 0.1, 0.05, 0.03, 0.02, 0.02],
        gt_size=128, base_prob=0.0,
    )
    groups = np.cumsum([3000, 2000, 1600, 1200, 1200, 800])
    for it in [1, 2999, 3000, 3001, 5000, 5001, 9800, 9801, 50000]:
        j = np.nonzero((it > groups) != True)[0]  # noqa: E712 (reference idiom)
        expected = int(j[0]) if len(j) else len(groups) - 1
        assert sched.stage(it) == expected, it
    assert sched.at(1) == (6, 32, 0.2)
    assert sched.at(50000) == (1, 128, 0.02)
    assert sched.buckets() == [(1, 128), (2, 96), (6, 32), (6, 64)]


# ------------------------------------------------------------- train steps --

def _student_trainer(mesh):
    model = KDLAEStudent(residual=True, hidden_channels=(4, 8))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16)))["params"]
    train_opt = {
        "optim_g": {"type": "AdamW", "lr": 1e-3, "weight_decay": 1e-4,
                    "betas": [0.9, 0.999]},
        "use_grad_clip": True,
        "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                      "periods": [1000], "restart_weights": [1],
                      "eta_mins": [1e-3]},
    }
    schedule = build_schedule(1e-3, train_opt["scheduler"], -1)
    trainer = Trainer(
        apply_fn=lambda p, lq: model.apply({"params": p}, lq),
        loss_fn=build_loss({"type": "L1LossForVideoFrames",
                            "l1loss_weight": 0.9, "temporal_weight": 0.1,
                            "reduction": "mean"}),
        optimizer=build_optimizer(train_opt, schedule),
        schedule=schedule,
        mesh=mesh,
        ema_decay=0.99,
        mixup=False,  # keep the per-step loss comparable across steps
    )
    return trainer, trainer.init_state(params)


def test_student_train_step_descends_on_mesh():
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == 8
    trainer, state = _student_trainer(mesh)

    rng = np.random.default_rng(0)
    clean = rng.uniform(0.2, 0.8, size=(8, 3, 16, 16)).astype(np.float32)
    noisy = np.clip(clean + rng.normal(scale=0.1, size=clean.shape), 0, 1
                    ).astype(np.float32)

    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(20):
        key, sub = jax.random.split(key)
        state, metrics = trainer.step(state, noisy, clean, sub)
        losses.append(float(metrics["l_pix"]))
    assert int(state.step) == 20
    assert np.mean(losses[-3:]) < losses[0]
    assert np.isfinite(losses).all()
    # EMA is live and distinct from params early in training
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         state.params, state.ema_params)
    assert max(jax.tree.leaves(diffs)) > 0


def test_teacher_train_step_dict_io_with_progressive():
    mesh = make_mesh()
    model = KDLAETeacher(dim=8, num_blocks=(1, 1, 1, 1),
                         num_refinement_blocks=1, heads=(1, 2, 4, 8),
                         layernorm_type="BiasFree", static="train", params="cat")
    params = model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 16, 16, 3)),
         "denoise_rate": jnp.zeros((1, 16, 16, 1))})["params"]

    train_opt = {
        "optim_g": {"type": "AdamW", "lr": 1e-5, "weight_decay": 5e-5,
                    "betas": [0.2, 0.999]},
        "use_grad_clip": True,
        "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                      "periods": [100], "restart_weights": [1],
                      "eta_mins": [1e-5]},
    }
    schedule = build_schedule(1e-5, train_opt["scheduler"], -1)
    trainer = Trainer(
        apply_fn=lambda p, lq: model.apply({"params": p}, lq),
        loss_fn=build_loss({"type": "L1LossSr", "loss_weight": 1,
                            "reduction": "mean"}),
        optimizer=build_optimizer(train_opt, schedule),
        schedule=schedule,
        mesh=mesh,
        mixup=True,
        gt_size=32,
    )
    state = trainer.init_state(params)

    rng = np.random.default_rng(1)
    b, hw = 8, 32
    lq = {"img": rng.uniform(size=(b, hw, hw, 3)).astype(np.float32),
          "denoise_rate": np.full((b, hw, hw, 1), 0.6, np.float32)}
    gt = {"hq": rng.uniform(size=(b, hw, hw, 3)).astype(np.float32),
          "sr": rng.uniform(size=(b, 2 * hw, 2 * hw, 3)).astype(np.float32)}

    key = jax.random.PRNGKey(1)
    # stage with sub-crop to 16 and extra masking (exercises all branches)
    state, metrics = trainer.step(state, lq, gt, key,
                                  extra_prob=0.1, mini_gt_size=16)
    assert np.isfinite(float(metrics["l_pix"]))
    assert float(metrics["grad_norm"]) >= 0
    # second step at full size: separate compiled bucket
    state, metrics = trainer.step(state, lq, gt, key, mini_gt_size=32)
    assert int(state.step) == 2
    assert len(trainer._jit_cache) == 2

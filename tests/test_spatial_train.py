"""Spatially-sharded TRAINING (train.spatial_shard): the train step runs
with image rows sharded over the mesh 'spatial' axis — the CP analog from
SURVEY §5.7 applied to training, which is the only way to parallelize the
teacher's batch-1 curriculum stages (KDLAET.yml mini_batch_sizes tail
[1,1,1]) across a pod. Value parity is asserted against the pure
data-parallel step on the 8-virtual-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.losses import build_loss
from rethink_acoustic_image_enhancement_tpu.models import (
    KDLAEStudent,
    KDLAETeacher,
)
from rethink_acoustic_image_enhancement_tpu.parallel.mesh import (
    SPATIAL_AXIS,
    make_mesh,
)
from rethink_acoustic_image_enhancement_tpu.train.schedules import (
    build_schedule,
)
from rethink_acoustic_image_enhancement_tpu.train.trainer import (
    Trainer,
    build_optimizer,
)

_TRAIN_OPT = {
    "optim_g": {"type": "AdamW", "lr": 1e-4, "weight_decay": 1e-4,
                "betas": [0.9, 0.999]},
    "use_grad_clip": True,
    "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                  "periods": [100], "restart_weights": [1],
                  "eta_mins": [1e-6]},
}


def _teacher_trainer(mesh, spatial_axis, gt_size=0):
    model = KDLAETeacher(dim=8, num_blocks=(1, 1, 1, 1),
                         num_refinement_blocks=1, heads=(1, 2, 4, 8),
                         layernorm_type="BiasFree", static="train",
                         params="cat")
    params = model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 16, 16, 3)),
         "denoise_rate": jnp.zeros((1, 16, 16, 1))})["params"]
    schedule = build_schedule(1e-4, _TRAIN_OPT["scheduler"], -1)
    trainer = Trainer(
        apply_fn=lambda p, lq: model.apply({"params": p}, lq),
        loss_fn=build_loss({"type": "L1LossSr", "loss_weight": 1,
                            "reduction": "mean"}),
        optimizer=build_optimizer(_TRAIN_OPT, schedule),
        schedule=schedule,
        mesh=mesh,
        spatial_axis=spatial_axis,
        gt_size=gt_size,
    )
    return trainer, trainer.init_state(params)


def _teacher_batch(b=4, hw=32):
    rng = np.random.default_rng(3)
    lq = {"img": rng.uniform(size=(b, hw, hw, 3)).astype(np.float32),
          "denoise_rate": np.full((b, hw, hw, 1), 0.6, np.float32)}
    gt = {"hq": rng.uniform(size=(b, hw, hw, 3)).astype(np.float32),
          "sr": rng.uniform(size=(b, 2 * hw, 2 * hw, 3)).astype(np.float32)}
    return lq, gt


def _assert_step_parity(m_dp, m_sp, st_dp, st_sp, lr=1e-4):
    """Loss and global grad norm must match tightly (these would be
    wildly off under any real sharding bug — wrong axis, missing psum).
    Post-Adam params are compared with atol 3*lr: sharded reductions
    perturb near-zero grads by ~1e-7, and Adam's rsqrt normalization
    turns that into a full +-lr sign-flip on a handful of elements —
    fp32 layout noise, not divergence."""
    np.testing.assert_allclose(float(m_sp["l_pix"]), float(m_dp["l_pix"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_sp["grad_norm"]),
                               float(m_dp["grad_norm"]), rtol=1e-4)
    for x, y in zip(jax.tree.leaves(jax.device_get(st_dp.params)),
                    jax.tree.leaves(jax.device_get(st_sp.params))):
        np.testing.assert_allclose(x, y, rtol=5e-3, atol=3 * lr)


def test_teacher_spatial_step_matches_data_parallel():
    """One teacher step on a 4x2 (data x spatial) mesh equals the same
    step on the pure data mesh (the sharding is a layout choice, not a
    numerics choice)."""
    lq, gt = _teacher_batch()
    key = jax.random.PRNGKey(7)

    tr_dp, st_dp = _teacher_trainer(make_mesh(n_data=8), None)
    st_dp, m_dp = tr_dp.step(st_dp, lq, gt, key)

    mesh = make_mesh(n_data=4, n_spatial=2)
    tr_sp, st_sp = _teacher_trainer(mesh, 1)
    # the batch spec actually carries the spatial axis
    spec = tr_sp._shard_like(lq)
    assert SPATIAL_AXIS in spec["img"].spec
    st_sp, m_sp = tr_sp.step(st_sp, lq, gt, key)

    assert np.isfinite(m_sp["l_pix"])
    _assert_step_parity(m_dp, m_sp, st_dp, st_sp)


def test_teacher_spatial_step_batch_one():
    """Batch 1 (the teacher's late curriculum stages): data parallelism
    cannot split it, the spatial axis can. Uses a 1x4 mesh so ALL
    parallelism is spatial. 64px keeps >= 1 row/shard at the latent
    level (teacher downsamples 8x) — XLA's SPMD conv grads require it
    (over-sharding silently zeroes dwconv grads; build_everything
    fail-fasts on that config, test below)."""
    lq, gt = _teacher_batch(b=1, hw=64)
    key = jax.random.PRNGKey(9)

    tr_dp, st_dp = _teacher_trainer(make_mesh(n_data=8), None)
    st_dp, m_dp = tr_dp.step(st_dp, lq, gt, key)

    mesh = make_mesh(n_data=1, n_spatial=4, devices=jax.devices()[:4])
    tr_sp, st_sp = _teacher_trainer(mesh, 1)
    st_sp, m_sp = tr_sp.step(st_sp, lq, gt, key)

    _assert_step_parity(m_dp, m_sp, st_dp, st_sp)


def test_student_spatial_axis_two():
    """Student stacks are (B, F, H, W): H is axis 2. The step must shard
    H (not the frame axis) and keep descending."""
    model = KDLAEStudent(residual=True, hidden_channels=(4, 8))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 7, 16, 16)))["params"]
    schedule = build_schedule(1e-4, _TRAIN_OPT["scheduler"], -1)
    mesh = make_mesh(n_data=2, n_spatial=4)
    trainer = Trainer(
        apply_fn=lambda p, lq: model.apply({"params": p}, lq),
        loss_fn=build_loss({"type": "L1Loss", "loss_weight": 1,
                            "reduction": "mean"}),
        optimizer=build_optimizer(_TRAIN_OPT, schedule),
        schedule=schedule,
        mesh=mesh,
        spatial_axis=2,
    )
    state = trainer.init_state(params)
    rng = np.random.default_rng(0)
    clean = rng.uniform(0.2, 0.8, size=(2, 7, 32, 32)).astype(np.float32)
    noisy = np.clip(clean + rng.normal(scale=0.1, size=clean.shape),
                    0, 1).astype(np.float32)
    spec = trainer._shard_like(noisy)
    assert spec.spec[2] == SPATIAL_AXIS and spec.spec[1] is None

    losses = []
    key = jax.random.PRNGKey(0)
    for _ in range(10):
        key, sub = jax.random.split(key)
        state, metrics = trainer.step(state, noisy, clean, sub)
        losses.append(float(metrics["l_pix"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < losses[0]


def test_spatial_shard_config_key(tmp_path):
    """train.spatial_shard reaches the Trainer through build_everything
    (mesh 4x2 on the 8 CPU devices; NHWC nets get spatial_axis=1)."""
    from rethink_acoustic_image_enhancement_tpu.train.loop import (
        build_everything,
    )

    opt = {
        "name": "spatial_smoke",
        "model_type": "ImageCleanModel",
        "scale": 1,
        "manual_seed": 0,
        "is_train": True,
        "datasets": {"train": {
            "name": "t", "type": "Dataset_PairedImage",
            "dataroot_gt": str(tmp_path), "dataroot_lq": str(tmp_path),
            "io_backend": {"type": "disk"}, "gt_size": 32,
            "batch_size_per_gpu": 4, "phase": "train",
        }},
        "network_g": {"type": "KDLAE_teacher", "inp_channels": 3,
                      "out_channels": 3, "dim": 8,
                      "num_blocks": [1, 1, 1, 1],
                      "num_refinement_blocks": 1, "heads": [1, 2, 4, 8],
                      "ffn_expansion_factor": 2.66, "bias": False,
                      "LayerNorm_type": "BiasFree",
                      "dual_pixel_task": False, "static": "train",
                      "params": "cat"},
        "path": {},
        "train": {
            "total_iter": 10, "warmup_iter": -1, "use_grad_clip": True,
            "spatial_shard": 2,
            "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                          "periods": [10], "restart_weights": [1],
                          "eta_mins": [1e-6]},
            "optim_g": {"type": "AdamW", "lr": 1e-4,
                        "weight_decay": 1e-4, "betas": [0.9, 0.999]},
            "pixel_opt": {"type": "L1LossSr", "loss_weight": 1,
                          "reduction": "mean"},
        },
    }
    model, params, trainer, schedule = build_everything(opt)
    assert trainer.spatial_axis == 1
    assert dict(trainer.mesh.shape)[SPATIAL_AXIS] == 2

    # over-sharding the deepest feature map (gt 32 / 8x downsample = 4
    # rows < 8 shards) must fail fast, not silently zero conv grads
    import pytest

    opt["train"]["spatial_shard"] = 8
    with pytest.raises(ValueError, match="over-shards"):
        build_everything(opt)


def test_model_shard_config_key(tmp_path):
    """train.model_shard reaches the Trainer through build_everything:
    2x1x4 mesh on the 8 CPU devices, the model swapped to the shift-add
    depthwise form (grouped-conv kernel grads miscompile on a 'model'
    mesh axis — parallel/mesh.py SECOND DEFECT), and combining with
    spatial_shard fails fast."""
    import pytest

    from rethink_acoustic_image_enhancement_tpu.parallel.mesh import (
        MODEL_AXIS,
    )
    from rethink_acoustic_image_enhancement_tpu.train.loop import (
        build_everything,
    )

    opt = {
        "name": "model_shard_smoke",
        "model_type": "ImageCleanModel",
        "scale": 1,
        "manual_seed": 0,
        "is_train": True,
        "datasets": {"train": {
            "name": "t", "type": "Dataset_PairedImage",
            "dataroot_gt": str(tmp_path), "dataroot_lq": str(tmp_path),
            "io_backend": {"type": "disk"}, "gt_size": 32,
            "batch_size_per_gpu": 4, "phase": "train",
        }},
        "network_g": {"type": "KDLAE_teacher", "inp_channels": 3,
                      "out_channels": 3, "dim": 8,
                      "num_blocks": [1, 1, 1, 1],
                      "num_refinement_blocks": 1, "heads": [1, 2, 4, 8],
                      "ffn_expansion_factor": 2.66, "bias": False,
                      "LayerNorm_type": "BiasFree",
                      "dual_pixel_task": False, "static": "train",
                      "params": "cat"},
        "path": {},
        "train": {
            "total_iter": 10, "warmup_iter": -1, "use_grad_clip": True,
            "model_shard": 4,
            "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                          "periods": [10], "restart_weights": [1],
                          "eta_mins": [1e-6]},
            "optim_g": {"type": "AdamW", "lr": 1e-4,
                        "weight_decay": 1e-4, "betas": [0.9, 0.999]},
            "pixel_opt": {"type": "L1LossSr", "loss_weight": 1,
                          "reduction": "mean"},
        },
    }
    model, params, trainer, schedule = build_everything(opt)
    assert dict(trainer.mesh.shape)[MODEL_AXIS] == 4
    assert model.dwconv_shift is True

    opt["train"]["spatial_shard"] = 2
    with pytest.raises(ValueError, match="cannot be combined"):
        build_everything(opt)


def test_student_model_shard_step_matches_data_parallel():
    """Student TP training (train.model_shard on KDLAE_student): the
    student has NO grouped convs, so the grouped-conv gradient defect
    (parallel/mesh.py SECOND DEFECT) cannot bite and the plain model is
    safe under a 'model' mesh axis — this guards that claim with the
    same step-parity bar as the teacher tests."""
    from rethink_acoustic_image_enhancement_tpu.parallel.mesh import (
        MODEL_AXIS,
    )

    model = KDLAEStudent(residual=True, hidden_channels=(8, 16))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 7, 16, 16)))["params"]
    schedule = build_schedule(1e-4, _TRAIN_OPT["scheduler"], -1)

    def make(mesh):
        tr = Trainer(
            apply_fn=lambda p, lq: model.apply({"params": p}, lq),
            loss_fn=build_loss({"type": "L1Loss", "loss_weight": 1,
                                "reduction": "mean"}),
            optimizer=build_optimizer(_TRAIN_OPT, schedule),
            schedule=schedule,
            mesh=mesh,
        )
        return tr, tr.init_state(jax.tree.map(np.copy, params))

    rng = np.random.default_rng(0)
    clean = rng.uniform(0.2, 0.8, size=(4, 7, 32, 32)).astype(np.float32)
    noisy = np.clip(clean + rng.normal(scale=0.1, size=clean.shape),
                    0, 1).astype(np.float32)
    key = jax.random.PRNGKey(1)

    tr_dp, st_dp = make(make_mesh(n_data=8))
    st_dp, m_dp = tr_dp.step(st_dp, noisy, clean, key)

    tr_tp, st_tp = make(make_mesh(n_data=2, n_model=4))
    ks = [k for k in jax.tree.leaves(
        jax.tree.map(lambda x: tuple(x.sharding.spec), st_tp.params),
        is_leaf=lambda x: isinstance(x, tuple)) if MODEL_AXIS in k]
    assert ks, "no student leaf actually sharded over the model axis"
    st_tp, m_tp = tr_tp.step(st_tp, noisy, clean, key)

    _assert_step_parity(m_dp, m_tp, st_dp, st_tp)

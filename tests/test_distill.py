"""Distillation flow tests: offline corpus pass + online target fn feeding
a student train step."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.eval.infer import TeacherPredictor
from rethink_acoustic_image_enhancement_tpu.losses import build_loss
from rethink_acoustic_image_enhancement_tpu.models import KDLAEStudent, KDLAETeacher
from rethink_acoustic_image_enhancement_tpu.train.distill import (
    generate_teacher_targets,
    make_online_target_fn,
)
from rethink_acoustic_image_enhancement_tpu.train.schedules import build_schedule
from rethink_acoustic_image_enhancement_tpu.train.trainer import (
    Trainer,
    build_optimizer,
)
from rethink_acoustic_image_enhancement_tpu.utils.image_io import imwrite


def _tiny_teacher():
    model = KDLAETeacher(dim=8, num_blocks=(1, 1, 1, 1),
                         num_refinement_blocks=1, heads=(1, 2, 4, 8),
                         layernorm_type="BiasFree", static="test",
                         params="cat")
    params = model.init(
        jax.random.PRNGKey(0),
        {"img": jnp.zeros((1, 16, 16, 3)),
         "denoise_rate": jnp.zeros((1, 16, 16, 1))})["params"]
    return model, params


def test_generate_teacher_targets(tmp_path):
    model, params = _tiny_teacher()
    pred = TeacherPredictor(params=params, model=model)
    lq_dir = tmp_path / "noisy"
    os.makedirs(lq_dir)
    for i in range(3):
        img = (np.random.default_rng(i).uniform(0, 1, (40, 56, 3)) * 255
               ).astype(np.uint8)
        imwrite(str(lq_dir / f"{i}_x.png"), img)
    out_dir = tmp_path / "targets"
    n = generate_teacher_targets(pred, str(lq_dir), str(out_dir),
                                 log=lambda m: None)
    assert n == 3
    assert sorted(os.listdir(out_dir)) == [f"{i}_x.png" for i in range(3)]


def test_online_distillation_step():
    teacher, t_params = _tiny_teacher()
    target_fn = make_online_target_fn(teacher, t_params, denoise_rate=1.0,
                                      dtype=jnp.float32)
    lq = jnp.asarray(np.random.default_rng(0).uniform(
        size=(8, 3, 16, 16)).astype(np.float32))
    targets = target_fn(lq)
    assert targets.shape == lq.shape
    assert np.isfinite(np.asarray(targets)).all()

    student = KDLAEStudent(residual=True, hidden_channels=(4, 8))
    s_params = student.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 16, 16)))["params"]
    train_opt = {
        "optim_g": {"type": "AdamW", "lr": 1e-3, "weight_decay": 0.0,
                    "betas": [0.9, 0.999]},
        "use_grad_clip": True,
        "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                      "periods": [10], "restart_weights": [1],
                      "eta_mins": [1e-3]},
    }
    schedule = build_schedule(1e-3, train_opt["scheduler"], -1)
    trainer = Trainer(
        apply_fn=lambda p, x: student.apply({"params": p}, x),
        loss_fn=build_loss({"type": "L1LossForVideoFrames",
                            "l1loss_weight": 0.9, "temporal_weight": 0.1,
                            "reduction": "mean"}),
        optimizer=build_optimizer(train_opt, schedule),
        schedule=schedule,
    )
    state = trainer.init_state(s_params)
    state, metrics = trainer.step(state, np.asarray(lq), np.asarray(targets),
                                  jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["l_pix"]))
    assert int(state.step) == 1


def test_config_driven_online_distillation(tmp_path):
    """train.distill {online: true} wires a frozen teacher into
    train_from_config: student trains against teacher targets without a
    materialized corpus (new capability; reference distills offline only,
    KDLAES.yml:16)."""
    import yaml

    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        save_weights,
    )
    from rethink_acoustic_image_enhancement_tpu.train.config import (
        make_exp_dirs,
        parse,
    )
    from rethink_acoustic_image_enhancement_tpu.train.loop import (
        train_from_config,
    )

    from test_train_loop import _student_config, _write_frames

    teacher_cfg = {
        "type": "KDLAE_teacher", "inp_channels": 3, "out_channels": 3,
        "dim": 8, "num_blocks": [1, 1, 1, 1], "num_refinement_blocks": 1,
        "heads": [1, 2, 4, 8], "ffn_expansion_factor": 2.66, "bias": False,
        "LayerNorm_type": "BiasFree", "static": "test", "params": "cat",
    }
    _, t_params = _tiny_teacher()
    weights_path = save_weights(str(tmp_path / "teacher"), 0,
                                jax.device_get(t_params))

    _write_frames(tmp_path / "data")
    cfg = _student_config(tmp_path)
    cfg["name"] = "online_distill_student"
    cfg["train"]["distill"] = {
        "online": True,
        "teacher": teacher_cfg,
        "teacher_weights": weights_path,
        "denoise_rate": 1.0,
    }
    path = tmp_path / "opt.yml"
    path.write_text(yaml.safe_dump(cfg))
    opt = parse(str(path), is_train=True, root_path=str(tmp_path))
    make_exp_dirs(opt)

    logs = []
    state = train_from_config(opt, max_iters=3, log_fn=logs.append)
    assert int(state.step) == 3
    assert any("online distillation" in m for m in logs)

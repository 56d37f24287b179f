"""End-to-end config-driven training smoke tests: YAML -> dataloader ->
compiled steps -> checkpoints -> auto-resume, on the CPU mesh."""

import os

import numpy as np
import pytest
import yaml

import jax

from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
    find_latest_checkpoint,
    load_weights,
)
from rethink_acoustic_image_enhancement_tpu.train.config import (
    make_exp_dirs,
    parse,
    validate,
)
from rethink_acoustic_image_enhancement_tpu.train.loop import train_from_config
from rethink_acoustic_image_enhancement_tpu.utils.image_io import imwrite


def _write_frames(root, n=20, h=40, w=48):
    for sub in ["lq", "gt"]:
        os.makedirs(root / sub, exist_ok=True)
    for i in range(n):
        rng = np.random.default_rng(i)
        img = (rng.uniform(0.1, 0.9, size=(h, w)) * 255).astype(np.uint8)
        imwrite(str(root / "lq" / f"{i}_f.png"), img, rgb=False)
        imwrite(str(root / "gt" / f"{i}_f.png"), img, rgb=False)


def _student_config(tmp_path) -> dict:
    cfg = {
        "name": "smoke_student",
        "model_type": "ImageCleanModel",
        "scale": 1,
        "manual_seed": 100,
        "datasets": {
            "train": {
                "name": "TrainSet",
                "type": "Dataset_PairedMutiImage",
                "dataroot_gt": str(tmp_path / "data" / "gt"),
                "dataroot_lq": str(tmp_path / "data" / "lq"),
                "geometric_augs": True,
                "num_pairs": 5,
                "stride_range": [1, 1],
                "io_backend": {"type": "disk"},
                "use_shuffle": True,
                "num_worker_per_gpu": 2,
                "batch_size_per_gpu": 8,
                "mini_batch_sizes": [8, 8],
                "iters": [6, 6],
                "gt_size": 32,
                "gt_sizes": [16, 32],
                "prob": 0.0,
                "probs": [0.1, 0.2],
                "dataset_enlarge_ratio": 1,
            },
        },
        "network_g": {
            "type": "KDLAE_student",
            "inp_channels": 1,
            "out_channels": 1,
            "residual": True,
            "hidden_channels": [4, 8],
        },
        "path": {"pretrain_network_g": None, "strict_load_g": False,
                 "resume_state": "auto"},
        "train": {
            "total_iter": 12,
            "warmup_iter": 2,
            "use_grad_clip": True,
            # exercises the stall-watchdog wiring (generous timeout: the
            # smoke must never trip it; the trip path is unit-tested in
            # test_watchdog.py)
            "stall_timeout_s": 600,
            "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                          "periods": [6, 6], "restart_weights": [1, 1],
                          "eta_mins": [0.0003, 0.000001]},
            "mixing_augs": {"mixup": True, "mixup_beta": 1.2,
                            "use_identity": True},
            "optim_g": {"type": "AdamW", "lr": 3e-4, "weight_decay": 1e-4,
                        "betas": [0.9, 0.999]},
            "pixel_opt": {"type": "L1LossForVideoFrames",
                          "l1loss_weight": 0.9, "temporal_weight": 0.1,
                          "reduction": "mean"},
        },
        "logger": {"print_freq": 4, "save_checkpoint_freq": 6},
        "val": {"val_freq": 0},
    }
    return cfg


def test_config_parse_and_validate(tmp_path):
    cfg = _student_config(tmp_path)
    path = tmp_path / "opt.yml"
    path.write_text(yaml.safe_dump(cfg))
    opt = parse(str(path), is_train=True, root_path=str(tmp_path))
    assert opt["datasets"]["train"]["phase"] == "train"
    assert opt["datasets"]["train"]["scale"] == 1
    assert opt["path"]["experiments_root"].endswith("experiments/smoke_student")
    validate(opt)

    bad = dict(cfg, network_g={"type": "RestormerSuperResolutionTeacher"})
    bad_path = tmp_path / "bad.yml"
    bad_path.write_text(yaml.safe_dump(bad))
    with pytest.raises(KeyError):
        validate(parse(str(bad_path), True, root_path=str(tmp_path)))


def test_train_loop_and_auto_resume(tmp_path):
    _write_frames(tmp_path / "data")
    cfg = _student_config(tmp_path)
    path = tmp_path / "opt.yml"
    path.write_text(yaml.safe_dump(cfg))
    opt = parse(str(path), is_train=True, root_path=str(tmp_path))
    make_exp_dirs(opt)

    state = train_from_config(opt, max_iters=8, log_fn=lambda m: None)
    assert int(state.step) == 8
    states_dir = opt["path"]["training_states"]
    assert find_latest_checkpoint(states_dir) == 8

    # weights-only artifact exists and loads
    params = load_weights(os.path.join(opt["path"]["models"], "net_g_8"))
    leaves = jax.tree.leaves(params)
    assert len(leaves) > 0

    # resume continues from 8 and finishes at 12
    state2 = train_from_config(opt, log_fn=lambda m: None)
    assert int(state2.step) == 12
    assert find_latest_checkpoint(states_dir) == 12


def test_pretrain_from_own_orbax_dir(tmp_path):
    """Variant fine-tunes chain from our own saved weights dirs: the
    orbax branch of the pretrain loader must unwrap single-key payloads
    (a dir saved as {'params': tree} requested with param_key
    'params_ema' burned a full L2-Dice training segment by silently
    merging nothing) and must hard-fail when the merge matches zero
    leaves instead of 'fine-tuning' from random init."""
    from rethink_acoustic_image_enhancement_tpu.train.loop import (
        build_everything,
    )

    _write_frames(tmp_path / "data")
    cfg = _student_config(tmp_path)
    path = tmp_path / "opt.yml"
    path.write_text(yaml.safe_dump(cfg))
    opt = parse(str(path), is_train=True, root_path=str(tmp_path))
    make_exp_dirs(opt)
    train_from_config(opt, max_iters=2, log_fn=lambda m: None)
    weights_dir = os.path.join(opt["path"]["models"], "net_g_2")
    source = load_weights(weights_dir)

    cfg2 = _student_config(tmp_path)
    cfg2["name"] = "smoke_student_ft"
    # the trap: dir payload only has 'params'; ask for 'params_ema'
    cfg2["path"] = {"pretrain_network_g": weights_dir,
                    "param_key": "params_ema", "strict_load_g": False,
                    "resume_state": None}
    p2 = tmp_path / "opt2.yml"
    p2.write_text(yaml.safe_dump(cfg2))
    opt2 = parse(str(p2), is_train=True, root_path=str(tmp_path))
    make_exp_dirs(opt2)
    _, ft_params, _, _ = build_everything(opt2)
    got = jax.device_get(ft_params)
    want = jax.device_get(source)
    flat_got = dict(jax.tree_util.tree_flatten_with_path(got)[0])
    for k, v in jax.tree_util.tree_flatten_with_path(want)[0]:
        np.testing.assert_array_equal(np.asarray(flat_got[k]),
                                      np.asarray(v), err_msg=str(k))

    # a merge that matches (almost) nothing must raise, not proceed
    from rethink_acoustic_image_enhancement_tpu.train.checkpoints import (
        merge_params_nonstrict,
    )

    tgt = {"a": {"kernel": np.zeros((3, 3))}, "b": {"bias": np.zeros(4)}}
    src = {"params": tgt}  # wrapper mistaken for the tree itself
    with pytest.raises(ValueError, match="matched only 0 of 2"):
        merge_params_nonstrict(tgt, src, min_matched=1)


def test_profile_steps_capture(tmp_path):
    """profile_steps captures a device trace into <log>/profile and logs
    an hlo_category summary (§5.1 observability)."""
    from rethink_acoustic_image_enhancement_tpu.utils.profiling import (
        aggregate_trace,
    )

    _write_frames(tmp_path / "data")
    cfg = _student_config(tmp_path)
    cfg["name"] = "smoke_profile"
    path = tmp_path / "opt.yml"
    path.write_text(yaml.safe_dump(cfg))
    opt = parse(str(path), is_train=True, root_path=str(tmp_path))
    make_exp_dirs(opt)

    logs = []
    train_from_config(opt, max_iters=8, log_fn=logs.append, profile_steps=2)
    prof_dir = os.path.join(opt["path"]["log"], "profile")
    assert os.path.isdir(prof_dir)
    assert any("profile (ms by hlo_category" in m for m in logs)
    agg = aggregate_trace(prof_dir)
    assert isinstance(agg, dict)


def test_validation_uses_ema_params(tmp_path, monkeypatch):
    """Periodic validation must run on the EMA weights when EMA is on —
    the reference tests with net_g_ema (image_restoration_model.py:242)."""
    import rethink_acoustic_image_enhancement_tpu.train.loop as loop_mod

    _write_frames(tmp_path / "data")
    cfg = _student_config(tmp_path)
    cfg["name"] = "smoke_ema_val"
    cfg["train"]["ema_decay"] = 0.999
    cfg["datasets"]["val"] = {
        "name": "ValSet",
        "type": "Dataset_PairedMutiImage",
        "dataroot_gt": str(tmp_path / "data" / "gt"),
        "dataroot_lq": str(tmp_path / "data" / "lq"),
        "num_pairs": 5,
        "stride_range": [1, 1],
        "io_backend": {"type": "disk"},
    }
    cfg["val"] = {"val_freq": 2, "window_size": 4,
                  "metrics": {"psnr": {"type": "calculate_psnr",
                                       "crop_border": 0}}}
    path = tmp_path / "opt.yml"
    path.write_text(yaml.safe_dump(cfg))
    opt = parse(str(path), is_train=True, root_path=str(tmp_path))
    make_exp_dirs(opt)

    captured = {}

    def fake_validate(model, params, loader, vopt, **kw):
        captured["params"] = jax.device_get(params)
        return {"psnr": 0.0}

    monkeypatch.setattr(loop_mod, "validate_model", fake_validate)
    state = train_from_config(opt, max_iters=2, log_fn=lambda m: None)

    assert "params" in captured
    ema = jax.device_get(state.ema_params)
    raw = jax.device_get(state.params)
    for a, b in zip(jax.tree.leaves(captured["params"]), jax.tree.leaves(ema)):
        np.testing.assert_array_equal(a, b)
    # and EMA really differs from the raw params after 2 steps
    assert any(not np.array_equal(a, b) for a, b in
               zip(jax.tree.leaves(ema), jax.tree.leaves(raw)))

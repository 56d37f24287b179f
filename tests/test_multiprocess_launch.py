"""Real multi-host launch: 2 OS processes, jax.distributed over localhost,
rank-sharded data feeding one global-batch train step, identical final
params on every process.

This is the reachable analog of the reference's
``torchrun --nproc_per_node=2 train.py --launcher pytorch``
(Train/train.sh:1-5 -> basicsr/utils/dist_util.py:10-58): the coordinator
handshake comes from the same torchrun-style env (RANK / WORLD_SIZE /
MASTER_ADDR / MASTER_PORT) via ``parallel.detect_launch_env``, gradients
sync through XLA collectives (gloo on CPU, ICI on TPU pods) instead of
NCCL.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from rethink_acoustic_image_enhancement_tpu.parallel import init_distributed

# torchrun-style env (RANK/WORLD_SIZE/MASTER_ADDR/MASTER_PORT) autodetected.
# Generous heartbeat: this test box has ONE cpu core and XLA compiles can
# starve the coordination heartbeat thread for minutes.
assert init_distributed(heartbeat_timeout_seconds=900), \
    "expected a multi-process launch env"
assert jax.process_count() == 2, jax.process_count()

import numpy as np
from rethink_acoustic_image_enhancement_tpu.train.config import parse, validate
from rethink_acoustic_image_enhancement_tpu.train.loop import train_from_config

opt = parse({cfg!r})
validate(opt)
state = train_from_config(opt)
flat = jax.tree.leaves(jax.device_get(state.params))
vec = np.concatenate([np.ravel(np.asarray(x)) for x in flat])
np.save({out!r} + f"_rank{{jax.process_index()}}.npy", vec)
print("rank", jax.process_index(), "done, step", int(state.step))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_launch_trains_to_identical_params(tmp_path):
    pytest.importorskip("cv2")
    from rethink_acoustic_image_enhancement_tpu.utils.image_io import imwrite

    rng = np.random.default_rng(0)
    for sub in ("lq", "gt"):
        os.makedirs(tmp_path / sub, exist_ok=True)
    for i in range(16):
        img = rng.integers(0, 256, (40, 48), dtype=np.uint8)
        imwrite(str(tmp_path / "gt" / f"{i}_f.png"), img, rgb=False)
        imwrite(str(tmp_path / "lq" / f"{i}_f.png"),
                np.clip(img + rng.normal(0, 20, img.shape), 0, 255
                        ).astype(np.uint8), rgb=False)

    cfg = {
        "name": "smoke_multihost", "model_type": "ImageCleanModel",
        "scale": 1, "manual_seed": 0, "is_train": True,
        "datasets": {"train": {
            "name": "TrainSet", "type": "Dataset_PairedMutiImage",
            "dataroot_lq": str(tmp_path / "lq"),
            "dataroot_gt": str(tmp_path / "gt"),
            "io_backend": {"type": "disk"}, "gt_size": 16,
            "num_pairs": 3, "stride_range": [1, 1], "prob": 0.0,
            "geometric_augs": False, "use_shuffle": True,
            "num_worker_per_gpu": 1, "batch_size_per_gpu": 2,  # per process
            "dataset_enlarge_ratio": 2,
        }},
        "network_g": {"type": "KDLAE_student", "inp_channels": 1,
                      "out_channels": 1, "residual": True,
                      "hidden_channels": [4, 8]},
        "path": {"pretrain_network_g": None, "resume_state": None,
                 "models": str(tmp_path / "m"),
                 "training_states": str(tmp_path / "s"),
                 "log": str(tmp_path / "log")},
        "train": {"total_iter": 3, "warmup_iter": -1, "use_grad_clip": True,
                  "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                                "periods": [3], "restart_weights": [1],
                                "eta_mins": [1e-4]},
                  "optim_g": {"type": "AdamW", "lr": 1e-3,
                              "weight_decay": 0.0, "betas": [0.9, 0.999]},
                  "pixel_opt": {"type": "L1Loss", "loss_weight": 1,
                                "reduction": "mean"}},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 0},
    }
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    out = str(tmp_path / "params")
    driver = _DRIVER.format(repo=REPO, cfg=cfg_path, out=out)
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ,
                   RANK=str(rank), WORLD_SIZE="2",
                   MASTER_ADDR="127.0.0.1", MASTER_PORT=str(port),
                   JAX_PLATFORMS="")
        # conftest forces 8 virtual devices per process for the mesh
        # tests; here each process is one single-device "host"
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", driver], env=env, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-3000:]

    v0 = np.load(out + "_rank0.npy")
    v1 = np.load(out + "_rank1.npy")
    # gradients all-reduced by XLA -> bitwise-identical updates everywhere
    np.testing.assert_array_equal(v0, v1)
    assert np.all(np.isfinite(v0))
    # the final checkpoint was written (parse() synthesizes the
    # experiments/<name> layout under the drivers' cwd)
    states = tmp_path / "experiments" / "smoke_multihost" / "training_states"
    assert any(p.name.startswith("ckpt_") for p in states.iterdir())


def test_detect_launch_env_variants(monkeypatch):
    from rethink_acoustic_image_enhancement_tpu.parallel import (
        detect_launch_env,
    )

    for var in ("RANK", "WORLD_SIZE", "MASTER_ADDR", "MASTER_PORT",
                "SLURM_PROCID", "SLURM_NTASKS", "SLURM_STEP_NODELIST"):
        monkeypatch.delenv(var, raising=False)
    assert detect_launch_env() == {}

    monkeypatch.setenv("RANK", "3")
    monkeypatch.setenv("WORLD_SIZE", "8")
    monkeypatch.setenv("MASTER_ADDR", "host0")
    monkeypatch.setenv("MASTER_PORT", "12345")
    assert detect_launch_env() == {"coordinator_address": "host0:12345",
                                   "num_processes": 8, "process_id": 3}

    monkeypatch.delenv("RANK")
    monkeypatch.delenv("WORLD_SIZE")
    monkeypatch.setenv("SLURM_PROCID", "1")
    monkeypatch.setenv("SLURM_NTASKS", "4")
    assert detect_launch_env()["process_id"] == 1

    # bracketed nodelists need an explicit MASTER_ADDR
    monkeypatch.delenv("MASTER_ADDR")
    monkeypatch.delenv("MASTER_PORT")
    monkeypatch.setenv("SLURM_STEP_NODELIST", "node[0-3]")
    assert detect_launch_env() == {}
    monkeypatch.setenv("SLURM_STEP_NODELIST", "node7")
    assert detect_launch_env()["coordinator_address"] == "node7:29500"

"""YAML experiment configs — same surface as the reference's Options files.

Port of Train/basicsr/utils/options.py: ``parse(opt_path, is_train)``
returns a nested dict with phase/scale injected per dataset, experiment
(train) or results (test) paths synthesized, and the ``debug`` name
shortcut. Unlike the reference (string-typed dynamic instantiation that
fails mid-run on dead names, SURVEY.md §5.6), ``validate()`` checks model /
dataset / loss / scheduler names against the registries up front.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any

import yaml


def parse(opt_path: str, is_train: bool = True,
          root_path: str | None = None) -> dict[str, Any]:
    with open(opt_path) as f:
        opt = yaml.safe_load(f)

    opt["is_train"] = is_train

    # datasets: inject phase + scale (options.py:48-57)
    for phase, dataset in (opt.get("datasets") or {}).items():
        phase_name = phase.split("_")[0]
        dataset["phase"] = dataset.get("phase", phase_name)
        if "scale" in opt:
            dataset["scale"] = opt["scale"]
        if dataset.get("dataroot_gt") is not None:
            dataset["dataroot_gt"] = osp.expanduser(dataset["dataroot_gt"])
        if dataset.get("dataroot_lq") is not None:
            dataset["dataroot_lq"] = osp.expanduser(dataset["dataroot_lq"])

    # paths (options.py:59-89)
    opt.setdefault("path", {})
    for key, val in opt["path"].items():
        if val is not None and ("resume_state" in key or "pretrain" in key):
            opt["path"][key] = osp.expanduser(val)
    root = root_path or os.getcwd()
    opt["path"]["root"] = root
    if is_train:
        exp_root = osp.join(root, "experiments", opt["name"])
        opt["path"]["experiments_root"] = exp_root
        opt["path"]["models"] = osp.join(exp_root, "models")
        opt["path"]["training_states"] = osp.join(exp_root, "training_states")
        opt["path"]["log"] = exp_root
        opt["path"]["visualization"] = osp.join(exp_root, "visualization")
        if "debug" in opt["name"]:  # debug shortcut (options.py:77-82)
            train = opt.get("train", {})
            opt.setdefault("val", {})["val_freq"] = 8
            opt.setdefault("logger", {})["print_freq"] = 1
            opt["logger"]["save_checkpoint_freq"] = 8
    else:
        results_root = osp.join(root, "results", opt["name"])
        opt["path"]["results_root"] = results_root
        opt["path"]["log"] = results_root
        opt["path"]["visualization"] = osp.join(results_root, "visualization")

    return opt


def validate(opt: dict[str, Any]) -> None:
    """Fail fast on dead component names (the reference would raise deep
    inside training — e.g. the shipped 01_2 config references a nonexistent
    arch class, SURVEY.md §5.6)."""
    from ..data.datasets import DATASETS, validate_dataset_opt
    from ..losses import _REGISTRY as LOSSES
    from ..models import REGISTRY as MODELS

    net = opt.get("network_g", {})
    if net.get("type") not in MODELS:
        raise KeyError(f"network_g.type {net.get('type')!r} not in "
                       f"{sorted(MODELS)}")
    for phase, ds in (opt.get("datasets") or {}).items():
        if ds.get("type") not in DATASETS:
            raise KeyError(f"datasets.{phase}.type {ds.get('type')!r} not in "
                           f"{sorted(DATASETS)}")
        validate_dataset_opt(ds, where=f"datasets.{phase}")
    train = opt.get("train")
    if train:
        pix = train.get("pixel_opt", {})
        if pix.get("type") not in LOSSES:
            raise KeyError(f"train.pixel_opt.type {pix.get('type')!r} not in "
                           f"{sorted(LOSSES)}")
        sched = train.get("scheduler", {}).get("type")
        known_scheds = {"CosineAnnealingRestartCyclicLR",
                        "CosineAnnealingRestartLR", "MultiStepLR",
                        "MultiStepRestartLR", "LinearLR", "VibrateLR",
                        "TrueCosineAnnealingLR", "CosineAnnealingLR"}
        if sched not in known_scheds:
            raise KeyError(f"train.scheduler.type {sched!r} not in "
                           f"{sorted(known_scheds)}")


def make_exp_dirs(opt: dict[str, Any]) -> None:
    for key in ("experiments_root", "models", "training_states", "log",
                "visualization", "results_root"):
        path = opt["path"].get(key)
        if path:
            os.makedirs(path, exist_ok=True)

"""Checkpoint save/load + auto-resume.

The reference's two-file scheme (base_model.py:213-351): weights
``net_g_{iter}.pth`` with 'params'/'params_ema' keys, and training state
``{iter}.state`` with epoch/iter/optimizer/scheduler. Here both live in one
orbax checkpoint per iteration under ``training_states/``, plus a
weights-only ``net_g_{iter}`` for serving — preserving the params/
params_ema dual-key concept. Auto-resume scans for the highest-numbered
checkpoint (train.py:171-192).

``load_reference_pth`` ingests the reference's .pth files directly (via
convert/), with non-strict merge that skips missing/mismatched entries —
the behavior ``strict_load_g: false`` relies on for fine-tuning from
Restormer weights (base_model.py:246-279).
"""

from __future__ import annotations

import os
import os.path as osp
import re
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def _ckpt_dir(root: str, step: int) -> str:
    return osp.join(root, f"ckpt_{step}")


def save_checkpoint(root: str, step: int, state, epoch: int = 0) -> str:
    """Save full training state (params, ema, opt state, step, epoch)."""
    assert _HAS_ORBAX, "orbax not available"
    path = os.path.abspath(_ckpt_dir(root, step))
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(jax.device_get(state.step)),
        "epoch": epoch,
    }
    if state.ema_params is not None:
        payload["params_ema"] = jax.device_get(state.ema_params)
    if state.extra_variables:
        payload["extra_variables"] = jax.device_get(state.extra_variables)
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def save_weights(root: str, step: int | str, params, ema_params=None) -> str:
    """Weights-only checkpoint (the net_g_{iter}.pth equivalent).
    ``step`` may be a label like 'best' (net_g_best)."""
    assert _HAS_ORBAX, "orbax not available"
    path = os.path.abspath(osp.join(root, f"net_g_{step}"))
    payload = {"params": jax.device_get(params)}
    if ema_params is not None:
        payload["params_ema"] = jax.device_get(ema_params)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(root: str, step: int, state):
    """Restore into an abstract/live state template."""
    assert _HAS_ORBAX, "orbax not available"
    path = os.path.abspath(_ckpt_dir(root, step))
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": 0,
        "epoch": 0,
    }
    if state.ema_params is not None:
        template["params_ema"] = jax.device_get(state.ema_params)
    if state.extra_variables:
        template["extra_variables"] = jax.device_get(state.extra_variables)
    restored = ckptr.restore(path, template)
    import jax.numpy as jnp

    new_state = state.replace(
        step=jnp.asarray(restored["step"], jnp.int32),
        params=restored["params"],
        opt_state=restored["opt_state"],
    )
    if state.ema_params is not None:
        new_state = new_state.replace(ema_params=restored["params_ema"])
    if state.extra_variables:
        new_state = new_state.replace(
            extra_variables=restored["extra_variables"])
    return new_state, restored.get("epoch", 0)


def load_weights(path: str, param_key: str = "params"):
    """Load a weights-only orbax checkpoint (or a directory saved by
    save_weights)."""
    assert _HAS_ORBAX, "orbax not available"
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    return restored.get(param_key, restored)


def shipped_asdqe_dir() -> str:
    """Path of the in-repo trained ASDQE scorer (artifacts/asdqe_full50ep
    — the full reference Train/ASDQE.py 50-epoch budget driven on-chip)."""
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(repo, "artifacts", "asdqe_full50ep", "weights",
                        "net_g_best")


def load_asdqe_weights(path: str | None = None):
    """(params, batch_stats) of an ASDQE checkpoint, or None when absent.

    The single place that knows both the shipped-scorer location and the
    two payload layouts: train-asdqe's ``save_weights(dir, step,
    {'params', 'batch_stats'})`` nests the dict under the payload's
    'params' key, while direct saves are flat — callers (`raie score`,
    the FID default feature space, golden tests) must not re-implement
    this unwrap (ADVICE r3 #4). Leaves come back as jnp arrays.
    """
    import jax
    import jax.numpy as jnp

    path = path or shipped_asdqe_dir()
    if not osp.isdir(path):
        return None
    restored = load_weights(path, None)
    inner = restored.get("params", restored)
    if "batch_stats" not in inner:  # flat {'params','batch_stats'} payload
        inner = restored
    return (jax.tree.map(jnp.asarray, inner["params"]),
            jax.tree.map(jnp.asarray, inner["batch_stats"]))


def find_latest_checkpoint(root: str) -> int | None:
    """Auto-resume scan (train.py:171-192): highest-numbered ckpt_* dir."""
    if not osp.isdir(root):
        return None
    best = None
    for name in os.listdir(root):
        m = re.fullmatch(r"ckpt_(\d+)", name)
        if m:
            step = int(m.group(1))
            best = step if best is None else max(best, step)
    return best


def prune_checkpoints(states_dir: str | None, models_dir: str | None,
                      keep: int) -> list[str]:
    """Checkpoint rotation: keep only the ``keep`` highest-numbered
    ``ckpt_{iter}`` states and ``net_g_{iter}`` weight dirs, delete the
    rest. Non-numeric names (net_g_best, net_g_latest) are never touched.
    The reference keeps every checkpoint (base_model.py:213-244); rotation
    is opt-in via ``logger.keep_checkpoints: N`` (0/absent = keep all)."""
    import shutil

    removed: list[str] = []
    if keep <= 0:
        return removed
    for root, pat in ((states_dir, r"ckpt_(\d+)"),
                      (models_dir, r"net_g_(\d+)")):
        if not root or not osp.isdir(root):
            continue
        steps = []
        for name in os.listdir(root):
            m = re.fullmatch(pat, name)
            if m:
                steps.append((int(m.group(1)), name))
        for _, name in sorted(steps)[:-keep]:
            path = osp.join(root, name)
            shutil.rmtree(path, ignore_errors=True)
            removed.append(path)
    return removed


def merge_params_nonstrict(target, source, verbose: bool = True,
                           min_matched: int = 0):
    """Non-strict merge: copy leaves that exist in both trees with matching
    shapes; skip (and report) the rest — the reference's strict_load_g:
    false semantics (base_model.py:246-279). ``min_matched`` guards
    against a wrong param_key/checkpoint layout silently merging nothing
    and "fine-tuning" from random init: fewer than that many matched
    leaves raises ValueError."""
    skipped: list[str] = []

    def walk(dst: dict, src: Any, prefix: str):
        out = {}
        for key, dval in dst.items():
            path = f"{prefix}.{key}" if prefix else key
            sval = src.get(key) if isinstance(src, dict) else None
            if isinstance(dval, dict):
                out[key] = walk(dval, sval if isinstance(sval, dict) else {},
                                path)
            elif sval is not None and np.shape(sval) == np.shape(dval):
                out[key] = np.asarray(sval, dtype=np.asarray(dval).dtype)
            else:
                skipped.append(path)
                out[key] = dval
        return out

    merged = walk(target, source, "")
    n_target = len(jax.tree.leaves(target))
    n_matched = n_target - len(skipped)
    if n_matched < min_matched:
        raise ValueError(
            f"pretrain merge matched only {n_matched} of {n_target} "
            f"leaves (need >= {min_matched}) — wrong param_key or "
            "checkpoint layout (strict_load_g: false skips mismatches, "
            "not everything)")
    if verbose and skipped:
        print(f"[load] kept {len(skipped)} target entries not found/matched "
              f"in source (first few: {skipped[:5]})")
    return merged


def load_reference_pth(path: str, arch_type: str, target_params=None,
                       param_key: str = "params", strict: bool = True):
    """Ingest a reference .pth checkpoint via the converters; optionally
    non-strict-merged into ``target_params``."""
    from ..convert.torch_import import CONVERTERS, load_pth_state_dict

    sd = load_pth_state_dict(path, param_key)
    converted = CONVERTERS[arch_type](sd)
    if arch_type == "DenoiseRatePredictor":
        return converted  # (params, batch_stats)
    if strict or target_params is None:
        return converted
    return merge_params_nonstrict(jax.device_get(target_params), converted)

"""PyTorch ``.pth`` state-dict -> JAX/flax pytree weight converter.

Converts checkpoints produced by the reference repo
(``{'params': state_dict}`` / ``{'params_ema': ...}`` layout,
Train/basicsr/models/base_model.py:213-244) into the NHWC parameter trees
used by this framework.

Layout transposes:
  Conv2d           (O, I, kh, kw)      -> HWIO  (kh, kw, I, O)
  Conv3d           (O, I, kd, kh, kw)  -> DHWIO (kd, kh, kw, I, O)
  ConvTranspose3d  (I, O, 1, 2, 2)     -> (2, 2, I, O)  [learned-shuffle form]
  Linear           (O, I)              -> (I, O)
  BatchNorm        weight/bias -> scale/bias; running stats -> batch_stats.

``torch`` is only needed to *read* ``.pth`` files; converted checkpoints
are plain pytrees and are saved/loaded with orbax/numpy thereafter.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

Array = np.ndarray
Tree = dict[str, Any]


def load_pth_state_dict(path: str, param_key: str | None = "params") -> dict[str, Array]:
    """Read a reference checkpoint into {name: np.ndarray}.

    ``param_key`` follows the reference convention ('params' or
    'params_ema', base_model.py:281-309); pass None if the file is a bare
    state_dict. The 'module.' DDP prefix is stripped, as the reference does.
    """
    import torch  # local import: only needed for .pth ingestion

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if param_key is not None and isinstance(obj, dict) and param_key in obj:
        obj = obj[param_key]
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def _set(tree: Tree, path: list[str], value: Array) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv2d(w: Array) -> Array:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _conv3d(w: Array) -> Array:
    return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))


# ---------------------------------------------------------------- teacher --

def convert_teacher(sd: Mapping[str, Array]) -> Tree:
    """KDLAE_teacher / RestormerSuperResolutionParam2 / Restormer weights.

    Module names in our flax models mirror the torch attribute names
    (KDLAE/KDLAE_model.py:204-268), so the mapping is three rewrites:
    LayerNorm '.body.' flattening, Down/Up 'body.0' -> 'conv', and the
    conv-weight transpose.
    """
    params: Tree = {}
    for key, val in sd.items():
        k = key
        # Down/Up sample: body.0.weight -> conv.kernel
        k = re.sub(r"\.body\.0\.weight$", ".conv.weight", k)
        # LayerNorm: normX.body.{weight,bias} -> normX.{weight,bias}
        k = re.sub(r"\.body\.(weight|bias)$", r".\1", k)
        parts = k.split(".")
        leaf = parts[-1]
        if leaf == "weight" and val.ndim == 4:
            parts[-1] = "kernel"
            val = _conv2d(val)
        _set(params, parts, np.asarray(val))
    return params


convert_restormer = convert_teacher  # identical naming scheme


# ---------------------------------------------------------------- student --

def convert_student(sd: Mapping[str, Array]) -> Tree:
    """KDLAE_student weights (KDLAE/KDLAE_model.py:340-393).

    torch Sequential indices 0/2 inside each conv block map to conv1/conv2;
    ModuleList indices map to encoders_{i} / upconv_{j} / decoders_{j}.
    """
    params: Tree = {}
    seq_map = {"0": "conv1", "2": "conv2"}
    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] in ("encoders", "decoders"):
            mod = f"{parts[0]}_{parts[1]}"
            path = [mod, seq_map[parts[2]], parts[3]]
        elif parts[0] == "st_fusion":
            path = ["st_fusion", seq_map[parts[1]], parts[2]]
        elif parts[0] == "upconv_layers":
            path = [f"upconv_{parts[1]}", parts[2]]
        elif parts[0] == "out_conv":
            path = ["out_conv", parts[1]]
        else:
            raise KeyError(f"unrecognized student key: {key}")

        if path[-1] == "weight":
            path[-1] = "kernel"
            if parts[0] == "upconv_layers":
                # (I, O, 1, 2, 2) -> (2, 2, I, O)
                assert val.shape[2] == 1 and val.shape[3:] == (2, 2), val.shape
                val = np.ascontiguousarray(val[:, :, 0].transpose(2, 3, 0, 1))
            else:
                val = _conv3d(val)
        _set(params, path, np.asarray(val))
    return params


# ------------------------------------------------------------------ asdqe --

_DC_MAP = {"0": ("conv1", "conv"), "1": ("bn1", "bn"),
           "3": ("conv2", "conv"), "4": ("bn2", "bn")}


def _convert_double_conv(prefix_path: list[str], idx: str, leaf: str, val: Array,
                         params: Tree, batch_stats: Tree) -> None:
    name, kind = _DC_MAP[idx]
    if kind == "conv":
        if leaf == "weight":
            _set(params, prefix_path + [name, "kernel"], _conv2d(val))
        else:
            _set(params, prefix_path + [name, leaf], np.asarray(val))
    else:  # batchnorm
        if leaf == "weight":
            _set(params, prefix_path + [name, "scale"], np.asarray(val))
        elif leaf == "bias":
            _set(params, prefix_path + [name, "bias"], np.asarray(val))
        elif leaf == "running_mean":
            _set(batch_stats, prefix_path + [name, "mean"], np.asarray(val))
        elif leaf == "running_var":
            _set(batch_stats, prefix_path + [name, "var"], np.asarray(val))
        # num_batches_tracked: dropped (unused by inference/training here)


def convert_asdqe(sd: Mapping[str, Array]) -> tuple[Tree, Tree]:
    """DenoiseRatePredictor weights (ASDQE/ASDQE_model.py:123-156).

    Returns (params, batch_stats) — flax keeps BN running statistics in a
    separate collection.
    """
    params: Tree = {}
    batch_stats: Tree = {}
    fc_map = {"2": "fc1", "5": "fc2", "8": "fc3"}
    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] in ("lq_extractor", "gt_extractor", "diff_extractor"):
            # e.g. lq_extractor.double_conv.0.weight
            _convert_double_conv([parts[0]], parts[2], parts[3], val,
                                 params, batch_stats)
        elif parts[0] == "unet":
            if parts[1] == "inc":
                _convert_double_conv(["unet", "inc"], parts[3], parts[4], val,
                                     params, batch_stats)
            elif parts[1].startswith("down"):
                # unet.down1.maxpool_conv.1.double_conv.0.weight
                _convert_double_conv(["unet", parts[1], "conv"], parts[5],
                                     parts[6], val, params, batch_stats)
            elif parts[1].startswith("up"):
                # unet.up1.conv.double_conv.0.weight
                _convert_double_conv(["unet", parts[1], "conv"], parts[4],
                                     parts[5], val, params, batch_stats)
            elif parts[1] == "outc":
                # unet.outc.conv.{weight,bias}
                if parts[3] == "weight":
                    _set(params, ["unet", "outc", "kernel"], _conv2d(val))
                else:
                    _set(params, ["unet", "outc", "bias"], np.asarray(val))
            else:
                raise KeyError(f"unrecognized ASDQE key: {key}")
        elif parts[0] == "regressor":
            name = fc_map[parts[1]]
            if parts[2] == "weight":
                _set(params, [name, "kernel"], np.ascontiguousarray(val.T))
            else:
                _set(params, [name, "bias"], np.asarray(val))
        else:
            raise KeyError(f"unrecognized ASDQE key: {key}")
    return params, batch_stats


CONVERTERS = {
    "KDLAE_teacher": convert_teacher,
    "RestormerSuperResolutionParam2": convert_teacher,
    "Restormer": convert_teacher,
    "KDLAE_student": convert_student,
    "DenoiseRatePredictor": convert_asdqe,
}

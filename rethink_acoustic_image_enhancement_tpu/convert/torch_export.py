"""JAX/flax pytree -> PyTorch ``.pth`` state-dict exporter.

Exact inverse of ``torch_import``: converts this framework's NHWC
parameter trees back into reference-layout checkpoints
(``{'params': state_dict}`` (+ optional ``'params_ema'``), the layout
``BaseModel.save_network`` writes, Train/basicsr/models/base_model.py:
213-244) so the reference tooling (notebooks, test.py, ASDQE_test.py) can
consume weights trained here. Round-trip (import -> export) is bit-exact
(tests/test_torch_export.py).

Layout transposes (inverse of torch_import):
  HWIO  (kh, kw, I, O)     -> Conv2d (O, I, kh, kw)
  DHWIO (kd, kh, kw, I, O) -> Conv3d (O, I, kd, kh, kw)
  learned-shuffle (2, 2, I, O) -> ConvTranspose3d (I, O, 1, 2, 2)
  Linear (I, O)            -> (O, I)
  scale/bias + batch_stats -> BatchNorm weight/bias/running_*.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

Array = np.ndarray
Tree = Mapping[str, Any]


def _flatten(tree: Tree, prefix: str = "") -> dict[str, Array]:
    out: dict[str, Array] = {}
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _conv2d_inv(w: Array) -> Array:
    return np.ascontiguousarray(w.transpose(3, 2, 0, 1))


def _conv3d_inv(w: Array) -> Array:
    return np.ascontiguousarray(w.transpose(4, 3, 0, 1, 2))


# ---------------------------------------------------------------- teacher --

def export_teacher(params: Tree) -> dict[str, Array]:
    """Inverse of ``convert_teacher`` (KDLAE_teacher /
    RestormerSuperResolutionParam2 / Restormer)."""
    sd: dict[str, Array] = {}
    for key, val in _flatten(params).items():
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "kernel" and val.ndim == 4:
            leaf = "weight"
            val = _conv2d_inv(val)
        parts[-1] = leaf
        # Down/Up sample conv -> Sequential body.0 (torch: Downsample/
        # Upsample wrap the conv in nn.Sequential, KDLAE_model.py:182-200)
        if len(parts) >= 3 and parts[-2] == "conv" \
                and parts[-3].startswith(("down", "up")):
            parts = parts[:-2] + ["body", "0", leaf]
        # channel LayerNorm params live under '.body.' in torch
        # (LayerNorm wraps BiasFree_/WithBias_LayerNorm, KDLAE_model.py:74-83)
        elif leaf in ("weight", "bias") and val.ndim == 1 \
                and parts[-2].startswith("norm"):
            parts = parts[:-1] + ["body", leaf]
        sd[".".join(parts)] = val
    return sd


export_restormer = export_teacher


# ---------------------------------------------------------------- student --

def export_student(params: Tree) -> dict[str, Array]:
    """Inverse of ``convert_student`` (KDLAE_student)."""
    inv_seq = {"conv1": "0", "conv2": "2"}
    sd: dict[str, Array] = {}
    for key, val in _flatten(params).items():
        parts = key.split(".")
        mod, leaf = parts[0], parts[-1]
        if mod.startswith(("encoders_", "decoders_")):
            base, idx = mod.rsplit("_", 1)
            path = [base, idx, inv_seq[parts[1]], leaf]
        elif mod == "st_fusion":
            path = ["st_fusion", inv_seq[parts[1]], leaf]
        elif mod.startswith("upconv_"):
            path = ["upconv_layers", mod.rsplit("_", 1)[1], leaf]
        elif mod == "out_conv":
            path = ["out_conv", leaf]
        else:
            raise KeyError(f"unrecognized student param: {key}")

        if leaf == "kernel":
            path[-1] = "weight"
            if mod.startswith("upconv_"):
                # (2, 2, I, O) -> ConvTranspose3d (I, O, 1, 2, 2)
                val = np.ascontiguousarray(
                    val.transpose(2, 3, 0, 1)[:, :, None])
            else:
                val = _conv3d_inv(val)
        sd[".".join(path)] = val
    return sd


# ------------------------------------------------------------------ asdqe --

_DC_INV = {"conv1": "0", "bn1": "1", "conv2": "3", "bn2": "4"}


def _export_double_conv(sd: dict[str, Array], torch_prefix: str,
                        p_node: Tree, bs_node: Tree | None) -> None:
    for name, idx in _DC_INV.items():
        if name not in p_node:
            continue
        sub = p_node[name]
        if name.startswith("conv"):
            sd[f"{torch_prefix}.{idx}.weight"] = _conv2d_inv(
                np.asarray(sub["kernel"]))
            if "bias" in sub:
                sd[f"{torch_prefix}.{idx}.bias"] = np.asarray(sub["bias"])
        else:
            sd[f"{torch_prefix}.{idx}.weight"] = np.asarray(sub["scale"])
            sd[f"{torch_prefix}.{idx}.bias"] = np.asarray(sub["bias"])
            stats = (bs_node or {}).get(name, {})
            if "mean" in stats:
                sd[f"{torch_prefix}.{idx}.running_mean"] = np.asarray(
                    stats["mean"])
                sd[f"{torch_prefix}.{idx}.running_var"] = np.asarray(
                    stats["var"])
                # torch tracks this; the value is irrelevant at inference
                sd[f"{torch_prefix}.{idx}.num_batches_tracked"] = np.asarray(
                    0, dtype=np.int64)


def export_asdqe(params: Tree, batch_stats: Tree | None = None
                 ) -> dict[str, Array]:
    """Inverse of ``convert_asdqe`` (DenoiseRatePredictor)."""
    batch_stats = batch_stats or {}
    sd: dict[str, Array] = {}
    fc_inv = {"fc1": "2", "fc2": "5", "fc3": "8"}
    for mod, node in params.items():
        if mod in ("lq_extractor", "gt_extractor", "diff_extractor"):
            _export_double_conv(sd, f"{mod}.double_conv", node,
                                batch_stats.get(mod))
        elif mod == "unet":
            ubs = batch_stats.get("unet", {})
            for sub, snode in node.items():
                if sub == "inc":
                    _export_double_conv(sd, "unet.inc.double_conv", snode,
                                        ubs.get("inc"))
                elif sub.startswith("down"):
                    _export_double_conv(
                        sd, f"unet.{sub}.maxpool_conv.1.double_conv",
                        snode["conv"], (ubs.get(sub) or {}).get("conv"))
                elif sub.startswith("up"):
                    _export_double_conv(
                        sd, f"unet.{sub}.conv.double_conv",
                        snode["conv"], (ubs.get(sub) or {}).get("conv"))
                elif sub == "outc":
                    sd["unet.outc.conv.weight"] = _conv2d_inv(
                        np.asarray(snode["kernel"]))
                    sd["unet.outc.conv.bias"] = np.asarray(snode["bias"])
                else:
                    raise KeyError(f"unrecognized ASDQE unet module: {sub}")
        elif mod in fc_inv:
            sd[f"regressor.{fc_inv[mod]}.weight"] = np.ascontiguousarray(
                np.asarray(node["kernel"]).T)
            sd[f"regressor.{fc_inv[mod]}.bias"] = np.asarray(node["bias"])
        else:
            raise KeyError(f"unrecognized ASDQE module: {mod}")
    return sd


EXPORTERS = {
    "KDLAE_teacher": export_teacher,
    "RestormerSuperResolutionParam2": export_teacher,
    "Restormer": export_teacher,
    "KDLAE_student": export_student,
    "DenoiseRatePredictor": export_asdqe,
}


def save_pth(path: str, params: Tree, arch: str,
             ema_params: Tree | None = None,
             batch_stats: Tree | None = None) -> None:
    """Write a reference-layout ``.pth`` ({'params': sd[, 'params_ema']},
    base_model.py:213-244). ``batch_stats`` applies to the ASDQE arch."""
    import torch

    def to_sd(tree):
        if arch == "DenoiseRatePredictor":
            np_sd = export_asdqe(tree, batch_stats)
        else:
            np_sd = EXPORTERS[arch](tree)
        return {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in np_sd.items()}

    payload = {"params": to_sd(params)}
    if ema_params is not None:
        payload["params_ema"] = to_sd(ema_params)
    torch.save(payload, path)

"""InceptionV3 pool3 feature extractor for literature-comparable FID.

The reference's FID intends torchvision InceptionV3 features
(Train/basicsr/metrics/fid.py:7-19 imports `archs/inception.py`, which
the reference does not ship — the import is broken as released). This
module provides that path TPU-natively: a pure-JAX InceptionV3 forward
whose parameter tree mirrors the torchvision/pytorch-fid state_dict
names one-for-one, so ANY user-supplied `.pth` of that family loads
directly:

- pytorch-fid's `pt_inception-2015-12-05-6726825d.pth` (the TTUR/FID
  standard — what `fid.py`'s `InceptionV3` wrapper downloads), or
- torchvision `inception_v3` ImageNet weights (aux keys ignored).

No weights ship in-repo (zero egress); without a weights file, FID
falls back to the documented ASDQE feature space (`fid.py`).

Differences between the two families are behavioral, not structural,
and are controlled by ``fid_variant``: the FID network uses
count_include_pad=False average pooling inside the Inception blocks and
a max-pooled branch_pool in Mixed_7c (pytorch-fid's FIDInceptionA/C/E_1/
E_2 patches); torchvision uses count_include_pad=True and average
pooling everywhere.

Input contract matches pytorch-fid: NHWC float in [0, 1], bilinearly
resized to 299x299 (align_corners=False), scaled to [-1, 1], features =
global mean of the final 2048-channel map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-3


def _conv(p, x, stride=1, padding=0):
    """BasicConv2d: bias-free conv + BN(eps 1e-3, running stats) + relu."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    x = jax.lax.conv_general_dilated(
        x, p["conv.weight"], window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    inv = jax.lax.rsqrt(p["bn.running_var"] + _BN_EPS)
    return jax.nn.relu(
        (x - p["bn.running_mean"]) * inv * p["bn.weight"] + p["bn.bias"])


def _sub(p, prefix):
    """View of the params dict under `prefix.` (torch submodule names)."""
    pre = prefix + "."
    return {k[len(pre):]: v for k, v in p.items() if k.startswith(pre)}


def _maxpool3s2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _pool3s1p1(x, kind: str, count_include_pad: bool):
    """3x3 stride-1 pad-1 avg/max pool (the in-block branch_pool)."""
    if kind == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (1, 3, 3, 1), (1, 1, 1, 1),
                                     [(0, 0), (1, 1), (1, 1), (0, 0)])
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    if count_include_pad:
        return s / 9.0
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / cnt


def _inception_a(p, x, cip):
    b1 = _conv(_sub(p, "branch1x1"), x)
    b5 = _conv(_sub(p, "branch5x5_1"), x)
    b5 = _conv(_sub(p, "branch5x5_2"), b5, padding=2)
    b3 = _conv(_sub(p, "branch3x3dbl_1"), x)
    b3 = _conv(_sub(p, "branch3x3dbl_2"), b3, padding=1)
    b3 = _conv(_sub(p, "branch3x3dbl_3"), b3, padding=1)
    bp = _conv(_sub(p, "branch_pool"), _pool3s1p1(x, "avg", cip))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _conv(_sub(p, "branch3x3"), x, stride=2)
    bd = _conv(_sub(p, "branch3x3dbl_1"), x)
    bd = _conv(_sub(p, "branch3x3dbl_2"), bd, padding=1)
    bd = _conv(_sub(p, "branch3x3dbl_3"), bd, stride=2)
    return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


def _inception_c(p, x, cip):
    b1 = _conv(_sub(p, "branch1x1"), x)
    b7 = _conv(_sub(p, "branch7x7_1"), x)
    b7 = _conv(_sub(p, "branch7x7_2"), b7, padding=((0, 0), (3, 3)))
    b7 = _conv(_sub(p, "branch7x7_3"), b7, padding=((3, 3), (0, 0)))
    bd = _conv(_sub(p, "branch7x7dbl_1"), x)
    bd = _conv(_sub(p, "branch7x7dbl_2"), bd, padding=((3, 3), (0, 0)))
    bd = _conv(_sub(p, "branch7x7dbl_3"), bd, padding=((0, 0), (3, 3)))
    bd = _conv(_sub(p, "branch7x7dbl_4"), bd, padding=((3, 3), (0, 0)))
    bd = _conv(_sub(p, "branch7x7dbl_5"), bd, padding=((0, 0), (3, 3)))
    bp = _conv(_sub(p, "branch_pool"), _pool3s1p1(x, "avg", cip))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _conv(_sub(p, "branch3x3_1"), x)
    b3 = _conv(_sub(p, "branch3x3_2"), b3, stride=2)
    b7 = _conv(_sub(p, "branch7x7x3_1"), x)
    b7 = _conv(_sub(p, "branch7x7x3_2"), b7, padding=((0, 0), (3, 3)))
    b7 = _conv(_sub(p, "branch7x7x3_3"), b7, padding=((3, 3), (0, 0)))
    b7 = _conv(_sub(p, "branch7x7x3_4"), b7, stride=2)
    return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


def _inception_e(p, x, pool_kind, cip):
    b1 = _conv(_sub(p, "branch1x1"), x)
    b3 = _conv(_sub(p, "branch3x3_1"), x)
    b3 = jnp.concatenate([
        _conv(_sub(p, "branch3x3_2a"), b3, padding=((0, 0), (1, 1))),
        _conv(_sub(p, "branch3x3_2b"), b3, padding=((1, 1), (0, 0)))],
        axis=-1)
    bd = _conv(_sub(p, "branch3x3dbl_1"), x)
    bd = _conv(_sub(p, "branch3x3dbl_2"), bd, padding=1)
    bd = jnp.concatenate([
        _conv(_sub(p, "branch3x3dbl_3a"), bd, padding=((0, 0), (1, 1))),
        _conv(_sub(p, "branch3x3dbl_3b"), bd, padding=((1, 1), (0, 0)))],
        axis=-1)
    bp = _conv(_sub(p, "branch_pool"), _pool3s1p1(x, pool_kind, cip))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


@functools.partial(jax.jit, static_argnames=("resize", "fid_variant"))
def inception_pool3(params, x, *, resize: bool = True,
                    fid_variant: bool = True):
    """(N, H, W, 3) floats in [0,1] -> (N, 2048) pool3 features."""
    if resize:
        n, _, _, c = x.shape
        x = jax.image.resize(x, (n, 299, 299, c), method="bilinear",
                             antialias=False)
    x = x * 2.0 - 1.0
    cip = not fid_variant  # torch count_include_pad=True; FID patches it off
    x = _conv(_sub(params, "Conv2d_1a_3x3"), x, stride=2)
    x = _conv(_sub(params, "Conv2d_2a_3x3"), x)
    x = _conv(_sub(params, "Conv2d_2b_3x3"), x, padding=1)
    x = _maxpool3s2(x)
    x = _conv(_sub(params, "Conv2d_3b_1x1"), x)
    x = _conv(_sub(params, "Conv2d_4a_3x3"), x)
    x = _maxpool3s2(x)
    x = _inception_a(_sub(params, "Mixed_5b"), x, cip)
    x = _inception_a(_sub(params, "Mixed_5c"), x, cip)
    x = _inception_a(_sub(params, "Mixed_5d"), x, cip)
    x = _inception_b(_sub(params, "Mixed_6a"), x)
    x = _inception_c(_sub(params, "Mixed_6b"), x, cip)
    x = _inception_c(_sub(params, "Mixed_6c"), x, cip)
    x = _inception_c(_sub(params, "Mixed_6d"), x, cip)
    x = _inception_c(_sub(params, "Mixed_6e"), x, cip)
    x = _inception_d(_sub(params, "Mixed_7a"), x)
    x = _inception_e(_sub(params, "Mixed_7b"), x, "avg", cip)
    # FID variant: Mixed_7c's branch_pool is MAX-pooled (FIDInceptionE_2)
    x = _inception_e(_sub(params, "Mixed_7c"), x,
                     "max" if fid_variant else "avg", cip)
    return jnp.mean(x, axis=(1, 2))


def convert_inception_state_dict(state_dict) -> dict:
    """torch state_dict (torchvision/pytorch-fid names, NCHW OIHW) ->
    flat numpy params keyed by the same names with conv kernels in HWIO.
    Aux-classifier and fc keys are dropped (features only)."""
    params = {}
    for k, v in state_dict.items():
        if k.startswith(("AuxLogits", "fc.")) or k.endswith(
                "num_batches_tracked"):
            continue
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                       else v, np.float32)
        if k.endswith("conv.weight"):
            v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        params[k] = v
    return params


def load_inception_pth(path: str) -> dict:
    """Load a user-supplied torchvision/pytorch-fid InceptionV3 `.pth`."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_inception_state_dict(sd)


def make_inception_feature_fn(weights_path: str, *,
                              fid_variant: bool = True, batch: int = 8):
    """`feature_fn` for fid.extract_features from a user-supplied `.pth`
    — InceptionV3 pool3 (2048-d), literature-comparable FID."""
    params = jax.tree.map(jnp.asarray, load_inception_pth(weights_path))

    def feature_fn(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float32)
        if x.ndim == 3:
            x = x[None]
        out = [np.asarray(inception_pool3(params, jnp.asarray(x[i:i + batch]),
                                          fid_variant=fid_variant))
               for i in range(0, len(x), batch)]
        return np.concatenate(out, axis=0)

    feature_fn.feature_space = (
        f"inception-pool3({'fid' if fid_variant else 'torchvision'}:"
        f"{weights_path})")
    return feature_fn

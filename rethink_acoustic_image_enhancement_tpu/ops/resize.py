"""Resize / pooling ops matching torch semantics used by ASDQE.

torch's ``nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True)``
(ASDQE/ASDQE_model.py:54) uses corner-aligned sample positions
src = i * (H_in - 1) / (H_out - 1), which differs from
``jax.image.resize`` (half-pixel centers). Implemented here as two 1-D
gather+lerp passes — exact, cheap, and fusible by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def _resize_axis_align_corners(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if out_size == in_size:
        return x
    if in_size == 1:
        reps = [1] * x.ndim
        reps[axis] = out_size
        return jnp.tile(x, reps)
    pos = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    lo = jnp.clip(lo, 0, in_size - 2)
    frac = (pos - lo.astype(jnp.float32)).astype(x.dtype)
    a = jnp.take(x, lo, axis=axis)
    b = jnp.take(x, lo + 1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    frac = frac.reshape(shape)
    return a * (1 - frac) + b * frac


def resize_bilinear_align_corners(
    x: jnp.ndarray, out_h: int, out_w: int, h_axis: int = 1, w_axis: int = 2
) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (separable, exact)."""
    x = _resize_axis_align_corners(x, h_axis, out_h)
    return _resize_axis_align_corners(x, w_axis, out_w)


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(2) on NHWC (ASDQE/ASDQE_model.py:41)."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d((1,1)) + Flatten on NHWC -> (B, C)."""
    return jnp.mean(x, axis=(1, 2))

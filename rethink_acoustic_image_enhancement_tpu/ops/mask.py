"""Corruption masks and fan-beam zero-mask postprocessing.

``input_mask`` replicates the reference's multiplicative-Bernoulli frame
corruption (Train/basicsr/data/paired_image_dataset.py:19-36):
    out = img * mask - value + value * mask
i.e. kept pixels unchanged, masked pixels forced to -value. The reference
applies it per-frame in Python/numpy pixel loops on the host — a known CPU
bottleneck (SURVEY.md §3.1); here it is a vectorized jittable op usable
both host-side (numpy) and on-device inside the train step.

``zero_mask`` reproduces the notebooks' fan-shaped sonar border
preservation: output pixels where the *input* was exactly 0 (after ubyte
quantization) are forced back to 0 (KDLAE_T.ipynb cell 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def input_mask(img: jnp.ndarray, rng: jax.Array, prob: float | jnp.ndarray,
               value: float = 0.1) -> jnp.ndarray:
    """Bernoulli-mask an image (any shape): P(drop) = prob.

    ``prob`` may be a traced scalar so one compiled train step serves every
    progressive-schedule stage.
    """
    prob = jnp.clip(jnp.asarray(prob, img.dtype), 0.0, 1.0)
    keep = (jax.random.uniform(rng, img.shape, img.dtype) >= prob).astype(img.dtype)
    return img * keep - value + value * keep


def input_mask_np(img: np.ndarray, rng: np.random.Generator, prob: float,
                  value: float = 0.1) -> np.ndarray:
    """Host-side numpy version with identical semantics (vectorized over
    the whole array instead of the reference's per-pixel loops)."""
    prob = min(float(prob), 1.0)
    keep = (rng.random(img.shape) >= prob).astype(img.dtype)
    return img * keep - value + value * keep


def frame_interpolation_corrupt(
    stack: jnp.ndarray, rng: jax.Array, prob: float | jnp.ndarray,
    value: float = 0.1,
) -> jnp.ndarray:
    """The reference's 'frame interpolation' corruption branch
    (paired_image_dataset.py:231-241): odd frames are replaced by the mean
    of their neighbors then masked at prob+0.5; even frames masked at prob.

    stack: (..., F, H, W) with odd F.
    """
    f = stack.shape[-3]
    assert f % 2 == 1, "frame count must be odd for interpolation corruption"
    # mean of neighbors for odd indices 1..F-2
    neighbors_mean = 0.5 * (stack[..., 0:f - 2, :, :] + stack[..., 2:f, :, :])
    idx = jnp.arange(f)
    is_odd = (idx % 2 == 1)
    # build replaced stack: odd i <- mean(i-1, i+1)
    mid = jnp.zeros_like(stack)
    mid = mid.at[..., 1:f - 1, :, :].set(neighbors_mean)
    replaced = jnp.where(is_odd[..., :, None, None], mid, stack)
    r_even, r_odd = jax.random.split(rng)
    masked_even = input_mask(replaced, r_even, prob, value)
    masked_odd = input_mask(replaced, r_odd, jnp.asarray(prob) + 0.5, value)
    return jnp.where(is_odd[..., :, None, None], masked_odd, masked_even)


def zero_mask_from_input(lq_ubyte: np.ndarray) -> np.ndarray:
    """Boolean (H, W) mask of pixels that are exactly 0 in the quantized
    input (all channels zero for RGB)."""
    if lq_ubyte.ndim == 3 and lq_ubyte.shape[-1] == 3:
        return (lq_ubyte[..., 0] == 0) & (lq_ubyte[..., 1] == 0) & (lq_ubyte[..., 2] == 0)
    return np.squeeze(lq_ubyte) == 0


def apply_zero_mask(img_ubyte: np.ndarray, mask: np.ndarray,
                    scale: int = 1) -> np.ndarray:
    """Zero out masked pixels; ``scale`` repeats the mask (SR branch uses
    2x-repeated mask, KDLAE_T.ipynb cell 5)."""
    if scale != 1:
        mask = np.repeat(np.repeat(mask, scale, axis=0), scale, axis=1)
    out = img_ubyte.copy()
    out[mask] = 0
    return out

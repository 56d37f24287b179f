"""PSNR / SSIM metrics (jitted JAX).

Ports of Train/basicsr/metrics/psnr_ssim.py with the same numerics:
  * PSNR with auto max-value (1.0 vs 255.0) and crop_border
    (psnr_ssim.py:9-70).
  * The reference's default SSIM is the *3D* 11x11x11 Gaussian SSIM over
    (H, W, C) with replicate padding (psnr_ssim.py:146-197) — CUDA-only
    there; here it is a separable jitted JAX op that runs on CPU and TPU
    (reference defect fixed, SURVEY.md §2.9).
  * Classic per-channel 2D SSIM with valid-region crop (psnr_ssim.py:73-114)
    and the y-channel variant (psnr_ssim.py:199-237) are also provided.

All functions take HWC arrays (float, range [0,1] or [0,255]) and return
Python floats, matching the reference metric registry call convention
(image_restoration_model.py:324-336).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel_1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """cv2.getGaussianKernel equivalent."""
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g / g.sum()


_G1D = _gaussian_kernel_1d()


def _to_y_channel(img: jnp.ndarray) -> jnp.ndarray:
    """MATLAB rgb2ycbcr Y-only on [0,1]-scaled input, back to [0,255]
    (utils/matlab_functions.py semantics used by metric_util.to_y_channel)."""
    img = img / 255.0
    coef = jnp.asarray([65.481, 128.553, 24.966], img.dtype)
    y = img @ coef + 16.0
    return y


@partial(jax.jit, static_argnames=("crop_border", "test_y_channel"))
def _psnr_jit(img1, img2, crop_border=0, test_y_channel=False):
    img1 = img1.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    img2 = img2.astype(img1.dtype)
    if crop_border != 0:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    if test_y_channel:
        img1, img2 = _to_y_channel(img1), _to_y_channel(img2)
    mse = jnp.mean(jnp.square(img1 - img2))
    max_value = jnp.where(jnp.max(img1) <= 1.0, 1.0, 255.0)
    return 20.0 * jnp.log10(max_value / jnp.sqrt(mse)), mse


def calculate_psnr(img1, img2, crop_border: int = 0, input_order: str = "HWC",
                   test_y_channel: bool = False) -> float:
    """PSNR between two images (HWC or CHW). Returns inf when identical."""
    img1, img2 = _reorder(img1, input_order), _reorder(img2, input_order)
    val, mse = _psnr_jit(img1, img2, crop_border=crop_border,
                         test_y_channel=test_y_channel)
    if float(mse) == 0.0:
        return float("inf")
    return float(val)


def _reorder(img, input_order: str) -> jnp.ndarray:
    img = jnp.asarray(img)
    if img.ndim == 4:  # NCHW/NHWC batch of one
        img = img[0]
    if input_order == "CHW" and img.ndim == 3:
        img = jnp.transpose(img, (1, 2, 0))
    if img.ndim == 2:
        img = img[..., None]
    return img


def _sep_filter_replicate(x: jnp.ndarray, g: jnp.ndarray, axis: int) -> jnp.ndarray:
    """1-D Gaussian filter along ``axis`` with replicate (edge) padding."""
    r = g.shape[0] // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(x, pad, mode="edge")
    xp = jnp.moveaxis(xp, axis, -1)
    # correlate along the last axis via a 1-D conv
    shape = xp.shape
    flat = xp.reshape(-1, 1, shape[-1])
    kern = g[::-1].astype(xp.dtype).reshape(1, 1, -1)  # flip -> correlation
    out = jax.lax.conv_general_dilated(
        flat, kern, window_strides=(1,), padding="VALID")
    out = out.reshape(*shape[:-1], shape[-1] - 2 * r)
    return jnp.moveaxis(out, -1, axis)


def _filter3d(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Separable 11^3 Gaussian over (H, W, C) with replicate padding —
    equivalent to the reference's Conv3d with padding_mode='replicate'
    (psnr_ssim.py:150-158) because the 3D kernel is an outer product."""
    for ax in range(3):
        x = _sep_filter_replicate(x, g, ax)
    return x


@jax.jit
def _ssim3d_jit(img1, img2, max_value):
    g = jnp.asarray(_G1D, img1.dtype)
    c1 = (0.01 * max_value) ** 2
    c2 = (0.03 * max_value) ** 2
    mu1 = _filter3d(img1, g)
    mu2 = _filter3d(img2, g)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter3d(img1 * img1, g) - mu1_sq
    sigma2_sq = _filter3d(img2 * img2, g) - mu2_sq
    sigma12 = _filter3d(img1 * img2, g) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)


def _filter2d_valid(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Separable 11x11 Gaussian, then crop to the interior [5:-5, 5:-5]
    (the reference filters with default border then crops: psnr_ssim.py:99)."""
    r = g.shape[0] // 2
    # filter full (reflect101 default in cv2, but the crop removes all
    # border-dependent pixels, so do VALID directly)
    kern = g[::-1].astype(x.dtype)
    xh = jnp.moveaxis(x, 0, -1)
    flat = xh.reshape(-1, 1, xh.shape[-1])
    out = jax.lax.conv_general_dilated(flat, kern.reshape(1, 1, -1), (1,), "VALID")
    xh = jnp.moveaxis(out.reshape(*xh.shape[:-1], -1), -1, 0)
    xw = jnp.moveaxis(xh, 1, -1)
    flat = xw.reshape(-1, 1, xw.shape[-1])
    out = jax.lax.conv_general_dilated(flat, kern.reshape(1, 1, -1), (1,), "VALID")
    return jnp.moveaxis(out.reshape(*xw.shape[:-1], -1), -1, 1)


@jax.jit
def _ssim2d_jit(img1, img2):
    """Per-channel classic SSIM with C1/C2 for 255 range
    (psnr_ssim.py:73-114)."""
    g = jnp.asarray(_G1D, img1.dtype)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu1 = _filter2d_valid(img1, g)
    mu2 = _filter2d_valid(img2, g)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d_valid(img1 * img1, g) - mu1_sq
    sigma2_sq = _filter2d_valid(img2 * img2, g) - mu2_sq
    sigma12 = _filter2d_valid(img1 * img2, g) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map, axis=(0, 1)).mean()


def calculate_ssim(img1, img2, crop_border: int = 0, input_order: str = "HWC",
                   test_y_channel: bool = False) -> float:
    """SSIM via the reference's default 3D-Gaussian path
    (psnr_ssim.py:240-318); y-channel falls back to 2D replicate-border SSIM."""
    img1, img2 = _reorder(img1, input_order), _reorder(img2, input_order)
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    if crop_border != 0:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    if test_y_channel:
        y1, y2 = _to_y_channel(img1), _to_y_channel(img2)
        g = jnp.asarray(_G1D, y1.dtype)
        c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
        y1, y2 = y1[..., None], y2[..., None]
        mu1 = _sep_filter_replicate(_sep_filter_replicate(y1, g, 0), g, 1)
        mu2 = _sep_filter_replicate(_sep_filter_replicate(y2, g, 0), g, 1)
        s1 = _sep_filter_replicate(_sep_filter_replicate(y1 * y1, g, 0), g, 1) - mu1 * mu1
        s2 = _sep_filter_replicate(_sep_filter_replicate(y2 * y2, g, 0), g, 1) - mu2 * mu2
        s12 = _sep_filter_replicate(_sep_filter_replicate(y1 * y2, g, 0), g, 1) - mu1 * mu2
        ssim_map = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))
        return float(jnp.mean(ssim_map))
    max_value = 1.0 if float(jnp.max(img1)) <= 1 else 255.0
    return float(_ssim3d_jit(img1, img2, jnp.asarray(max_value, img1.dtype)))


def calculate_ssim_2d(img1, img2, crop_border: int = 0,
                      input_order: str = "HWC") -> float:
    """Classic per-channel 2D SSIM (psnr_ssim.py:73-114) — expects [0,255]."""
    img1, img2 = _reorder(img1, input_order), _reorder(img2, input_order)
    if crop_border != 0:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    return float(_ssim2d_jit(img1.astype(jnp.float32), img2.astype(jnp.float32)))

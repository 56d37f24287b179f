"""ASDQE: no-reference (pairwise LQ-vs-result) acoustic image quality scorer.

Reference: ASDQE/ASDQE_model.py:20-171 (duplicate Train/ASDQE_model.py).
Three DoubleConv feature branches (LQ, result, LQ-result diff) -> concat ->
a small 3-down/3-up bilinear UNet -> global average pool -> MLP regressor
with tanh, score in [-1, 1].

NHWC throughout; BatchNorm carries running statistics in the ``batch_stats``
collection (inference uses running stats exactly like torch .eval()).
Bilinear upsampling is align_corners=True to match torch bit-for-bit.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.layout import pad_to_multiple
from ..ops.resize import global_avg_pool, max_pool_2x2, resize_bilinear_align_corners


class DoubleConv(nn.Module):
    """(conv 3x3 -> BN -> ReLU) x 2 (ASDQE/ASDQE_model.py:20-34)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(x)
        return nn.relu(x)


class Down(nn.Module):
    """MaxPool2d(2) then DoubleConv (ASDQE/ASDQE_model.py:36-46)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return DoubleConv(self.features, name="conv")(max_pool_2x2(x), train)


class Up(nn.Module):
    """Bilinear 2x upsample (align_corners), pad-to-match, concat skip,
    DoubleConv (ASDQE/ASDQE_model.py:48-66)."""

    features: int

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        _, h1, w1, _ = x1.shape
        _, h2, w2, _ = x2.shape
        x1 = resize_bilinear_align_corners(x1, h1 * 2, w1 * 2)
        dy, dx = h2 - x1.shape[1], w2 - x1.shape[2]
        if dy or dx:
            x1 = jnp.pad(
                x1,
                ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0)),
            )
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.features, name="conv")(x, train)


class UNet(nn.Module):
    """Simplified UNet for feature enhancement (ASDQE/ASDQE_model.py:77-111).

    Encoder dims 64/128/256/256 (bilinear => factor 2 on the last down and
    each up), decoder 128/64/64.
    """

    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x1 = DoubleConv(64, name="inc")(x, train)
        x2 = Down(128, name="down1")(x1, train)
        x3 = Down(256, name="down2")(x2, train)
        x4 = Down(256, name="down3")(x3, train)
        y = Up(128, name="up1")(x4, x3, train)
        y = Up(64, name="up2")(y, x2, train)
        y = Up(64, name="up3")(y, x1, train)
        return nn.Conv(self.out_channels, (1, 1), name="outc")(y)


class DenoiseRatePredictor(nn.Module):
    """ASDQE scorer (ASDQE/ASDQE_model.py:123-171).

    ``__call__(lq, result)`` with NHWC float tensors in [0,1]; both are
    zero-padded to a multiple of ``dim`` (=16). Returns (B, 1) in [-1, 1].
    """

    in_channels: int = 3
    dim: int = 16

    @nn.compact
    def __call__(self, lq: jnp.ndarray, gt: jnp.ndarray,
                 train: bool = False,
                 return_features: bool = False) -> jnp.ndarray:
        lq, _ = pad_to_multiple(lq, self.dim, mode="constant")
        gt, _ = pad_to_multiple(gt, self.dim, mode="constant")

        lq_feat = DoubleConv(self.dim, name="lq_extractor")(lq, train)
        gt_feat = DoubleConv(self.dim, name="gt_extractor")(gt, train)
        diff_feat = DoubleConv(self.dim, name="diff_extractor")(lq - gt, train)

        merged = jnp.concatenate([lq_feat, gt_feat, diff_feat], axis=-1)
        enhanced = UNet(self.dim * 3, name="unet")(merged, train)

        z = global_avg_pool(enhanced)
        if return_features:
            # the pre-MLP pooled embedding (B, 3*dim) — used as the default
            # FID feature space (metrics/fid.py). Apply-only path: init
            # with return_features=False so the MLP params exist.
            return z
        z = nn.relu(nn.Dense(256, name="fc1")(z))
        z = nn.Dropout(0.5, deterministic=not train)(z)
        z = nn.relu(nn.Dense(64, name="fc2")(z))
        z = nn.Dropout(0.3, deterministic=not train)(z)
        z = nn.Dense(1, name="fc3")(z)  # final bias zero-init'd, like torch
        return jnp.tanh(z)

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

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.layout import pad_to_multiple
from ..ops.resize import global_avg_pool, max_pool_2x2, resize_bilinear_align_corners


class DoubleConv(nn.Module):
    """(conv 3x3 -> BN -> ReLU) x 2 (ASDQE/ASDQE_model.py:20-34).

    ``dtype`` is the computation dtype (fp32 params throughout — the
    torch-AMP analog the reference trains under, Train/ASDQE.py:104-121).
    flax BatchNorm always computes batch statistics in float32, so
    ``dtype=bfloat16`` matches autocast's "BN in fp32" contract."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(x)
        return nn.relu(x)


class Down(nn.Module):
    """MaxPool2d(2) then DoubleConv (ASDQE/ASDQE_model.py:36-46)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return DoubleConv(self.features, dtype=self.dtype,
                          name="conv")(max_pool_2x2(x), train)


class Up(nn.Module):
    """Bilinear 2x upsample (align_corners), pad-to-match, concat skip,
    DoubleConv (ASDQE/ASDQE_model.py:48-66)."""

    features: int
    dtype: Any = None

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
        return DoubleConv(self.features, dtype=self.dtype,
                          name="conv")(x, train)


class UNet(nn.Module):
    """Simplified UNet for feature enhancement (ASDQE/ASDQE_model.py:77-111).

    Encoder dims 64/128/256/256 (bilinear => factor 2 on the last down and
    each up), decoder 128/64/64.

    ``remat=True`` rematerializes each block in the backward pass
    (jax.checkpoint): only block-boundary activations stay resident, the
    block internals recompute during the gradient sweep. Bitwise-identical
    math, same param tree — it trades ~1 extra forward of FLOPs for the
    activation memory that makes the reference's batch-32 512px training
    step fit in 16 GB HBM (measured 26 GB without it).
    """

    out_channels: int
    remat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # static_argnums: `train` is a Python bool steering BN mode, not
        # a traced value (core_fn args: 0=scope, then __call__ args)
        _rm = lambda cls, n: nn.remat(cls, static_argnums=(n,))
        DC, Dn, U = ((_rm(DoubleConv, 2), _rm(Down, 2), _rm(Up, 3))
                     if self.remat else (DoubleConv, Down, Up))
        dt = self.dtype
        x1 = DC(64, dtype=dt, name="inc")(x, train)
        x2 = Dn(128, dtype=dt, name="down1")(x1, train)
        x3 = Dn(256, dtype=dt, name="down2")(x2, train)
        x4 = Dn(256, dtype=dt, name="down3")(x3, train)
        y = U(128, dtype=dt, name="up1")(x4, x3, train)
        y = U(64, dtype=dt, name="up2")(y, x2, train)
        y = U(64, dtype=dt, name="up3")(y, x1, train)
        return nn.Conv(self.out_channels, (1, 1), dtype=dt, name="outc")(y)


class DenoiseRatePredictor(nn.Module):
    """ASDQE scorer (ASDQE/ASDQE_model.py:123-171).

    ``__call__(lq, result)`` with NHWC float tensors in [0,1]; both are
    zero-padded to a multiple of ``dim`` (=16). Returns (B, 1) in [-1, 1].
    """

    in_channels: int = 3
    dim: int = 16
    remat: bool = False  # trainers set True: block-level jax.checkpoint
    dtype: Any = None    # computation dtype (bf16 = the torch-AMP analog)

    @nn.compact
    def __call__(self, lq: jnp.ndarray, gt: jnp.ndarray,
                 train: bool = False,
                 return_features: bool = False) -> jnp.ndarray:
        lq, _ = pad_to_multiple(lq, self.dim, mode="constant")
        gt, _ = pad_to_multiple(gt, self.dim, mode="constant")

        DC = (nn.remat(DoubleConv, static_argnums=(2,)) if self.remat
              else DoubleConv)
        lq_feat = DC(self.dim, dtype=self.dtype, name="lq_extractor")(lq, train)
        gt_feat = DC(self.dim, dtype=self.dtype, name="gt_extractor")(gt, train)
        diff_feat = DC(self.dim, dtype=self.dtype,
                       name="diff_extractor")(lq - gt, train)

        merged = jnp.concatenate([lq_feat, gt_feat, diff_feat], axis=-1)
        enhanced = UNet(self.dim * 3, name="unet", remat=self.remat,
                        dtype=self.dtype)(merged, train)

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

"""Pixel losses — pure-JAX ports of the reference loss zoo.

Reference: Train/basicsr/models/losses/losses.py (596 LoC) and
loss_util.py:5-95. Every loss is a pure function of (pred, target[, weight,
rng]) returning a scalar (or elementwise map for reduction='none'), usable
directly inside jitted/pjitted train steps.

Notes carried over from the reference, on purpose:
  * "shadow" terms binarize pred/target at a 0.1 threshold with hard
    ``where`` — gradient-free in torch and here alike; they shape the loss
    *value* (and loss weighting between terms), not the gradient direction.
  * L1LossForVideoFrames 'mix' reduction: the reference draws mean-vs-max
    per call but then *overwrites self.reduction permanently on the first
    call* (losses.py:443-447) — a latent bug. Here 'mix' samples per call
    from an explicit PRNG key, which is what the code plainly intended.

New in this framework:
  * ``l2_dice``: the paper's L2-Dice teacher variant (README.md:107 names a
    KDLAE_T_L2Dice.pth weight but no loss class survives in the code —
    SURVEY.md §2.3). Same hq/sr/structure-term weighting as L1-Shadow with
    MSE replacing L1 and a Dice structure term; ``soft`` enables a
    sigmoid-relaxed, differentiable binarization.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

Array = jnp.ndarray
BINARY_THRESH = 0.1  # reference binarization threshold (losses.py:186)


# ------------------------------------------------------------- reductions --

def _weight_reduce(loss: Array, weight: Array | None, reduction: str) -> Array:
    """Port of loss_util.weight_reduce_loss:25-54 (incl. the weighted-mean
    normalization over the weight region)."""
    if weight is not None:
        loss = loss * weight
    if weight is None or reduction == "sum":
        if reduction == "none":
            return loss
        return jnp.mean(loss) if reduction == "mean" else jnp.sum(loss)
    if reduction == "mean":
        if weight.shape[1] > 1:
            denom = jnp.sum(weight)
        else:
            denom = jnp.sum(weight) * loss.shape[1]
        return jnp.sum(loss) / denom
    return loss  # 'none'


def _spatial_max_reduce(loss: Array) -> Array:
    """'max' reduction (losses.py:482-487): mean over H,W, max over frames,
    mean over batch."""
    per_channel = jnp.mean(loss, axis=(2, 3))
    return jnp.mean(jnp.max(per_channel, axis=1))


def _binarize(x: Array, thresh: float = BINARY_THRESH) -> Array:
    return jnp.where(x > thresh, 1.0, 0.0).astype(x.dtype)


# ----------------------------------------------------------- basic losses --

def l1_loss(pred: Array, target: Array, weight: Array | None = None,
            reduction: str = "mean", loss_weight: float = 1.0) -> Array:
    return loss_weight * _weight_reduce(jnp.abs(pred - target), weight, reduction)


def mse_loss(pred: Array, target: Array, weight: Array | None = None,
             reduction: str = "mean", loss_weight: float = 1.0) -> Array:
    return loss_weight * _weight_reduce(jnp.square(pred - target), weight, reduction)


def charbonnier_loss(pred: Array, target: Array, eps: float = 1e-3,
                     **_: Any) -> Array:
    """losses.py:585-596 (loss_weight/reduction accepted-but-ignored there;
    we ignore them too for parity)."""
    diff = pred - target
    return jnp.mean(jnp.sqrt(diff * diff + eps * eps))


def psnr_loss(pred: Array, target: Array, loss_weight: float = 1.0,
              to_y: bool = False, **_: Any) -> Array:
    """losses.py:558-583: loss = w * (10/ln10) * mean(log(mse + 1e-8));
    minimizing it maximizes PSNR."""
    if to_y:
        coef = jnp.array([65.481, 128.553, 24.966], pred.dtype)
        # NHWC channel contraction (reference is NCHW: losses.py:566,576)
        pred = (pred * coef).sum(-1, keepdims=True) + 16.0
        target = (target * coef).sum(-1, keepdims=True) + 16.0
        pred, target = pred / 255.0, target / 255.0
    scale = 10.0 / jnp.log(jnp.asarray(10.0, pred.dtype))
    axes = tuple(range(1, pred.ndim))
    mse = jnp.mean(jnp.square(pred - target), axis=axes)
    return loss_weight * scale * jnp.mean(jnp.log(mse + 1e-8))


# ---------------------------------------------------------- sonar losses --

def l1_loss_sonar(pred: Array, target: Array, weight: Array | None = None,
                  reduction: str = "mean", loss_weight: float = 1.0,
                  binary: float = BINARY_THRESH) -> Array:
    """losses.py:25-65: L1 + L1 on >thresh binarized maps (weight applies
    to the L1 term only, as in the reference)."""
    shadow = _weight_reduce(
        jnp.abs(_binarize(pred, binary) - _binarize(target, binary)), None, reduction)
    main = _weight_reduce(jnp.abs(pred - target), weight, reduction)
    return loss_weight * (shadow + main)


def l1_loss_channel(pred: Array, target: Array, weight: Array | None = None,
                    reduction: str = "mean", loss_weight: float = 1.0,
                    channel: int | None = None) -> Array:
    """losses.py:67-103, channel axis = -1 (NHWC)."""
    if channel is not None:
        pred = pred[..., channel:channel + 1]
        target = target[..., channel:channel + 1]
        if weight is not None:
            weight = weight[..., channel:channel + 1]
    return loss_weight * _weight_reduce(jnp.abs(pred - target), weight, reduction)


def _shadow(pred: Array, target: Array, weight: Array | None,
            reduction: str, loss_weight: float) -> Array:
    return loss_weight * _weight_reduce(
        jnp.abs(_binarize(pred) - _binarize(target)), weight, reduction)


def l1_loss_sr(pred: dict, target: dict, weight: Array | None = None,
               reduction: str = "mean", loss_weight: float = 1.0) -> Array:
    """The teacher "L1-Shadow" loss (losses.py:135-194, used by KDLAET.yml):
    0.5*L1(hq) + 0.25*L1(sr) + 0.25*(shadow(hq)+shadow(sr)); sr=None ok.
    pred/target are {'hq': ..., 'sr': ...} dicts."""
    hl_shadow = _shadow(pred["hq"], target["hq"], weight, reduction, loss_weight)
    hl = loss_weight * _weight_reduce(
        jnp.abs(pred["hq"] - target["hq"]), weight, reduction)
    if pred.get("sr") is not None:
        sr_shadow = _shadow(pred["sr"], target["sr"], weight, reduction, loss_weight)
        sr = loss_weight * _weight_reduce(
            jnp.abs(pred["sr"] - target["sr"]), weight, reduction)
    else:
        sr_shadow = 0.0
        sr = 0.0
    return 0.5 * hl + 0.25 * sr + 0.25 * (hl_shadow + sr_shadow)


def _dice(pred_bin: Array, target_bin: Array, eps: float = 1e-6) -> Array:
    inter = jnp.sum(pred_bin * target_bin)
    return 1.0 - (2.0 * inter + eps) / (jnp.sum(pred_bin) + jnp.sum(target_bin) + eps)


def l2_dice(pred: dict, target: dict, weight: Array | None = None,
            reduction: str = "mean", loss_weight: float = 1.0,
            soft: bool = False, sharpness: float = 50.0) -> Array:
    """L2-Dice teacher variant (config-exposed analog of L1-Shadow; the
    paper's KDLAE_T_L2Dice.pth — SURVEY.md §2.3 note). Same 0.5/0.25/0.25
    term weighting with MSE + Dice structure term. ``soft`` relaxes the
    binarization with a sigmoid so the structure term carries gradient."""

    def binz(x):
        if soft:
            return jax.nn.sigmoid((x - BINARY_THRESH) * sharpness)
        return _binarize(x)

    hq_mse = loss_weight * _weight_reduce(
        jnp.square(pred["hq"] - target["hq"]), weight, reduction)
    hq_dice = loss_weight * _dice(binz(pred["hq"]), binz(target["hq"]))
    if pred.get("sr") is not None:
        sr_mse = loss_weight * _weight_reduce(
            jnp.square(pred["sr"] - target["sr"]), weight, reduction)
        sr_dice = loss_weight * _dice(binz(pred["sr"]), binz(target["sr"]))
    else:
        sr_mse, sr_dice = 0.0, 0.0
    return 0.5 * hq_mse + 0.25 * sr_mse + 0.25 * (hq_dice + sr_dice)


def l1_loss_weight(pred: Array, target: Array, weight: Array | None = None,
                   reduction: str = "mean", loss_weight: float = 1.0,
                   sigma: float = 2.0, w_range=(1.5, 1.0),
                   invert: bool = False) -> Array:
    """Gaussian channel/frame-weighted L1 (losses.py:196-277). Channel axis
    is 1 here, matching the (N, C, H, W) frame-stack layout the trainer
    uses for student batches."""
    loss = jnp.abs(pred - target)
    c = pred.shape[1]
    pos = jnp.arange(c, dtype=pred.dtype)
    mid = (c - 1) / 2.0
    g = jnp.exp(-0.5 * ((pos - mid) / sigma) ** 2)
    if invert:
        g = 1 - g
    max_w, min_w = w_range
    g = min_w + (max_w - min_w) * (g - g.min()) / (g.max() - g.min())
    loss = loss * g.reshape(1, c, 1, 1)
    if weight is not None:
        loss = loss * weight
    if reduction == "mean":
        return loss_weight * jnp.mean(loss)
    if reduction == "sum":
        return loss_weight * jnp.sum(loss)
    if reduction == "max":
        return loss_weight * _spatial_max_reduce(loss)
    return loss_weight * loss


def l1_loss_video_frames(pred: Array, target: Array,
                         weight: Array | None = None,
                         reduction: str = "mean",
                         l1loss_weight: float = 0.64,
                         temporal_weight: float = 0.36,
                         binary: float = BINARY_THRESH,
                         rng: jax.Array | None = None, **_: Any) -> Array:
    """The student loss (losses.py:409-526, KDLAES.yml 0.9/0.1 weights).

    pred/target: (N, F, H, W) frame stacks. Per-frame |d| + |bin-bin| plus
    temporal consistency |Δpred - Δtarget| between adjacent frames.
    'mix' draws mean-vs-max per call (p(mean)=0.64) from ``rng``.
    """
    if reduction == "mix":
        if rng is None:
            raise ValueError("reduction='mix' needs a PRNG key")
        use_mean = jax.random.uniform(rng) < 0.64
        return jax.lax.cond(
            use_mean,
            partial(l1_loss_video_frames, reduction="mean",
                    l1loss_weight=l1loss_weight,
                    temporal_weight=temporal_weight, binary=binary),
            partial(l1_loss_video_frames, reduction="max",
                    l1loss_weight=l1loss_weight,
                    temporal_weight=temporal_weight, binary=binary),
            pred, target, weight,
        )

    per_frame = jnp.abs(pred - target) + jnp.abs(
        _binarize(pred, binary) - _binarize(target, binary))
    if weight is not None:
        per_frame = per_frame * weight

    def reduce(x):
        if reduction == "mean":
            return jnp.mean(x)
        if reduction == "sum":
            return jnp.sum(x)
        if reduction == "max":
            return _spatial_max_reduce(x)
        return x

    if pred.shape[1] > 1:
        d_pred = pred[:, 1:] - pred[:, :-1]
        d_target = target[:, 1:] - target[:, :-1]
        temporal = reduce(jnp.abs(d_pred - d_target))
        return l1loss_weight * reduce(per_frame) + temporal_weight * temporal
    return l1loss_weight * reduce(per_frame)

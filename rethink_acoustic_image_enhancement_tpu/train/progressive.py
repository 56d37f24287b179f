"""Progressive learning schedule (the "KD curriculum").

The reference anneals patch size, batch size and corruption probability
across stages inside the hot loop (Train/basicsr/train.py:374-448):
config arrays ``iters / mini_batch_sizes / gt_sizes / probs``; the stage is
the index of the first cumulative-iters boundary past the current
iteration; the loaded max-size batch is randomly subsampled and sub-cropped
to the stage's sizes, and extra Bernoulli masking is applied when the
stage prob exceeds the dataset's base prob.

TPU mapping: stage selection is a host-side pure function; each distinct
(mini_batch, gt_size) pair is one compiled train step (a handful of
buckets). Sub-crop offsets and the extra mask are *traced* inside the step
(dynamic_slice with static sizes + traced offsets/prob), so the per-stage
recompiles are exactly the bucket count and nothing else.

The reference's host-side per-pixel masking loops (train.py:431-448) were
a known CPU bottleneck (SURVEY.md §3.1); here masking runs on-device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mask import input_mask


@dataclass(frozen=True)
class ProgressiveSchedule:
    """Pure stage lookup (train.py:374-387)."""

    iters: Sequence[int]
    mini_batch_sizes: Sequence[int]
    gt_sizes: Sequence[int]
    probs: Sequence[float] = ()
    gt_size: int = 0  # max patch size (dataset-level crop)
    base_prob: float = 0.0

    def __post_init__(self):
        n = len(self.iters)
        assert len(self.mini_batch_sizes) == n and len(self.gt_sizes) == n
        if self.probs:
            assert len(self.probs) == n
        object.__setattr__(self, "_groups", np.cumsum(self.iters))

    def stage(self, current_iter: int) -> int:
        groups = self._groups
        j = np.nonzero(current_iter <= groups)[0]
        return int(j[0]) if len(j) else len(groups) - 1

    def at(self, current_iter: int) -> tuple[int, int, float]:
        """(mini_batch_size, mini_gt_size, mini_prob) for this iteration."""
        s = self.stage(current_iter)
        prob = self.probs[s] if self.probs else self.base_prob
        return self.mini_batch_sizes[s], self.gt_sizes[s], prob

    def buckets(self) -> list[tuple[int, int]]:
        """Distinct (batch, patch) pairs -> number of compiled steps."""
        return sorted(set(zip(self.mini_batch_sizes, self.gt_sizes)))

    @classmethod
    def from_dataset_opt(cls, opt: dict) -> "ProgressiveSchedule | None":
        if "mini_batch_sizes" not in opt:
            return None
        return cls(
            iters=opt["iters"],
            mini_batch_sizes=opt["mini_batch_sizes"],
            gt_sizes=opt["gt_sizes"],
            probs=opt.get("probs", ()),
            gt_size=opt["gt_size"],
            base_prob=opt.get("prob", 0.0),
        )


def subsample_batch(batch, indices: np.ndarray):
    """Host-side random subsample to the stage's mini batch
    (train.py:394-406)."""
    return jax.tree.map(lambda x: x[indices], batch)


def _crop2d(x: jnp.ndarray, y0, x0, size: int, scale: int = 1):
    """dynamic_slice crop of an NHWC tensor at scaled offsets."""
    b, _, _, c = x.shape
    return jax.lax.dynamic_slice(
        x, (0, y0 * scale, x0 * scale, 0), (b, size * scale, size * scale, c))


def stage_crop(lq, gt, rng: jax.Array, gt_size: int, mini_gt_size: int,
               scale: int = 1, sr_scale: int = 2):
    """On-device sub-crop to the stage patch size (train.py:407-429).

    lq is NHWC or {'img','denoise_rate'}; gt is NHWC, {'hq','sr'}, or
    (B, F, H, W) frame stacks (cropped on the last two axes).
    """
    if mini_gt_size >= gt_size:
        return lq, gt
    ry, rx = jax.random.split(rng)
    # reference: int((gt_size - mini) * random.random()) -> uniform [0, d-1]
    d = gt_size - mini_gt_size
    y0 = jax.random.randint(ry, (), 0, d)
    x0 = jax.random.randint(rx, (), 0, d)

    def crop(x, s):
        if x is None:
            return None
        if x.ndim == 4 and x.shape[-1] in (1, 3):  # NHWC
            return _crop2d(x, y0, x0, mini_gt_size, s)
        # (B, F, H, W) frame stack: crop H, W
        b, f = x.shape[:2]
        return jax.lax.dynamic_slice(
            x, (0, 0, y0 * s, x0 * s), (b, f, mini_gt_size * s, mini_gt_size * s))

    if isinstance(lq, dict):
        lq = {k: crop(v, 1) for k, v in lq.items()}
    else:
        lq = crop(lq, 1)
    if isinstance(gt, dict):
        gt = {"hq": crop(gt.get("hq"), scale), "sr": crop(gt.get("sr"), sr_scale)}
    else:
        gt = crop(gt, scale)
    return lq, gt


def stage_extra_mask(lq, rng: jax.Array, extra_prob, value: float = 0.1):
    """On-device extra Bernoulli masking when the stage prob exceeds the
    dataset base prob (train.py:431-448); applied to lq['img'] / lq only,
    per-channel independent like the reference. ``extra_prob`` may be a
    traced scalar; <= 0 disables (via the mask op's clip to [0,1] the
    no-op case is exact: prob 0 keeps everything)."""
    target = lq["img"] if isinstance(lq, dict) else lq
    masked = input_mask(target, rng, jnp.maximum(extra_prob, 0.0), value)
    out = jnp.where(jnp.asarray(extra_prob) > 0, masked, target)
    if isinstance(lq, dict):
        return {**lq, "img": out}
    return out

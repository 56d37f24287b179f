"""Teacher -> student distillation flow.

The reference distills OFFLINE: the teacher denoises the whole noisy-frame
corpus first, and the student config simply points ``dataroot_gt`` at the
teacher's output folder (KDLAES.yml:16 -> denoise/
RestormerSuperResolutionParam2) while ``dataroot_lq`` stays at the noisy
originals. Two entry points here:

  * ``generate_teacher_targets`` — the offline corpus pass (the
    infer-teacher CLI over a folder, with fan-beam zero-masking), producing
    a drop-in ``dataroot_gt``.
  * ``make_online_target_fn`` — an in-the-loop variant (new capability):
    a jitted frozen-teacher forward that turns a grayscale frame stack
    (B, F, H, W) into denoised targets on device, so the student can train
    without materializing the corpus. Gray frames are replicated to RGB
    for the teacher and reduced back by channel mean.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..eval.infer import TeacherPredictor
from ..models import KDLAETeacher
from ..utils.image_io import imread_rgb, imwrite, list_images


def generate_teacher_targets(
    predictor: TeacherPredictor,
    lq_dir: str,
    out_dir: str,
    denoise_rate: float = 1.0,
    zero_mask: bool = True,
    log: Callable[[str], None] = print,
) -> int:
    """Denoise every image in lq_dir into out_dir (same basenames) — the
    offline distillation corpus pass."""
    os.makedirs(out_dir, exist_ok=True)
    paths = list_images(lq_dir)
    for k, path in enumerate(paths):
        out = predictor(imread_rgb(path), denoise_rate, zero_mask=zero_mask)
        imwrite(os.path.join(out_dir, os.path.basename(path)), out["hq"])
        if (k + 1) % 50 == 0:
            log(f"[distill] {k + 1}/{len(paths)}")
    log(f"[distill] wrote {len(paths)} teacher targets to {out_dir}")
    return len(paths)


def make_online_target_fn(teacher: KDLAETeacher, teacher_params,
                          denoise_rate: float = 1.0,
                          dtype=jnp.bfloat16) -> Callable:
    """jitted (B, F, H, W) grayscale stack -> denoised same-shape targets
    via the frozen teacher (stop-gradient). H, W must be multiples of 8."""

    @jax.jit
    def target_fn(lq_stack: jnp.ndarray) -> jnp.ndarray:
        b, f, h, w = lq_stack.shape
        frames = lq_stack.reshape(b * f, h, w)[..., None].astype(dtype)
        rgb = jnp.repeat(frames, 3, axis=-1)
        rate = jnp.full((b * f, h, w, 1), denoise_rate, dtype)
        out = teacher.apply({"params": teacher_params},
                            {"img": rgb, "denoise_rate": rate})
        hq = jnp.clip(out["hq"], 0.0, 1.0)
        gray = jnp.mean(hq.astype(jnp.float32), axis=-1)
        return jax.lax.stop_gradient(gray.reshape(b, f, h, w))

    return target_fn

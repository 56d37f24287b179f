"""Metric registry — any name here is addressable from YAML ``val.metrics``
(reference: image_restoration_model.py:324-336 getattr dispatch)."""

from __future__ import annotations

from .niqe import calculate_niqe  # noqa: F401
from .psnr_ssim import (  # noqa: F401
    calculate_psnr,
    calculate_ssim,
    calculate_ssim_2d,
)

METRICS = {
    "calculate_psnr": calculate_psnr,
    "calculate_ssim": calculate_ssim,
    "calculate_ssim_2d": calculate_ssim_2d,
    "calculate_niqe": calculate_niqe,
}


def get_metric(name: str):
    if name not in METRICS:
        raise KeyError(f"unknown metric {name!r}; known: {sorted(METRICS)}")
    return METRICS[name]


__all__ = ["calculate_psnr", "calculate_ssim", "calculate_ssim_2d",
           "METRICS", "get_metric"]

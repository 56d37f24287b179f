"""FID machinery (port of Train/basicsr/metrics/fid.py's math).

The Fréchet distance between two Gaussians fitted to feature sets, plus
feature-statistics extraction with a pluggable feature function. The
reference uses torchvision's pretrained InceptionV3 as the feature
extractor; pretrained weights can't be assumed here, so the extractor is
an argument — pass any (N, H, W, C) -> (N, D) callable (e.g. a converted
Inception, or a domain-specific embedding like ASDQE's pooled features).
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
from scipy import linalg


def calculate_stats(features: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of an (N, D) feature matrix."""
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def extract_features(batches: Iterable[np.ndarray],
                     feature_fn: Callable[[np.ndarray], np.ndarray]) -> np.ndarray:
    return np.concatenate([np.asarray(feature_fn(b)) for b in batches], axis=0)


def calculate_fid(mu1: np.ndarray, sigma1: np.ndarray,
                  mu2: np.ndarray, sigma2: np.ndarray,
                  eps: float = 1e-6) -> float:
    """Fréchet distance ||mu1-mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2))
    (fid.py's calculate_fid, the standard TTUR implementation)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"imaginary component {np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def fid_between_feature_sets(f1: np.ndarray, f2: np.ndarray) -> float:
    return calculate_fid(*calculate_stats(f1), *calculate_stats(f2))

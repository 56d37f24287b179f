"""FID machinery (port of Train/basicsr/metrics/fid.py's math).

The Fréchet distance between two Gaussians fitted to feature sets, plus
feature-statistics extraction with a pluggable feature function. The
reference uses torchvision's pretrained InceptionV3 as the feature
extractor; pretrained weights can't be assumed here, so the extractor is
an argument — pass any (N, H, W, C) -> (N, D) callable (e.g. a converted
Inception, or a domain-specific embedding like ASDQE's pooled features).
"""

from __future__ import annotations

import os
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


def make_asdqe_feature_fn(params=None, batch_stats=None, seed: int = 0):
    """The shipped default FID feature extractor: the ASDQE scorer's
    pre-MLP pooled embedding ((N, H, W, 3) [0,1] -> (N, 48)), computed
    with lq = gt = batch so the diff branch is silent.

    Pass trained ASDQE ``params``/``batch_stats`` (orbax or converted
    .pth) for a quality-aware feature space. With none given, the
    in-repo TRAINED scorer (artifacts/asdqe_full50ep/weights — the full
    reference Train/ASDQE.py budget driven on-chip) is used when
    present; failing that, a seeded-random ASDQE — untrained-CNN FID
    features are a known valid substitute when no pretrained embedding
    exists, and the fixed seed keeps scores comparable across runs. The
    ``feature_fn`` slot of ``extract_features`` stays pluggable for
    Inception et al.
    """
    import jax
    import jax.numpy as jnp

    from ..models.asdqe import DenoiseRatePredictor

    model = DenoiseRatePredictor()
    feature_space = "asdqe-user-params"
    if params is None:
        from ..train.checkpoints import load_asdqe_weights, shipped_asdqe_dir

        loaded = load_asdqe_weights()
        if loaded is not None:
            params, batch_stats = loaded
            feature_space = f"asdqe-trained({shipped_asdqe_dir()})"
    if params is None:
        x0 = jnp.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(seed), x0, x0)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        feature_space = f"asdqe-seeded-random(seed={seed})"
    if feature_space != "asdqe-user-params":
        # which embedding got auto-selected decides whether FID values are
        # comparable across checkouts — say so (ADVICE r3 #2)
        print(f"[fid] feature space: {feature_space}")

    @jax.jit
    def fwd(x):
        return model.apply({"params": params,
                            "batch_stats": batch_stats or {}},
                           x, x, return_features=True)

    def feature_fn(batch: np.ndarray) -> np.ndarray:
        x = jnp.asarray(np.asarray(batch, np.float32))
        if x.ndim == 3:
            x = x[None]
        return np.asarray(fwd(x))

    feature_fn.feature_space = feature_space  # machine-readable record
    return feature_fn


def fid_between_folders(dir1: str, dir2: str, feature_fn=None,
                        inception_weights: str | None = None) -> float:
    """End-to-end FID between two image folders — usable without any
    external weights (default ASDQE feature space, see
    ``make_asdqe_feature_fn``). Pass ``inception_weights`` (a
    user-supplied torchvision/pytorch-fid InceptionV3 ``.pth``) for
    literature-comparable pool3-space FID (``metrics/inception.py``).
    Images are scored one by one (global average pooling makes the
    embedding size-independent)."""
    from ..utils.image_io import imread_rgb, list_images

    if feature_fn is None and inception_weights:
        from .inception import make_inception_feature_fn

        feature_fn = make_inception_feature_fn(inception_weights)
    feature_fn = feature_fn or make_asdqe_feature_fn()

    def feats(folder):
        paths = list_images(folder)
        if len(paths) < 2:
            raise ValueError(f"need >=2 images in {folder} to fit stats")
        return extract_features((imread_rgb(p)[None] for p in paths),
                                feature_fn)

    return fid_between_feature_sets(feats(dir1), feats(dir2))

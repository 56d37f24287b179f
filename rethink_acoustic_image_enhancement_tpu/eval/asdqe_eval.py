"""ASDQE evaluation protocol — the paper's benchmark harness.

Port of ASDQE/ASDQE_test.py: score each method directory against the
originals (name-matched sorted pairs), compute per-method statistics
(mean/std/min/25/50/75/max), print a comparison table, and write
``stats_transposed.csv`` with the same layout/precision.
"""

from __future__ import annotations

import csv
import os
from typing import Mapping

import numpy as np

from ..utils.image_io import imread_rgb_ubyte
from .infer import ASDQEScorer

STAT_KEYS = ("mean", "std", "min", "25%", "50%", "75%", "max")


def paired_files(lq_dir: str, method_dir: str) -> list[tuple[str, str]]:
    """Name-matched sorted pairing (ASDQE_test.py:26-50); raises on count or
    basename mismatch, like the reference."""
    lq_files = sorted(os.listdir(lq_dir))
    gt_files = sorted(os.listdir(method_dir))
    if len(lq_files) != len(gt_files):
        raise ValueError(
            f"image count mismatch: {len(lq_files)} in {lq_dir} vs "
            f"{len(gt_files)} in {method_dir}")
    for a, b in zip(lq_files, gt_files):
        if os.path.splitext(a)[0] != os.path.splitext(b)[0]:
            raise ValueError(f"file names do not match: {a} vs {b}")
    return [(os.path.join(lq_dir, a), os.path.join(method_dir, b))
            for a, b in zip(lq_files, gt_files)]


def calculate_statistics(values: np.ndarray) -> dict[str, float]:
    """ASDQE_test.py:107-119."""
    return {
        "mean": float(np.mean(values)),
        "std": float(np.std(values)),
        "min": float(np.min(values)),
        "25%": float(np.percentile(values, 25)),
        "50%": float(np.percentile(values, 50)),
        "75%": float(np.percentile(values, 75)),
        "max": float(np.max(values)),
    }


def score_method(scorer: ASDQEScorer, lq_dir: str, method_dir: str,
                 verbose: bool = True) -> np.ndarray:
    """Batch-1 scoring of one method directory (images differ in size, so
    each pair is its own forward; identical sizes reuse the jit cache).

    Pipelined: a one-slot worker thread decodes + uploads pair k+1 while
    pair k computes on device and pair k-1's scalar fetch resolves on the
    main thread — the scores are bit-identical to the sequential loop
    (same program, same fp32 matmul pinning; only the overlap changes).
    uint8 boundary: 4x less H2D; the scorer's in-jit f32 /255 reproduces
    imread_rgb's values exactly (the BASELINE parity contract holds)."""
    from concurrent.futures import ThreadPoolExecutor

    pairs = paired_files(lq_dir, method_dir)

    def _load_upload(pq):
        return scorer.upload(imread_rgb_ubyte(pq[0]), imread_rgb_ubyte(pq[1]))

    preds = []
    pending = None
    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = ex.submit(_load_upload, pairs[0]) if pairs else None
        for i in range(len(pairs)):
            uploaded = fut.result()
            fut = (ex.submit(_load_upload, pairs[i + 1])
                   if i + 1 < len(pairs) else None)
            handle = scorer.dispatch(uploaded)
            if pending is not None:
                preds.append(np.asarray(pending).reshape(-1)[0])
            pending = handle
    if pending is not None:
        preds.append(np.asarray(pending).reshape(-1)[0])
    return np.asarray(preds, np.float64)


def run_asdqe_eval(
    scorer: ASDQEScorer,
    base_lq_dir: str,
    methods: Mapping[str, str],
    csv_path: str | None = "stats_transposed.csv",
    verbose: bool = True,
) -> dict[str, dict[str, float]]:
    """Evaluate every method dir vs originals; returns {method: stats}."""
    all_stats: dict[str, dict[str, float]] = {}
    for name, gt_dir in methods.items():
        if verbose:
            print(f"===== Processing denoising method: {name} =====")
        preds = score_method(scorer, base_lq_dir, gt_dir, verbose)
        stats = calculate_statistics(preds)
        all_stats[name] = stats
        if verbose:
            for k in STAT_KEYS:
                print(f"{k}: {stats[k]:.6f}")
    if verbose:
        print("\n===== Statistical data comparison of different denoising methods =====")
        print(format_stats_table(all_stats))
    if csv_path:
        write_stats_csv(all_stats, csv_path)
    return all_stats


def format_stats_table(all_stats: Mapping[str, Mapping[str, float]]) -> str:
    methods = list(all_stats)
    rows = [" ".join([f"{'':>6}"] + [f"{m:>14}" for m in methods])]
    for k in STAT_KEYS:
        rows.append(" ".join(
            [f"{k:>6}"] + [f"{all_stats[m][k]:>14.6f}" for m in methods]))
    return "\n".join(rows)


def write_stats_csv(all_stats: Mapping[str, Mapping[str, float]],
                    path: str) -> None:
    """Transposed CSV: rows = stats, columns = methods (ASDQE_test.py:128-133
    pandas ``stats_df.T.to_csv`` layout, float_format %.6f)."""
    methods = list(all_stats)
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow([""] + methods)
        for k in STAT_KEYS:
            writer.writerow([k] + [f"{all_stats[m][k]:.6f}" for m in methods])


def default_methods(sample_root: str, dataset: str = "MDD") -> tuple[str, dict]:
    """The reference's shipped protocol (ASDQE_test.py:139-149)."""
    base = os.path.join(sample_root, dataset, "origin")
    denoise = os.path.join(sample_root, dataset, "denoise")
    return base, {
        "origin": base,
        "Teacher": os.path.join(denoise, "KDLAE-T"),
        "Student@0.05": os.path.join(denoise, "KDLAE-S_prob@0.05"),
    }

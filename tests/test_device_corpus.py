"""Device-resident student corpus: on-device batch generation semantics
vs the host Dataset_PairedMutiImage pipeline, and end-to-end training.

The randomness streams differ (threaded PRNG keys vs host Generators), so
the contract is distributional/structural equivalence of every pipeline
stage (crop geometry, corruption rates, interpolation structure, aug
coverage), not bitwise item parity — plus determinism per key.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.train.device_corpus import (
    StudentDeviceCorpus,
    _augment8,
)
from rethink_acoustic_image_enhancement_tpu.utils.image_io import imwrite


@pytest.fixture(scope="module")
def corpus_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    for sub in ("lq", "gt"):
        os.makedirs(root / sub, exist_ok=True)
    for i in range(12):
        img = rng.integers(30, 220, (48, 56), dtype=np.uint8)
        imwrite(str(root / "gt" / f"{i}_f.png"), img, rgb=False)
        imwrite(str(root / "lq" / f"{i}_f.png"),
                np.clip(img + rng.normal(0, 15, img.shape), 0, 255
                        ).astype(np.uint8), rgb=False)
    return root


def _opt(root, **kw):
    return {
        "type": "Dataset_PairedMutiImage", "phase": "train", "scale": 1,
        "dataroot_lq": str(root / "lq"), "dataroot_gt": str(root / "gt"),
        "num_pairs": 5, "stride_range": [1, 1], "prob": 0.1,
        "gt_size": 32, "geometric_augs": True, "seed": 3, **kw,
    }


def test_corpus_shapes_and_determinism(corpus_root):
    c = StudentDeviceCorpus(_opt(corpus_root))
    assert c.lq.shape == c.gt.shape and c.lq.shape[0] == 12
    key = jax.random.PRNGKey(0)
    lq, gt = c.sample_batch(key, [0, 1, 2], gt_size=32)
    assert lq.shape == gt.shape == (3, 5, 32, 32)
    lq2, gt2 = c.sample_batch(key, [0, 1, 2], gt_size=32)
    np.testing.assert_array_equal(np.asarray(lq), np.asarray(lq2))
    lq3, _ = c.sample_batch(jax.random.PRNGKey(1), [0, 1, 2], gt_size=32)
    assert not np.array_equal(np.asarray(lq), np.asarray(lq3))


def test_gt_is_clean_crop_of_corpus(corpus_root):
    """gt must be an uncorrupted crop: every gt frame of every sampled
    item appears verbatim in the corpus (up to the aug transform)."""
    c = StudentDeviceCorpus(_opt(corpus_root, geometric_augs=False))
    _, gt = c.sample_batch(jax.random.PRNGKey(7), [0], gt_size=24)
    g = np.asarray(gt)[0, 0]
    full = np.asarray(c.gt[np.asarray(c.groups)[0, 0]])
    # find the crop offset by exhaustive match
    found = any(
        np.array_equal(full[t:t + 24, l:l + 24], g)
        for t in range(full.shape[0] - 23) for l in range(full.shape[1] - 23))
    assert found, "gt frame is not a verbatim corpus crop"


def test_corruption_rates_match_host_semantics(corpus_root):
    """Mask-mode/interp-mode mix and per-frame drop rates track the host
    pipeline's (64% mode split, prob / prob+0.5 masks)."""
    prob = 0.2
    c = StudentDeviceCorpus(_opt(corpus_root, prob=prob,
                                 geometric_augs=False))
    drops = []
    for s in range(40):
        lq, gt = c.sample_batch(jax.random.PRNGKey(s), [s % len(c)],
                                gt_size=32)
        lq, gt = np.asarray(lq)[0], np.asarray(gt)[0]
        # masked pixels are forced to -value (=-0.1): measurable drop rate
        drops.append((lq == pytest.approx(-0.1)).mean()
                     if False else np.mean(lq <= -0.0999))
    mean_drop = float(np.mean(drops))
    # expectation: mode mix .64 * E[frame probs: .64*prob + .36*(prob+.5)]
    # + .36 * interp-mode E[...] -> both ≈ prob + .18 .. prob + .25 band
    assert 0.25 <= mean_drop <= 0.55, mean_drop


def test_augment8_matches_host_modes():
    from rethink_acoustic_image_enhancement_tpu.data.transforms import (
        data_augmentation,
    )

    img = np.arange(16.0, dtype=np.float32).reshape(4, 4)
    for mode in range(8):
        want = data_augmentation(img, mode)
        got = np.asarray(_augment8(jnp.asarray(img), jnp.asarray(mode)))
        np.testing.assert_array_equal(got, want, err_msg=f"mode {mode}")


def test_epoch_reroll_changes_groups(corpus_root):
    c = StudentDeviceCorpus(_opt(corpus_root, stride_range=[1, 2]))
    g0 = np.asarray(c.groups).copy()
    c.set_epoch(1)
    g1 = np.asarray(c.groups)
    assert g0.shape == g1.shape
    assert not np.array_equal(g0, g1)  # stride reroll happened


def test_train_from_config_device_resident(corpus_root, tmp_path):
    """End-to-end: raie-train body with device_resident: true — per-iter
    host->device traffic is just the key + group ids."""
    from rethink_acoustic_image_enhancement_tpu.train.loop import (
        train_from_config,
    )

    opt = {
        "name": "smoke_devres", "model_type": "ImageCleanModel", "scale": 1,
        "manual_seed": 0, "is_train": True,
        "datasets": {"train": {
            **_opt(corpus_root), "name": "TrainSet", "device_resident": True,
            "use_shuffle": True, "num_worker_per_gpu": 1,
            "batch_size_per_gpu": 4, "dataset_enlarge_ratio": 1,
            "mini_batch_sizes": [4, 2], "iters": [2, 2],
            "gt_sizes": [16, 32], "probs": [0.1, 0.3],
        }},
        "network_g": {"type": "KDLAE_student", "inp_channels": 1,
                      "out_channels": 1, "residual": True,
                      "hidden_channels": [4, 8]},
        "path": {"pretrain_network_g": None, "resume_state": None,
                 "models": str(tmp_path / "m"),
                 "training_states": str(tmp_path / "s"),
                 "log": str(tmp_path / "log")},
        "train": {"total_iter": 4, "warmup_iter": -1, "use_grad_clip": True,
                  "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                                "periods": [4], "restart_weights": [1],
                                "eta_mins": [1e-4]},
                  "optim_g": {"type": "AdamW", "lr": 1e-3,
                              "weight_decay": 0.0, "betas": [0.9, 0.999]},
                  "pixel_opt": {"type": "L1LossForVideoFrames",
                                "loss_weight": 1, "reduction": "mean",
                                "l1loss_weight": 0.9,
                                "temporal_weight": 0.1}},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 0},
    }
    state = train_from_config(opt)
    assert int(state.step) == 4
    flat = jax.tree.leaves(jax.device_get(state.params))
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)


# ---------------------------------------------------------------- teacher --

@pytest.fixture(scope="module")
def teacher_root(tmp_path_factory):
    """4-modality teacher corpus: lq/gt at 1x, sr at exactly 2x, JSON
    denoise rates."""
    import json

    root = tmp_path_factory.mktemp("teacher")
    rng = np.random.default_rng(1)
    for sub in ("lq", "gt", "sr", "params"):
        os.makedirs(root / sub, exist_ok=True)
    for i in range(6):
        name = f"img{i:03d}"
        h, w = 40 + 2 * i, 44 + 2 * i  # heterogeneous sizes
        gt = rng.integers(20, 230, (h, w, 3), dtype=np.uint8)
        imwrite(str(root / "gt" / f"{name}.png"), gt, rgb=True)
        imwrite(str(root / "lq" / f"{name}.png"),
                np.clip(gt + rng.normal(0, 10, gt.shape), 0, 255
                        ).astype(np.uint8), rgb=True)
        imwrite(str(root / "sr" / f"{name}.png"),
                rng.integers(20, 230, (2 * h, 2 * w, 3), dtype=np.uint8),
                rgb=True)
        (root / "params" / f"{name}.json").write_text(
            json.dumps({"denoise_rate": 0.1 * i}))
    return root


def _teacher_opt(root, **kw):
    return {
        "type": "Dataset_SuperRestoration_param", "phase": "train",
        "scale": 1, "dataroot_lq": str(root / "lq"),
        "dataroot_gt": str(root / "gt"), "dataroot_sr": str(root / "sr"),
        "dataroot_param": str(root / "params"), "gt_size": 24,
        "geometric_augs": True, "seed": 5, **kw,
    }


def test_teacher_corpus_shapes_and_determinism(teacher_root):
    from rethink_acoustic_image_enhancement_tpu.train.device_corpus import (
        TeacherDeviceCorpus,
    )

    c = TeacherDeviceCorpus(_teacher_opt(teacher_root))
    assert len(c) == 6
    th, tw = c.frame_hw
    assert c.sr.shape[1:3] == (2 * th, 2 * tw)
    key = jax.random.PRNGKey(0)
    lq, gt = c.sample_batch(key, [0, 3, 5], gt_size=24)
    assert lq["img"].shape == (3, 24, 24, 3)
    assert lq["denoise_rate"].shape == (3, 24, 24, 1)
    assert gt["hq"].shape == (3, 24, 24, 3)
    assert gt["sr"].shape == (3, 48, 48, 3)
    # per-image denoise rate tiled into the plane
    np.testing.assert_allclose(np.asarray(lq["denoise_rate"])[0], 0.0,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(lq["denoise_rate"])[1], 0.3,
                               atol=1e-6)
    lq2, _ = c.sample_batch(key, [0, 3, 5], gt_size=24)
    np.testing.assert_array_equal(np.asarray(lq["img"]),
                                  np.asarray(lq2["img"]))
    lq3, _ = c.sample_batch(jax.random.PRNGKey(9), [0, 3, 5], gt_size=24)
    assert not np.array_equal(np.asarray(lq["img"]), np.asarray(lq3["img"]))


def test_teacher_corpus_sr_crop_is_synchronized(teacher_root):
    """The sr crop must be the canvas slice at exactly 2x the gt crop's
    offset (paired_image_dataset.py:1035-1054 two-scale sync)."""
    from rethink_acoustic_image_enhancement_tpu.train.device_corpus import (
        TeacherDeviceCorpus,
    )

    c = TeacherDeviceCorpus(_teacher_opt(teacher_root,
                                         geometric_augs=False))
    g = 24
    _, gt = c.sample_batch(jax.random.PRNGKey(11), [2], gt_size=g)
    hq = np.asarray(gt["hq"])[0]
    sr = np.asarray(gt["sr"])[0]
    full_gt = np.asarray(c.gt[2])
    full_sr = np.asarray(c.sr[2])
    offs = [(t, l)
            for t in range(full_gt.shape[0] - g + 1)
            for l in range(full_gt.shape[1] - g + 1)
            if np.array_equal(full_gt[t:t + g, l:l + g], hq)]
    assert offs, "hq is not a verbatim canvas crop"
    assert any(np.array_equal(full_sr[2 * t:2 * t + 2 * g,
                                      2 * l:2 * l + 2 * g], sr)
               for t, l in offs), "sr crop not at 2x the gt offset"
    # host window semantics: offset >= 1 (randint(1, h-1-gt_size))
    assert all(t >= 1 and l >= 1 for t, l in offs[:1])


def test_teacher_corpus_noise_rate_and_epsilon_guard(teacher_root):
    """~10% of samples get gaussian LQ noise; clean samples are verbatim
    canvas crops."""
    from rethink_acoustic_image_enhancement_tpu.train.device_corpus import (
        TeacherDeviceCorpus,
    )

    c = TeacherDeviceCorpus(_teacher_opt(teacher_root,
                                         geometric_augs=False))
    g = 24
    noisy = 0
    n = 60
    for s in range(n):
        lq, _ = c.sample_batch(jax.random.PRNGKey(100 + s), [s % 6],
                               gt_size=g)
        img = np.asarray(lq["img"])[0]
        full = np.asarray(c.lq[s % 6])
        clean = any(
            np.array_equal(full[t:t + g, l:l + g], img)
            for t in range(full.shape[0] - g + 1)
            for l in range(full.shape[1] - g + 1))
        noisy += not clean
    # Binomial(60, 0.1): central band
    assert 1 <= noisy <= 16, noisy


def test_teacher_corpus_aug_coverage(teacher_root):
    """With geometric_augs, flips/rotations must actually occur and stay
    synchronized between hq and sr."""
    from rethink_acoustic_image_enhancement_tpu.train.device_corpus import (
        TeacherDeviceCorpus,
    )

    c = TeacherDeviceCorpus(_teacher_opt(teacher_root))
    g = 24
    distinct = set()
    for s in range(24):
        lq, gt = c.sample_batch(jax.random.PRNGKey(s), [1], gt_size=g)
        hq = np.asarray(gt["hq"])[0]
        sr = np.asarray(gt["sr"])[0]
        full_gt = np.asarray(c.gt[1])
        # undo each of the 16 (hflip, vflip, rot) combos; find which one
        # maps hq back to a verbatim canvas crop
        for hf in (False, True):
            for vf in (False, True):
                for k in range(4):
                    cand = np.rot90(hq, k=-k)
                    cand = cand[::-1] if vf else cand
                    cand = cand[:, ::-1] if hf else cand
                    found = any(
                        np.array_equal(full_gt[t:t + g, l:l + g], cand)
                        for t in range(full_gt.shape[0] - g + 1)
                        for l in range(full_gt.shape[1] - g + 1))
                    if found:
                        distinct.add((hf, vf, k))
                        # sr must be transformed the same way
                        sr_cand = np.rot90(sr, k=-k)
                        sr_cand = sr_cand[::-1] if vf else sr_cand
                        sr_cand = sr_cand[:, ::-1] if hf else sr_cand
                        full_sr = np.asarray(c.sr[1])
                        assert any(np.array_equal(
                            full_sr[t:t + 2 * g, l:l + 2 * g], sr_cand)
                            for t in range(0, full_sr.shape[0] - 2 * g + 1)
                            for l in range(0, full_sr.shape[1] - 2 * g + 1))
    assert len(distinct) >= 4, distinct


def test_train_from_config_teacher_device_resident(teacher_root, tmp_path):
    """End-to-end: the teacher curriculum trains from a device-resident
    4-modality corpus (progressive stages sample at stage gt_size)."""
    from rethink_acoustic_image_enhancement_tpu.train.loop import (
        train_from_config,
    )

    opt = {
        "name": "smoke_devres_t", "model_type": "ImageCleanModel",
        "scale": 1, "manual_seed": 0, "is_train": True,
        "datasets": {"train": {
            **_teacher_opt(teacher_root, gt_size=16), "name": "TrainSet",
            "device_resident": True, "use_shuffle": True,
            "num_worker_per_gpu": 1, "batch_size_per_gpu": 2,
            "dataset_enlarge_ratio": 1,
            "mini_batch_sizes": [2, 1], "iters": [2, 2],
            "gt_sizes": [8, 16],
        }},
        "network_g": {"type": "KDLAE_teacher", "inp_channels": 3,
                      "out_channels": 3, "dim": 4,
                      "num_blocks": [1, 1, 1, 1], "heads": [1, 1, 1, 1],
                      "num_refinement_blocks": 1,
                      "ffn_expansion_factor": 2.66, "bias": False,
                      "LayerNorm_type": "WithBias", "static": "train",
                      "params": "cat"},
        "path": {"pretrain_network_g": None, "resume_state": None,
                 "models": str(tmp_path / "m"),
                 "training_states": str(tmp_path / "s"),
                 "log": str(tmp_path / "log")},
        "train": {"total_iter": 4, "warmup_iter": -1, "use_grad_clip": True,
                  "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                                "periods": [4], "restart_weights": [1],
                                "eta_mins": [1e-4]},
                  "optim_g": {"type": "AdamW", "lr": 1e-3,
                              "weight_decay": 0.0, "betas": [0.9, 0.999]},
                  "pixel_opt": {"type": "L1LossSr", "loss_weight": 1,
                                "reduction": "mean"}},
        "logger": {"print_freq": 1, "save_checkpoint_freq": 0},
    }
    state = train_from_config(opt)
    assert int(state.step) == 4
    flat = jax.tree.leaves(jax.device_get(state.params))
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)


def test_mesh_sharded_sampling_matches_unmeshed(corpus_root, teacher_root):
    """With a data-parallel mesh, batch generation runs SPMD (outputs
    'data'-sharded) and produces the SAME values as the meshless corpus
    for the same key."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rethink_acoustic_image_enhancement_tpu.parallel.mesh import (
        DATA_AXIS,
        make_mesh,
    )
    from rethink_acoustic_image_enhancement_tpu.train.device_corpus import (
        StudentDeviceCorpus,
        TeacherDeviceCorpus,
    )

    mesh = make_mesh(n_data=8, n_spatial=1)
    key = jax.random.PRNGKey(42)

    c0 = StudentDeviceCorpus(_opt(corpus_root))
    cm = StudentDeviceCorpus(_opt(corpus_root), mesh=mesh)
    ids = list(range(8))
    lq0, gt0 = c0.sample_batch(key, ids, gt_size=32)
    lqm, gtm = cm.sample_batch(key, ids, gt_size=32)
    np.testing.assert_array_equal(np.asarray(lq0), np.asarray(lqm))
    np.testing.assert_array_equal(np.asarray(gt0), np.asarray(gtm))
    assert lqm.sharding.is_equivalent_to(
        NamedSharding(mesh, P(DATA_AXIS)), lqm.ndim)

    # non-divisible stage batch (b3 on 8 devices) falls back to replicated
    lq3, _ = cm.sample_batch(jax.random.PRNGKey(1), [0, 1, 2], gt_size=32)
    assert lq3.sharding.is_equivalent_to(NamedSharding(mesh, P()), lq3.ndim)

    t0 = TeacherDeviceCorpus(_teacher_opt(teacher_root))
    tm = TeacherDeviceCorpus(_teacher_opt(teacher_root), mesh=mesh)
    l0, g0 = t0.sample_batch(key, [0, 1, 2, 3] * 2, gt_size=24)
    lm, gm = tm.sample_batch(key, [0, 1, 2, 3] * 2, gt_size=24)
    np.testing.assert_array_equal(np.asarray(l0["img"]),
                                  np.asarray(lm["img"]))
    np.testing.assert_array_equal(np.asarray(g0["sr"]), np.asarray(gm["sr"]))
    assert lm["img"].sharding.is_equivalent_to(
        NamedSharding(mesh, P(DATA_AXIS)), lm["img"].ndim)


# ---------------------------------------------------------------- SIQA --
@pytest.fixture(scope="module")
def siqa_root(tmp_path_factory):
    """(origin, denoised) source pairs of mixed sizes."""
    root = tmp_path_factory.mktemp("siqa_src")
    for sub in ("origin", "denoised"):
        os.makedirs(root / sub)
    for i, hw in enumerate([(40, 52), (48, 40), (56, 56)]):
        rng = np.random.default_rng(i)
        lq = (rng.uniform(0, 1, hw + (3,)) * 255).astype(np.uint8)
        dn = np.clip(lq.astype(np.int32) + 40, 0, 255).astype(np.uint8)
        imwrite(str(root / "origin" / f"{i:03d}.png"), lq)
        imwrite(str(root / "denoised" / f"{i:03d}.png"), dn)
    return root


def test_siqa_corpus_mix_semantics(siqa_root):
    """score=lambda parameterizes the candidate exactly: the candidate
    minus the origin crop equals lambda * (denoised - origin)."""
    from rethink_acoustic_image_enhancement_tpu.train.device_corpus import (
        SIQADeviceCorpus,
    )

    corpus = SIQADeviceCorpus({"dataroot_lq": str(siqa_root / "origin"),
                               "dataroot_gt": str(siqa_root / "denoised"),
                               "gt_size": 32})
    assert len(corpus) == 3
    key = jax.random.PRNGKey(0)
    lq, cand, score = corpus.sample_batch(key, [0, 1, 2, 0], gt_size=32)
    assert lq.shape == (4, 32, 32, 3) and cand.shape == (4, 32, 32, 3)
    # uint8 batches: what the disk corpus stores (PNG-quantized mixes)
    # and a quarter of the train step's argument HBM
    assert lq.dtype == jnp.uint8 and cand.dtype == jnp.uint8
    assert score.shape == (4,)
    s = np.asarray(score)
    assert np.all((s >= 0.0) & (s <= 1.0))
    # the sources differ by a constant +40 wherever unclipped; the mix
    # must reproduce score * that delta (to uint8 quantization)
    delta = (np.asarray(cand).astype(np.float32)
             - np.asarray(lq).astype(np.float32))
    for b in range(4):
        inter = delta[b][np.asarray(lq)[b] < 215]
        assert np.allclose(inter, s[b] * 40.0, atol=0.51)
    # determinism per key
    lq2, cand2, score2 = corpus.sample_batch(key, [0, 1, 2, 0], gt_size=32)
    assert np.array_equal(np.asarray(lq), np.asarray(lq2))
    assert np.array_equal(np.asarray(score), np.asarray(score2))


def test_siqa_corpus_aug_is_synchronized(siqa_root):
    """With geometric_augs, lq and candidate get the SAME flip/rot —
    the mix identity survives augmentation."""
    from rethink_acoustic_image_enhancement_tpu.train.device_corpus import (
        SIQADeviceCorpus,
    )

    corpus = SIQADeviceCorpus({"dataroot_lq": str(siqa_root / "origin"),
                               "dataroot_gt": str(siqa_root / "denoised"),
                               "gt_size": 32, "geometric_augs": True})
    lq, cand, score = corpus.sample_batch(
        jax.random.PRNGKey(3), list(range(3)) * 8, gt_size=32)
    delta = (np.asarray(cand).astype(np.float32)
             - np.asarray(lq).astype(np.float32))
    s = np.asarray(score)
    for b in range(delta.shape[0]):
        inter = delta[b][np.asarray(lq)[b] < 215]
        assert np.allclose(inter, s[b] * 40.0, atol=0.51)


def test_train_asdqe_device_resident(siqa_root, tmp_path):
    from rethink_acoustic_image_enhancement_tpu.train.asdqe_trainer import (
        train_asdqe,
    )

    result = train_asdqe(
        {"dataroot_lq": str(siqa_root / "origin"),
         "dataroot_gt": str(siqa_root / "denoised"),
         "geometric_augs": True},
        epochs=2, batch_size=2, accumulation_steps=2, gt_size=32,
        compute_dtype=None, log=lambda m: None,
        device_resident=True, steps_per_epoch=3,
        out_dir=str(tmp_path / "ckpt"))
    hist = result["history"]
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["train_mse"])
    assert np.isfinite(hist[-1]["val_mse"])
    # regression: a raw-uint8 eval path saturates the scorer to a
    # constant, freezing val_mse across epochs bit-for-bit
    assert hist[0]["val_mse"] != hist[1]["val_mse"]
    assert os.path.isdir(str(tmp_path / "ckpt"))

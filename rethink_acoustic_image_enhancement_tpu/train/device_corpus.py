"""Device-resident corpus: student batch generation entirely in HBM.

The reference's student data path decodes, crops, corrupts, and augments
every (7-frame x up-to-384px) stack on the host CPU and ships ~30 MB to
the device per iteration (Dataset_PairedMutiImage,
Train/basicsr/data/paired_image_dataset.py:109-297 + the train.py:431-448
masking). On a tunnel-attached TPU the transfer alone dwarfs the 0.29M-
param student's compute — and this host never stops paying it (the axon
client leaks every H2D buffer, see CLAUDE.md).

TPU-native redesign: upload the decoded frame corpus to HBM ONCE, then
generate each training batch on device inside one jitted program:

  gather group frames -> per-item random crop (dynamic_slice) ->
  masked-denoising corruption (64%: per-frame Bernoulli masks with the
  36% prob+0.5 boost / else simulated frame interpolation) ->
  degenerate-input noise guard -> shared 8-way flip/rot aug

Per-iteration H2D shrinks to a PRNG key + a few int32 group ids. The
corruption/aug semantics mirror the host dataset op-for-op (same
primitives: ops/mask.input_mask, frame_interpolation_corrupt); randomness
comes from the threaded key instead of the host Generators, so streams
differ but distributions match (tested in tests/test_device_corpus.py).

Enable with ``datasets.train.device_resident: true``. Supported for the
student (Dataset_PairedMutiImage -> :class:`StudentDeviceCorpus`), the
teacher 3/4-modality datasets (Dataset_SuperRestoration[_param] ->
:class:`TeacherDeviceCorpus`), and the ASDQE scorer corpus
(Dataset_S_IQA -> :class:`SIQADeviceCorpus`, ``train_asdqe(...,
device_resident=True)``). Single-process only — multi-host runs feed
from the host pipeline.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.mask import frame_interpolation_corrupt, input_mask


def _mesh_place(corpus, mesh, names) -> None:
    """Replicate the HBM corpus arrays over a device mesh so batch
    sampling can run SPMD (each device generates the rows of its own
    batch shard — no post-sample reshard into the train step)."""
    if mesh is None:
        return
    from ..parallel.mesh import replicated

    for n in names:
        setattr(corpus, n, jax.device_put(getattr(corpus, n),
                                          replicated(mesh)))


def _batch_out_shardings(mesh, batch: int, tree_example):
    """'data'-sharded output specs for a sampled batch (replicated when
    the stage batch does not divide the data axis, e.g. b1 stages)."""
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    n = mesh.shape[DATA_AXIS]
    def spec(x):
        if batch % n == 0:
            return NamedSharding(mesh, P(DATA_AXIS))
        return NamedSharding(mesh, P())
    return jax.tree.map(spec, tree_example)


def _augment8(img: jnp.ndarray, mode: jnp.ndarray) -> jnp.ndarray:
    """The host pipeline's 8 flip/rot90 modes (data/transforms.py:67-87)
    on a (..., H, W) tensor with square H=W, traced mode scalar."""
    rot = lambda k: lambda x: jnp.rot90(x, k=k, axes=(-2, -1))
    flip = lambda x: jnp.flip(x, axis=-2)  # np.flipud on (H, W)
    branches = [
        lambda x: x,
        flip,
        rot(1),
        lambda x: flip(rot(1)(x)),
        rot(2),
        lambda x: flip(rot(2)(x)),
        rot(3),
        lambda x: flip(rot(3)(x)),
    ]
    return jax.lax.switch(mode, branches, img)


class StudentDeviceCorpus:
    """Holds the full lq/gt frame corpus in HBM and samples training
    batches on device. Frames are padded host-side (reflect, bottom/right
    — pad_to_min_size semantics) to one common (H, W) at build time."""

    def __init__(self, opt: dict, min_size: int | None = None,
                 mesh=None):
        from ..data.datasets import PairedMultiImageDataset

        self.mesh = mesh
        self.opt = dict(opt)
        self.num_pairs = opt.get("num_pairs", 7)
        self.base_prob = float(opt.get("prob", 0.0))
        self.geometric_augs = bool(opt.get("geometric_augs", False))
        self.gt_size = int(opt["gt_size"])
        # reuse the host dataset for pairing/IO/grouping — one source of
        # truth for which files train together
        self._ds = PairedMultiImageDataset(dict(opt))

        # decode every unique frame once
        from ..utils.image_io import imread_gray

        # index EVERY paired frame (numeric-prefix order, like the
        # grouping) — epoch rerolls may reference frames no epoch-0 group
        # touched, so the index can't be built from groups alone
        import os.path as osp

        from ..data.pairing import _numeric_prefix_key, scan_files

        lq_files = sorted(scan_files(opt["dataroot_lq"]),
                          key=_numeric_prefix_key)
        gt_files = sorted(scan_files(opt["dataroot_gt"]),
                          key=_numeric_prefix_key)
        paths = [(osp.join(opt["dataroot_lq"], a),
                  osp.join(opt["dataroot_gt"], b))
                 for a, b in zip(lq_files, gt_files)]
        if not paths or not self._ds.paths:
            raise ValueError(
                "empty corpus: no frame groups fit num_pairs="
                f"{self.num_pairs} with stride_range="
                f"{opt.get('stride_range')} over the given folders")
        self._frame_index = {key: i for i, key in enumerate(paths)}
        lq_frames = [self._ds._read(p_lq, imread_gray, "lq")
                     for p_lq, _ in paths]
        gt_frames = [self._ds._read(p_gt, imread_gray, "gt")
                     for _, p_gt in paths]
        target = max(min_size or 0, self.gt_size,
                     max(f.shape[0] for f in gt_frames),
                     max(f.shape[1] for f in gt_frames))
        th = max(target, max(f.shape[0] for f in gt_frames))
        tw = max(target, max(f.shape[1] for f in gt_frames))

        def pad(img):
            hp, wp = th - img.shape[0], tw - img.shape[1]
            return np.pad(img, ((0, hp), (0, wp)), mode="reflect") \
                if (hp or wp) else img

        self.frame_hw = (th, tw)
        self.lq = jnp.asarray(np.stack([pad(f) for f in lq_frames]))
        self.gt = jnp.asarray(np.stack([pad(f) for f in gt_frames]))
        _mesh_place(self, mesh, ("lq", "gt"))
        self._set_groups()
        self._sample_cache: dict[tuple, callable] = {}

    # ----------------------------------------------------------- groups --
    def _set_groups(self) -> None:
        table = np.asarray(
            [[self._frame_index[(g["lq_path"], g["gt_path"])] for g in group]
             for group in self._ds.paths], np.int32)
        self.groups = jnp.asarray(table)  # (G, F)

    def set_epoch(self, epoch: int) -> None:
        """Per-epoch stride reroll, mirroring the host dataset."""
        self._ds.set_epoch(epoch)
        self._set_groups()

    def __len__(self) -> int:
        return int(self.groups.shape[0])

    # ----------------------------------------------------------- sample --
    def _sample_one(self, key: jax.Array, group: jnp.ndarray,
                    gt_size: int, prob: jnp.ndarray):
        """One (F, gt_size, gt_size) lq/gt pair from a group of frame ids."""
        k_top, k_left, k_mode, k_boost, k_mask, k_noise, k_aug = \
            jax.random.split(key, 7)
        lq = self.lq[group]  # (F, H, W)
        gt = self.gt[group]

        h, w = self.frame_hw
        top = jax.random.randint(k_top, (), 0, h - gt_size + 1)
        left = jax.random.randint(k_left, (), 0, w - gt_size + 1)
        crop = lambda x: jax.lax.dynamic_slice(
            x, (0, top, left), (x.shape[0], gt_size, gt_size))
        lq, gt = crop(lq), crop(gt)

        f = lq.shape[0]
        # 64%: per-frame Bernoulli masks, 36% of frames boosted +0.5
        # (paired_image_dataset.py:219-230)
        boost = jax.random.uniform(k_boost, (f,)) > 0.64
        probs = jnp.where(boost, prob + 0.5, prob)
        masked = jax.vmap(input_mask)(
            lq, jax.random.split(k_mask, f), probs)
        # else: simulated frame interpolation (:231-241)
        interp = frame_interpolation_corrupt(lq, k_mask, prob)
        use_mask_mode = jax.random.uniform(k_mode) < 0.64
        lq = jnp.where(use_mask_mode, masked, interp)

        # degenerate-input rescue noise at 64% zero/one ratio (:243-246)
        zero_ratio = jnp.maximum(jnp.mean(lq == 0), jnp.mean(lq == 1))
        noise = jnp.clip(
            lq + 0.3 + 0.7 * jax.random.normal(k_noise, lq.shape), 0.0, 1.0)
        lq = jnp.where(zero_ratio > 0.64, noise, lq)

        if self.geometric_augs:
            mode = jax.random.randint(k_aug, (), 0, 8)
            lq = _augment8(lq, mode)
            gt = _augment8(gt, mode)
        return lq, gt

    def _build_sampler(self, batch: int, gt_size: int):
        def sample(key, group_ids, groups, prob):
            keys = jax.random.split(key, batch)
            return jax.vmap(
                lambda k, gid: self._sample_one(k, groups[gid], gt_size,
                                                prob))(keys, group_ids)

        out = _batch_out_shardings(self.mesh, batch, (0, 0))
        return jax.jit(sample, out_shardings=out)

    def sample_batch(self, key: jax.Array, group_ids: Sequence[int],
                     gt_size: int | None = None,
                     prob: float | None = None):
        """(lq, gt) device batches of shape (B, F, g, g). One compiled
        program per (batch, gt_size) bucket; ``prob`` is traced."""
        gt_size = int(gt_size or self.gt_size)
        group_ids = jnp.asarray(np.asarray(group_ids, np.int32))
        batch = int(group_ids.shape[0])
        cache_key = (batch, gt_size)
        if cache_key not in self._sample_cache:
            self._sample_cache[cache_key] = self._build_sampler(batch, gt_size)
        p = jnp.asarray(self.base_prob if prob is None else prob, jnp.float32)
        return self._sample_cache[cache_key](key, group_ids, self.groups, p)


class TeacherDeviceCorpus:
    """Device-resident teacher corpus: the 4-modality
    Dataset_SuperRestoration_param pipeline (paired_image_dataset.py:
    857-1105) generated on device.

    The host path decodes lq/gt/param + a 2x SR target per item and ships
    up to ~3 MB/iter of float32 crops over the tunnel — and the teacher's
    progressive stages (up to 384px here) make that the dominant cost on
    a tunnel-attached chip, on top of the axon client's per-transfer host
    leak (CLAUDE.md). Here the decoded corpus is uploaded ONCE (lq/gt at
    native size, sr at exactly 2x, per-image denoise rates as a vector)
    and each batch is generated in one jitted program:

      gather image -> synchronized random crop (lq/gt at gt_size, sr via
      dynamic_slice at doubled coordinates) -> 10% gaussian noise on lq
      (sigma ~ U(1, 30)/255, :933-935/1087-1092) -> synchronized
      hflip/vflip/rot90 aug (:1056-1082) -> zero-input epsilon guard
      (:941-944) -> denoise-rate plane tile.

    Crop offsets mirror the host window exactly: each image is reflect101
    bottom/right padded (to the common HBM canvas), but offsets are drawn
    from [1, h_eff - 1 - gt_size] with h_eff the image's OWN padded size,
    so small images never crop into another image's canvas slack.
    Randomness comes from the threaded step key (streams differ from the
    host Generators; distributions match — tests/test_device_corpus.py).
    """

    def __init__(self, opt: dict, min_size: int | None = None,
                 mesh=None):
        from ..data.datasets import (SuperRestorationDataset,
                                     SuperRestorationParamDataset,
                                     _reflect101_pad_to)

        self.mesh = mesh
        self.opt = dict(opt)
        dstype = opt.get("type", "Dataset_SuperRestoration_param")
        cls = (SuperRestorationParamDataset
               if dstype == "Dataset_SuperRestoration_param"
               else SuperRestorationDataset)
        # reuse the host dataset for pairing/IO/JSON — one source of truth
        ds = self._ds = cls(dict(opt))
        self.gt_size = int(ds.gt_size)
        self.sr_scale = int(ds.SR_SCALE)
        self.geometric_augs = bool(ds.geometric_augs)
        if not ds.paths:
            raise ValueError("empty teacher corpus: no paired modalities "
                             f"under {opt.get('dataroot_gt')}")

        import json as _json

        lq_imgs, gt_imgs, sr_imgs, rates = [], [], [], []
        for p in ds.paths:
            img_gt = ds._read_img(p["gt_path"], "gt")
            img_sr = ds._read_img(p["sr_path"], "sr")
            h, w = img_gt.shape[:2]
            if img_sr.shape[:2] != (h * self.sr_scale, w * self.sr_scale):
                raise ValueError(
                    f"SR size mismatch: GT={h}x{w} "
                    f"SR={img_sr.shape[0]}x{img_sr.shape[1]} ({p['gt_path']})")
            gt_imgs.append(img_gt)
            lq_imgs.append(ds._read_img(p["lq_path"], "lq"))
            sr_imgs.append(img_sr)
            rate = 1.0
            if ds.use_denoise_rate:
                with open(p["param_path"]) as f:
                    dr = _json.load(f).get("denoise_rate")
                rate = 1.0 if dr is None else float(dr)
            rates.append(rate)

        # the host pads every image to gt_size + 2 so the reference's
        # randint(1, h-1-gt_size) window exists; the HBM canvas is the max
        # of that over the corpus (one common static shape)
        min_hw = max(min_size or 0, self.gt_size + 2)
        eff_h = [max(g.shape[0], min_hw) for g in gt_imgs]
        eff_w = [max(g.shape[1], min_hw) for g in gt_imgs]
        th, tw = max(eff_h), max(eff_w)
        self.frame_hw = (th, tw)
        s = self.sr_scale

        def to_canvas(img, t_h, t_w):
            img = _reflect101_pad_to(img, max(t_h, t_w))
            hp, wp = t_h - img.shape[0], t_w - img.shape[1]
            if hp or wp:
                img = np.pad(img, ((0, max(hp, 0)), (0, max(wp, 0)), (0, 0)),
                             mode="reflect")
            return img[:t_h, :t_w]

        to_rgb = lambda x: np.ascontiguousarray(
            x[..., ::-1].astype(np.float32))
        self.lq = jnp.asarray(np.stack(
            [to_canvas(to_rgb(i), th, tw) for i in lq_imgs]))
        self.gt = jnp.asarray(np.stack(
            [to_canvas(to_rgb(i), th, tw) for i in gt_imgs]))
        self.sr = jnp.asarray(np.stack(
            [to_canvas(to_rgb(i), th * s, tw * s) for i in sr_imgs]))
        self.rates = jnp.asarray(np.asarray(rates, np.float32))
        self.eff_h = jnp.asarray(np.asarray(eff_h, np.int32))
        self.eff_w = jnp.asarray(np.asarray(eff_w, np.int32))
        _mesh_place(self, mesh,
                    ("lq", "gt", "sr", "rates", "eff_h", "eff_w"))
        self._sample_cache: dict[tuple, callable] = {}

    def describe(self) -> str:
        return (f"{int(self.lq.shape[0])} images at {self.frame_hw} "
                f"(+{self.sr_scale}x sr) in HBM")

    def set_epoch(self, epoch: int) -> None:  # interface parity
        del epoch

    def __len__(self) -> int:
        return int(self.lq.shape[0])

    # ----------------------------------------------------------- sample --
    def _sample_one(self, key: jax.Array, idx: jnp.ndarray, gt_size: int):
        k_top, k_left, k_gate, k_sigma, k_noise, k_hf, k_vf, k_rot = \
            jax.random.split(key, 8)
        lq, gt, sr = self.lq[idx], self.gt[idx], self.sr[idx]
        s = self.sr_scale
        sr_size = gt_size * s

        # reference crop window: randint(1, h - 1 - gt_size) inclusive,
        # over the image's own padded extent (paired_image_dataset.py:
        # 1035-1054)
        hi_t = jnp.maximum(self.eff_h[idx] - 1 - gt_size, 1)
        hi_l = jnp.maximum(self.eff_w[idx] - 1 - gt_size, 1)
        top = jax.random.randint(k_top, (), 1, hi_t + 1)
        left = jax.random.randint(k_left, (), 1, hi_l + 1)
        lq = jax.lax.dynamic_slice(lq, (top, left, 0),
                                   (gt_size, gt_size, lq.shape[-1]))
        gt = jax.lax.dynamic_slice(gt, (top, left, 0),
                                   (gt_size, gt_size, gt.shape[-1]))
        sr = jax.lax.dynamic_slice(sr, (top * s, left * s, 0),
                                   (sr_size, sr_size, sr.shape[-1]))

        # 10% gaussian noise on LQ, sigma ~ U(1, 30)/255 (:933-935)
        sigma = jax.random.uniform(k_sigma, (), minval=1.0, maxval=30.0)
        noisy = jnp.clip(
            lq + jax.random.normal(k_noise, lq.shape) * (sigma / 255.0),
            0.0, 1.0)
        lq = jnp.where(jax.random.uniform(k_gate) < 0.1, noisy, lq)

        if self.geometric_augs:
            # synchronized multi-scale aug (:1056-1082): 50% hflip, 50%
            # vflip, then one of {0, 90, 180, 270}; rot90 is safe on the
            # square crops at both scales
            hf = jax.random.uniform(k_hf) < 0.5
            vf = jax.random.uniform(k_vf) < 0.5
            k = jax.random.randint(k_rot, (), 0, 4)

            def aug(x):
                x = jnp.where(hf, jnp.flip(x, axis=1), x)
                x = jnp.where(vf, jnp.flip(x, axis=0), x)
                return jax.lax.switch(
                    k, [lambda a: a] + [
                        (lambda kk: lambda a: jnp.rot90(a, k=kk,
                                                        axes=(0, 1)))(kk)
                        for kk in (1, 2, 3)], x)

            lq, gt, sr = aug(lq), aug(gt), aug(sr)

        # zero-input epsilon guard (:941-944)
        zero_ratio = jnp.maximum(jnp.mean(lq == 0), jnp.mean(lq == 1))
        lq = jnp.where(zero_ratio > 0.10, lq + 1e-14, lq)

        plane = jnp.full((gt_size, gt_size, 1), self.rates[idx], jnp.float32)
        return ({"img": lq, "denoise_rate": plane}, {"hq": gt, "sr": sr})

    def _build_sampler(self, batch: int, gt_size: int):
        def sample(key, ids):
            keys = jax.random.split(key, batch)
            return jax.vmap(
                lambda k, i: self._sample_one(k, i, gt_size))(keys, ids)

        out = _batch_out_shardings(
            self.mesh, batch,
            ({"img": 0, "denoise_rate": 0}, {"hq": 0, "sr": 0}))
        return jax.jit(sample, out_shardings=out)

    def sample_batch(self, key: jax.Array, ids: Sequence[int],
                     gt_size: int | None = None, prob=None):
        """(lq, gt) dict batches matching the host feed format. One
        compiled program per (batch, gt_size) bucket."""
        del prob  # teacher curriculum carries no masking prob
        gt_size = int(gt_size or self.gt_size)
        ids = jnp.asarray(np.asarray(ids, np.int32))
        batch = int(ids.shape[0])
        cache_key = (batch, gt_size)
        if cache_key not in self._sample_cache:
            self._sample_cache[cache_key] = self._build_sampler(batch, gt_size)
        return self._sample_cache[cache_key](key, ids)


class SIQADeviceCorpus:
    """Device-resident ASDQE scorer corpus: graded denoise candidates
    generated in HBM.

    The reference trains ASDQE on (noiseSonar, clearSonar, score)
    triplets (Train/ASDQE.py:32-44 + Dataset_S_IQA,
    paired_image_dataset.py:643-855) — for each noisy sonar image, a
    family of denoise candidates at graded quality with a scalar score.
    Its SonarIQA corpus is unpublished; the structure is reproducible
    from any (origin, reference-denoise) pair set by mixing at a rate
    lambda (candidate = lambda*denoised + (1-lambda)*origin, score =
    lambda — what scripts/make_siqa_corpus.py materializes on disk).

    At gt_size 512 / batch 32 the host path ships ~50 MB/iter even at
    the uint8 boundary (~1.3 s through the 38 MB/s tunnel, plus the axon
    client's per-H2D host leak — CLAUDE.md). Here the origin + denoised
    sources upload ONCE and each batch is one jitted program:

      gather source pair -> synchronized random crop (the host's
      reflect101 pad + offsets in [1, h-1-gt_size], per-image effective
      extents) -> lambda ~ U[0,1] mix -> synchronized hflip/vflip/rot90
      aug -> (lq, candidate, score=lambda) batch.

    The continuous lambda stream strictly generalizes the disk corpus's
    fixed grid; per-iteration H2D is a PRNG key + int32 source ids.
    """

    def __init__(self, opt: dict, mesh=None):
        from ..data.datasets import _reflect101_pad_to
        from ..data.pairing import paired_paths_from_folder
        from ..utils.image_io import imread_bgr

        self.mesh = mesh
        self.opt = dict(opt)
        self.gt_size = int(opt.get("gt_size") or 512)
        self.geometric_augs = bool(opt.get("geometric_augs", False))
        paths = paired_paths_from_folder(
            [opt["dataroot_lq"], opt["dataroot_gt"]], ["lq", "gt"],
            opt.get("filename_tmpl", "{}"))
        if not paths:
            raise ValueError("empty SIQA corpus: no (origin, denoised) "
                             f"pairs under {opt.get('dataroot_lq')}")

        lq_imgs, dn_imgs = [], []
        for p in paths:
            lq = imread_bgr(p["lq_path"])
            dn = imread_bgr(p["gt_path"])
            if dn.shape != lq.shape:
                raise ValueError(
                    f"size mismatch: {p['lq_path']} {lq.shape} vs "
                    f"{p['gt_path']} {dn.shape}")
            lq_imgs.append(lq)
            dn_imgs.append(dn)

        min_hw = self.gt_size + 2
        eff_h = [max(i.shape[0], min_hw) for i in lq_imgs]
        eff_w = [max(i.shape[1], min_hw) for i in lq_imgs]
        th, tw = max(eff_h), max(eff_w)
        self.frame_hw = (th, tw)

        def to_canvas(img):
            img = _reflect101_pad_to(img, max(th, tw))
            hp, wp = th - img.shape[0], tw - img.shape[1]
            if hp or wp:
                img = np.pad(img, ((0, max(hp, 0)), (0, max(wp, 0)), (0, 0)),
                             mode="reflect")
            return img[:th, :tw]

        # uint8 HBM residency (lossless: the sources are uint8 decodes) —
        # 4x less persistent HBM next to the b32@512 train step, which
        # fits with only ~100 MB to spare (the OOM ledger in the class
        # docstring). Crops convert to f32/255 in-jit.
        to_rgb_u8 = lambda x: np.ascontiguousarray(
            np.rint(x[..., ::-1].astype(np.float32) * 255.0)).astype(np.uint8)
        self.lq = jnp.asarray(np.stack([to_canvas(to_rgb_u8(i))
                                        for i in lq_imgs]))
        self.dn = jnp.asarray(np.stack([to_canvas(to_rgb_u8(i))
                                        for i in dn_imgs]))
        self.eff_h = jnp.asarray(np.asarray(eff_h, np.int32))
        self.eff_w = jnp.asarray(np.asarray(eff_w, np.int32))
        _mesh_place(self, mesh, ("lq", "dn", "eff_h", "eff_w"))
        self._sample_cache: dict[tuple, callable] = {}

    def describe(self) -> str:
        return (f"{int(self.lq.shape[0])} source pairs at "
                f"{self.frame_hw} in HBM")

    def __len__(self) -> int:
        return int(self.lq.shape[0])

    # ----------------------------------------------------------- sample --
    # NOTE: the corpus arrays are jit ARGUMENTS, not closure captures — a
    # closed-over HBM corpus is embedded into the lowered HLO as literal
    # constants, and on the tunnel-attached platform the remote-compile
    # request then exceeds the server's body limit (measured: HTTP 413 at
    # a 287 MB f32 corpus). Passing committed device arrays as args costs
    # nothing per call and keeps the program payload shape-only.
    @staticmethod
    def _sample_one(key: jax.Array, idx: jnp.ndarray, gt_size: int,
                    lq_c, dn_c, eff_h, eff_w, geometric_augs: bool):
        k_top, k_left, k_lam, k_hf, k_vf, k_rot = jax.random.split(key, 6)
        lq, dn = lq_c[idx], dn_c[idx]

        # host crop window: randint(1, h - 1 - gt_size) inclusive over the
        # image's own reflect101-padded extent (datasets.py SIQADataset /
        # paired_image_dataset.py:770-803)
        hi_t = jnp.maximum(eff_h[idx] - 1 - gt_size, 1)
        hi_l = jnp.maximum(eff_w[idx] - 1 - gt_size, 1)
        top = jax.random.randint(k_top, (), 1, hi_t + 1)
        left = jax.random.randint(k_left, (), 1, hi_l + 1)
        crop = lambda x: jax.lax.dynamic_slice(
            x, (top, left, 0), (gt_size, gt_size, x.shape[-1]))
        lq, dn = crop(lq), crop(dn)

        # mix in f32, emit uint8 — EXACTLY what the disk corpus stores
        # (make_siqa_corpus.py writes rint(mix) PNGs); u8 batches also
        # quarter the train step's argument footprint, part of fitting
        # b32@512 in HBM
        lam = jax.random.uniform(k_lam, ())
        lq_f = lq.astype(jnp.float32) / 255.0
        dn_f = dn.astype(jnp.float32) / 255.0
        cand = jnp.rint((lam * dn_f + (1.0 - lam) * lq_f) * 255.0
                        ).astype(jnp.uint8)

        if geometric_augs:
            # synchronized hflip/vflip/rot90 (sync_augment_multi_scale,
            # data/transforms.py:96-111)
            hf = jax.random.uniform(k_hf) < 0.5
            vf = jax.random.uniform(k_vf) < 0.5
            k = jax.random.randint(k_rot, (), 0, 4)

            def aug(x):
                x = jnp.where(hf, jnp.flip(x, axis=1), x)
                x = jnp.where(vf, jnp.flip(x, axis=0), x)
                return jax.lax.switch(
                    k, [lambda a: a] + [
                        (lambda kk: lambda a: jnp.rot90(a, k=kk,
                                                        axes=(0, 1)))(kk)
                        for kk in (1, 2, 3)], x)

            lq, cand = aug(lq), aug(cand)
        return lq, cand, lam

    def _build_sampler(self, batch: int, gt_size: int):
        augs = self.geometric_augs

        def sample(key, ids, lq_c, dn_c, eff_h, eff_w):
            keys = jax.random.split(key, batch)
            return jax.vmap(
                lambda k, i: self._sample_one(
                    k, i, gt_size, lq_c, dn_c, eff_h, eff_w, augs)
            )(keys, ids)

        out = _batch_out_shardings(self.mesh, batch, (0, 0, 0))
        return jax.jit(sample, out_shardings=out)

    def sample_batch(self, key: jax.Array, ids: Sequence[int],
                     gt_size: int | None = None):
        """(lq, candidate, score) device batch — (B, g, g, 3) x2 + (B,).
        One compiled program per (batch, gt_size) bucket."""
        gt_size = int(gt_size or self.gt_size)
        ids = jnp.asarray(np.asarray(ids, np.int32))
        batch = int(ids.shape[0])
        cache_key = (batch, gt_size)
        if cache_key not in self._sample_cache:
            self._sample_cache[cache_key] = self._build_sampler(batch, gt_size)
        return self._sample_cache[cache_key](key, ids, self.lq, self.dn,
                                             self.eff_h, self.eff_w)

"""Datasets — map-style host pipelines returning NHWC numpy batches.

Ports of the acoustic-path datasets in
Train/basicsr/data/paired_image_dataset.py, with two systematic changes:

  * NHWC float32 numpy out (no torch tensors); the teacher returns
    ``{'lq': {'img', 'denoise_rate'}, 'gt': {'hq', 'sr'}}`` exactly like
    the reference but channels-last.
  * all randomness flows from an explicit per-(epoch, index) PRNG —
    deterministic, worker-safe, re-rollable per epoch (``set_epoch``).

The heavy per-pixel corruption (input_mask) stays here only for the
dataset-level base prob; the progressive extra masking runs on-device in
the train step (train/progressive.py).
"""

from __future__ import annotations

import json
import os.path as osp
from typing import Any, Sequence

import numpy as np

from ..ops.mask import input_mask_np
from ..utils.image_io import imread_bgr, imread_gray
from .pairing import (
    paired_multipaths_from_folder,
    paired_paths_from_folder,
    paired_paths_from_folder_param,
    paired_paths_from_lmdb,
    paired_paths_from_meta_info_file,
)
from .transforms import (
    add_gaussian_noise,
    add_random_noise,
    pad_image_center,
    pad_to_min_size,
    paired_random_crop,
    random_augmentation,
    sync_augment_multi_scale,
)


def _imread_16bit(path: str) -> np.ndarray:
    """16-bit-aware read -> float32 [0,1] BGR HWC (img_util.imfrombytesDP:
    cv2.IMREAD_UNCHANGED then /65535)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise IOError(f"failed to read image: {path}")
    if img.dtype == np.uint16:
        return img.astype(np.float32) / 65535.0
    return img.astype(np.float32) / 255.0


def _imfrombytes_16bit(buf: bytes) -> np.ndarray:
    """Bytes variant of ``_imread_16bit`` (img_util.imfrombytesDP)."""
    import cv2

    img = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise IOError("failed to decode image bytes")
    if img.dtype == np.uint16:
        return img.astype(np.float32) / 65535.0
    return img.astype(np.float32) / 255.0


def _reflect101_pad_to(img: np.ndarray, target: int) -> np.ndarray:
    """cv2.BORDER_REFLECT_101 bottom/right pad to a minimum size
    (paired_image_dataset.py:1019-1029)."""
    h, w = img.shape[:2]
    hp, wp = max(0, target - h), max(0, target - w)
    if hp == 0 and wp == 0:
        return img
    spec = [(0, hp), (0, wp)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, spec, mode="reflect")


class _SeededDataset:
    """Deterministic per-(epoch, index) RNG + optional decode cache.

    ``cache_decoded: true`` in the dataset opt keeps decoded images in
    RAM keyed by path. The reference re-decodes the full source image for
    every crop (paired_image_dataset.py reads per __getitem__; its answer
    to decode cost is LMDB); on the TPU host the on-chip step is often
    faster than a full-size JPEG decode, so small-corpus training becomes
    decode-bound — the e2e KDLAET proof measured data_time 3-4 s/iter vs
    0.28 s compute at stage 3. Opt-in because it holds the whole decoded
    corpus in host memory."""

    def __init__(self, seed: int = 0, cache_decoded: bool = False,
                 io_opt: dict | None = None):
        self._seed = seed
        self._epoch = 0
        self._decode_cache: dict[tuple, np.ndarray] | None = (
            {} if cache_decoded else None)
        # every read flows through a FileClient (the reference reads all
        # image bytes through one, paired_image_dataset.py:161-186), so
        # io_backend: {type: lmdb, ...} is honored end-to-end
        self._io_opt = dict(io_opt or {"type": "disk"})
        self._io_type = self._io_opt.get("type", "disk")
        self._file_client = None  # built lazily (worker-safe, like the ref)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _client(self):
        if self._file_client is None:
            from .file_client import FileClient

            kwargs = {k: v for k, v in self._io_opt.items() if k != "type"}
            self._file_client = FileClient(self._io_type, **kwargs)
        return self._file_client

    def _read(self, path: str, reader, key: str = "default") -> np.ndarray:
        """Read+decode an image with the optional cache; returns a private
        copy (downstream corruption/aug must not alias cached memory).
        ``path`` is a filesystem path for the disk backend and the record
        key for lmdb/memcached; ``key`` selects the modality's client."""
        if self._decode_cache is None:
            return self._decode(path, reader, key)
        cache_key = (key, path)
        img = self._decode_cache.get(cache_key)
        if img is None:
            img = self._decode(path, reader, key)
            self._decode_cache[cache_key] = img
        return img.copy()

    def _decode(self, path: str, reader, key: str) -> np.ndarray:
        from ..utils.image_io import (
            _HAS_CV2,
            imfrombytes_bgr,
            imfrombytes_gray,
        )

        decoders = {imread_bgr: imfrombytes_bgr,
                    imread_gray: imfrombytes_gray,
                    _imread_16bit: _imfrombytes_16bit}
        decode = decoders.get(reader)
        if (self._io_type == "disk" and not _HAS_CV2) or decode is None:
            if self._io_type != "disk":  # pragma: no cover
                raise TypeError(f"no bytes decoder for reader {reader}")
            return reader(path)  # PIL fallback needs a real path
        buf = self._client().get(path, key)
        if buf is None:
            raise IOError(f"{self._io_type} backend has no entry for "
                          f"{path!r} (client {key!r})")
        return decode(buf)

    def _rng(self, index: int) -> np.random.Generator:
        return np.random.default_rng(
            np.random.SeedSequence([self._seed, self._epoch, index]))


def _io_opt_no_lmdb(opt: dict, name: str) -> dict:
    """io_backend for datasets without an lmdb layout (the reference's
    specialized datasets raise for lmdb too, e.g.
    paired_image_dataset.py:451-453)."""
    io_opt = dict(opt.get("io_backend") or {"type": "disk"})
    if io_opt.get("type") == "lmdb":
        raise NotImplementedError(
            f"{name} does not support the lmdb backend (multi-modality "
            "folder pairing; matches the reference behavior) — use "
            "Dataset_PairedImage for lmdb corpora")
    return io_opt


class PairedImageDataset(_SeededDataset):
    """Generic LQ/GT paired dataset (Dataset_PairedImage,
    paired_image_dataset.py:299-421): pad -> random crop -> degenerate-input
    noise -> 8-way geometric aug. BGR files read then flipped to RGB, like
    img2tensor(bgr2rgb=True)."""

    def __init__(self, opt: dict):
        io_opt = dict(opt.get("io_backend") or {"type": "disk"})
        folders = [opt["dataroot_lq"], opt["dataroot_gt"]]
        if io_opt.get("type") == "lmdb":
            # paths are shared lmdb keys; one client per modality
            # (paired_image_dataset.py:343-346)
            io_opt.setdefault("db_paths", folders)
            io_opt.setdefault("client_keys", ["lq", "gt"])
        super().__init__(opt.get("seed", 0),
                         opt.get("cache_decoded", False), io_opt)
        self.opt = opt
        self.phase = opt.get("phase", "train")
        self.scale = opt.get("scale", 1)
        tmpl = opt.get("filename_tmpl", "{}")
        if io_opt.get("type") == "lmdb":
            self.paths = paired_paths_from_lmdb(folders, ["lq", "gt"])
        elif opt.get("meta_info_file"):
            self.paths = paired_paths_from_meta_info_file(
                folders, ["lq", "gt"], opt["meta_info_file"], tmpl)
        else:
            self.paths = paired_paths_from_folder(folders, ["lq", "gt"], tmpl)
        self.geometric_augs = opt.get("geometric_augs", False)

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, index: int) -> dict[str, Any]:
        rng = self._rng(index)
        p = self.paths[index % len(self.paths)]
        img_gt = self._read(p["gt_path"], imread_bgr, "gt")
        img_lq = self._read(p["lq_path"], imread_bgr, "lq")

        if self.phase == "train":
            gt_size = self.opt["gt_size"]
            img_lq, img_gt = pad_to_min_size(img_lq, img_gt, gt_size)
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, gt_size,
                                                self.scale, rng)
            # anti-degenerate noise (paired_image_dataset.py:394-398)
            zero_ratio = max(np.mean(img_lq == 0), np.mean(img_lq == 1))
            if zero_ratio > 0.20:
                img_lq = add_random_noise(img_lq, rng)
            if self.geometric_augs:
                img_gt, img_lq = random_augmentation(img_gt, img_lq, rng=rng)

        # BGR -> RGB at tensor time, channels-last stays
        return {"lq": np.ascontiguousarray(img_lq[..., ::-1]),
                "gt": np.ascontiguousarray(img_gt[..., ::-1]),
                "lq_path": p["lq_path"], "gt_path": p["gt_path"]}


class SuperRestorationParamDataset(_SeededDataset):
    """The teacher dataset (Dataset_SuperRestoration_param,
    paired_image_dataset.py:857-1105): four modalities paired by basename
    (lq/gt/sr/param), per-image JSON with 'denoise_rate', synchronized
    pad/crop with SR at 2x coordinates, 10% gaussian noise on LQ,
    sync flip/rot aug, zero-input epsilon guard, denoise_rate tiled to an
    (H, W, 1) plane."""

    SR_SCALE = 2

    def __init__(self, opt: dict):
        super().__init__(opt.get("seed", 0),
                         opt.get("cache_decoded", False),
                         _io_opt_no_lmdb(opt, type(self).__name__))
        self.opt = opt
        self.phase = opt.get("phase", "train")
        self.scale = opt.get("scale", 1)
        self.gt_size = opt.get("gt_size", 256)
        self.sr_size = self.gt_size * self.SR_SCALE
        self.geometric_augs = opt.get("geometric_augs", False)
        self.use_denoise_rate = opt.get("denoise_rate", True)
        self.paths = paired_paths_from_folder_param(
            [opt["dataroot_lq"], opt["dataroot_gt"], opt["dataroot_sr"],
             opt["dataroot_param"]],
            ["lq", "gt", "sr", "param"])

    def __len__(self) -> int:
        return len(self.paths)

    def _read_img(self, path: str, key: str = "default") -> np.ndarray:
        return self._read(path, imread_bgr, key)

    def __getitem__(self, index: int) -> dict[str, Any]:
        rng = self._rng(index)
        p = self.paths[index % len(self.paths)]
        img_gt = self._read_img(p["gt_path"], "gt")
        img_lq = self._read_img(p["lq_path"], "lq")
        img_sr = self._read_img(p["sr_path"], "sr")
        with open(p["param_path"]) as f:
            param = json.load(f)
        if self.use_denoise_rate:
            dr = param.get("denoise_rate")
            denoise_rate = 1.0 if dr is None else float(dr)
        else:
            denoise_rate = 1.0

        if self.phase == "train":
            h_gt, w_gt = img_gt.shape[:2]
            h_sr, w_sr = img_sr.shape[:2]
            if h_sr != h_gt * self.SR_SCALE or w_sr != w_gt * self.SR_SCALE:
                raise ValueError(
                    f"SR size mismatch: GT={h_gt}x{w_gt} SR={h_sr}x{w_sr} "
                    f"({p['gt_path']})")
            # multi-scale padding (reflect101, :1019-1029); pad to size+2 so
            # the reference's randint(1, h-1-gt_size) crop window exists
            img_gt = _reflect101_pad_to(img_gt, self.gt_size + 2)
            img_lq = _reflect101_pad_to(img_lq, self.gt_size + 2)
            img_sr = _reflect101_pad_to(img_sr, self.sr_size + 4)
            # multi-scale joint crop (:1035-1054): offsets in [1, h-1-size]
            h, w = img_gt.shape[:2]
            top = int(rng.integers(1, max(h - 1 - self.gt_size, 1) + 1))
            left = int(rng.integers(1, max(w - 1 - self.gt_size, 1) + 1))
            img_gt = img_gt[top:top + self.gt_size, left:left + self.gt_size]
            img_lq = img_lq[top:top + self.gt_size, left:left + self.gt_size]
            st, sl = top * self.SR_SCALE, left * self.SR_SCALE
            img_sr = img_sr[st:st + self.sr_size, sl:sl + self.sr_size]

            if rng.uniform() < 0.1:  # 10% gaussian noise on LQ (:933-935)
                img_lq = add_gaussian_noise(img_lq, rng)
            if self.geometric_augs:
                img_gt, img_lq, img_sr = sync_augment_multi_scale(
                    [img_gt, img_lq, img_sr], rng)
            # zero-input epsilon guard (:941-944)
            zero_ratio = max(np.mean(img_lq == 0), np.mean(img_lq == 1))
            if zero_ratio > 0.10:
                img_lq = img_lq + 1e-14

        rate_plane = np.full((*img_lq.shape[:2], 1), denoise_rate, np.float32)
        to_rgb = lambda x: np.ascontiguousarray(x[..., ::-1].astype(np.float32))
        return {
            "lq": {"img": to_rgb(img_lq), "denoise_rate": rate_plane},
            "gt": {"hq": to_rgb(img_gt), "sr": to_rgb(img_sr)},
            "lq_path": p["lq_path"], "gt_path": p["gt_path"],
        }


class SuperRestorationDataset(SuperRestorationParamDataset):
    """3-modality (lq/gt/sr) variant without the JSON param folder
    (Dataset_SuperRestoration, paired_image_dataset.py:423-640): same
    synchronized two-scale pad/crop/aug, denoise_rate fixed at 1."""

    def __init__(self, opt: dict):
        opt = dict(opt)
        opt["denoise_rate"] = False
        _SeededDataset.__init__(self, opt.get("seed", 0),
                                opt.get("cache_decoded", False),
                                _io_opt_no_lmdb(opt, type(self).__name__))
        self.opt = opt
        self.phase = opt.get("phase", "train")
        self.scale = opt.get("scale", 1)
        self.gt_size = opt.get("gt_size", 256)
        self.sr_size = self.gt_size * self.SR_SCALE
        self.geometric_augs = opt.get("geometric_augs", False)
        self.use_denoise_rate = False
        self.paths = paired_paths_from_folder_param(
            [opt["dataroot_lq"], opt["dataroot_gt"], opt["dataroot_sr"]],
            ["lq", "gt", "sr"])

    def __getitem__(self, index: int):
        p = self.paths[index % len(self.paths)]
        rng = self._rng(index)
        img_gt = self._read_img(p["gt_path"], "gt")
        img_lq = self._read_img(p["lq_path"], "lq")
        img_sr = self._read_img(p["sr_path"], "sr")
        denoise_rate = 1.0

        if self.phase == "train":
            img_gt = _reflect101_pad_to(img_gt, self.gt_size + 2)
            img_lq = _reflect101_pad_to(img_lq, self.gt_size + 2)
            img_sr = _reflect101_pad_to(img_sr, self.sr_size + 4)
            h, w = img_gt.shape[:2]
            top = int(rng.integers(1, max(h - 1 - self.gt_size, 1) + 1))
            left = int(rng.integers(1, max(w - 1 - self.gt_size, 1) + 1))
            img_gt = img_gt[top:top + self.gt_size, left:left + self.gt_size]
            img_lq = img_lq[top:top + self.gt_size, left:left + self.gt_size]
            st, sl = top * self.SR_SCALE, left * self.SR_SCALE
            img_sr = img_sr[st:st + self.sr_size, sl:sl + self.sr_size]
            if rng.uniform() < 0.1:
                img_lq = add_gaussian_noise(img_lq, rng)
            if self.geometric_augs:
                img_gt, img_lq, img_sr = sync_augment_multi_scale(
                    [img_gt, img_lq, img_sr], rng)
            zero_ratio = max(np.mean(img_lq == 0), np.mean(img_lq == 1))
            if zero_ratio > 0.10:
                img_lq = img_lq + 1e-14

        rate_plane = np.full((*img_lq.shape[:2], 1), denoise_rate, np.float32)
        to_rgb = lambda x: np.ascontiguousarray(x[..., ::-1].astype(np.float32))
        return {
            "lq": {"img": to_rgb(img_lq), "denoise_rate": rate_plane},
            "gt": {"hq": to_rgb(img_gt), "sr": to_rgb(img_sr)},
            "lq_path": p["lq_path"], "gt_path": p["gt_path"],
        }


class PairedMultiImageDataset(_SeededDataset):
    """The student dataset (Dataset_PairedMutiImage,
    paired_image_dataset.py:109-297): temporal groups of ``num_pairs``
    grayscale frames with random stride, center-padded to the group max
    size, stacked (F, H, W); train-time masked-denoising corruption
    (64%: per-frame Bernoulli masks with a 36% prob+0.5 boost; else
    simulated frame interpolation), degenerate-input guard, 8-way aug.
    Extra phases 'test1' / 'interpolation' apply fixed corruption at eval.
    """

    def __init__(self, opt: dict):
        super().__init__(opt.get("seed", 0),
                         opt.get("cache_decoded", False),
                         _io_opt_no_lmdb(opt, type(self).__name__))
        self.opt = opt
        self.phase = opt.get("phase", "train")
        self.scale = opt.get("scale", 1)
        self.num_pairs = opt.get("num_pairs", 3)
        self.stride_range = tuple(opt.get("stride_range", (1, 5)))
        self.prob = opt.get("prob", 0.0)
        self.geometric_augs = opt.get("geometric_augs", False)
        self._folders = [opt["dataroot_lq"], opt["dataroot_gt"]]
        self.regroup(opt.get("seed", 0))

    def regroup(self, seed: int) -> None:
        """Re-roll the random per-group strides (per-epoch reshuffle of the
        reference's init-time grouping)."""
        self.paths = paired_multipaths_from_folder(
            self._folders, ["lq", "gt"], self.num_pairs, self.stride_range,
            seed=seed)

    def set_epoch(self, epoch: int) -> None:
        super().set_epoch(epoch)
        if self.stride_range[0] != self.stride_range[1]:
            self.regroup(self._seed + epoch)

    def __len__(self) -> int:
        return len(self.paths)

    def _corrupt_train(self, lq: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        """lq: (H, W, F). paired_image_dataset.py:219-241. The per-frame
        Bernoulli masking runs through the native C++ library when built
        (utils/native.py), else vectorized numpy."""
        from ..utils import native

        f = lq.shape[2]
        if rng.random() < 0.64:
            probs = np.where(rng.random(f) > 0.64, self.prob + 0.5,
                             self.prob).astype(np.float32)
        else:  # simulated frame interpolation
            assert f % 2 == 1, "frame count must be odd"
            for i in range(1, f, 2):
                lq[:, :, i] = 0.5 * (lq[:, :, i - 1] + lq[:, :, i + 1])
            probs = np.where(np.arange(f) % 2 == 1, self.prob + 0.5,
                             self.prob).astype(np.float32)
        stack = np.ascontiguousarray(lq.transpose(2, 0, 1))
        masked = native.mask_frames(stack, probs,
                                    seed=int(rng.integers(2**62)))
        return np.ascontiguousarray(masked.transpose(1, 2, 0))

    def __getitem__(self, index: int) -> dict[str, Any]:
        rng = self._rng(index)
        group = self.paths[index % len(self.paths)]
        gt_frames = [self._read(g["gt_path"], imread_gray, "gt")
                     for g in group]
        lq_frames = [self._read(g["lq_path"], imread_gray, "lq")
                     for g in group]
        th = max(img.shape[0] for img in gt_frames)
        tw = max(img.shape[1] for img in gt_frames)
        gt = np.stack([pad_image_center(x, th, tw) for x in gt_frames], axis=-1)
        lq = np.stack([pad_image_center(x, th, tw) for x in lq_frames], axis=-1)

        if self.phase == "train":
            gt_size = self.opt["gt_size"]
            lq, gt = pad_to_min_size(lq, gt, gt_size)
            gt, lq = paired_random_crop(gt, lq, gt_size, self.scale, rng)
            lq = self._corrupt_train(np.ascontiguousarray(lq), rng)
            zero_ratio = max(np.mean(lq == 0), np.mean(lq == 1))
            if zero_ratio > 0.64:
                lq = add_random_noise(lq, rng)
            if self.geometric_augs:
                gt, lq = random_augmentation(gt, lq, rng=rng)
        elif self.phase == "test1":  # fixed corruption eval (:253-258)
            for i in range(lq.shape[2]):
                if rng.random() < 0.2:
                    lq[:, :, i] = input_mask_np(lq[:, :, i], rng, self.prob + 0.6)
                else:
                    lq[:, :, i] = input_mask_np(lq[:, :, i], rng, self.prob)
        elif self.phase == "interpolation":  # (:260-272)
            for i in range(lq.shape[2]):
                if i % 2 == 1:
                    mean_img = 0.5 * (lq[:, :, i - 1] + lq[:, :, i + 1])
                    lq[:, :, i] = input_mask_np(mean_img, rng, self.prob + 0.5)
                else:
                    lq[:, :, i] = input_mask_np(lq[:, :, i], rng, self.prob)

        # HWC(F) -> (F, H, W) frame stack
        return {"lq": np.ascontiguousarray(lq.transpose(2, 0, 1)).astype(np.float32),
                "gt": np.ascontiguousarray(gt.transpose(2, 0, 1)).astype(np.float32),
                "lq_path": group[-1]["lq_path"],
                "gt_path": group[-1]["gt_path"]}


class SIQADataset(_SeededDataset):
    """ASDQE training dataset (Dataset_S_IQA,
    paired_image_dataset.py:643-855): lq/gt/param triplets, JSON 'score'
    label; reflect101 pad to gt_size, joint crop at offsets in
    [1, h-1-size], synchronized flip/flip/rot aug; returns
    {'lq': {'img', 'score'}, 'gt': {'hq'}}."""

    def __init__(self, opt: dict):
        super().__init__(opt.get("seed", 0),
                         opt.get("cache_decoded", False),
                         _io_opt_no_lmdb(opt, type(self).__name__))
        self.opt = opt
        self.phase = opt.get("phase", "train")
        self.gt_size = opt.get("gt_size", None)
        self.geometric_augs = opt.get("geometric_augs", False)
        self.paths = paired_paths_from_folder_param(
            [opt["dataroot_lq"], opt["dataroot_gt"], opt["dataroot_param"]],
            ["lq", "gt", "param"])

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, index: int) -> dict[str, Any]:
        rng = self._rng(index)
        p = self.paths[index % len(self.paths)]
        img_gt = self._read(p["gt_path"], imread_bgr, "gt")
        img_lq = self._read(p["lq_path"], imread_bgr, "lq")
        with open(p["param_path"]) as f:
            score = float(json.load(f)["score"])

        if self.phase == "train" and self.gt_size:
            # reflect101 pad + joint crop at offsets in [1, h-1-size]
            # (paired_image_dataset.py:770-803), like the teacher dataset
            img_gt = _reflect101_pad_to(img_gt, self.gt_size + 2)
            img_lq = _reflect101_pad_to(img_lq, self.gt_size + 2)
            h, w = img_gt.shape[:2]
            top = int(rng.integers(1, max(h - 1 - self.gt_size, 1) + 1))
            left = int(rng.integers(1, max(w - 1 - self.gt_size, 1) + 1))
            img_gt = img_gt[top:top + self.gt_size, left:left + self.gt_size]
            img_lq = img_lq[top:top + self.gt_size, left:left + self.gt_size]
            if self.geometric_augs:
                img_gt, img_lq = sync_augment_multi_scale([img_gt, img_lq],
                                                          rng)

        to_rgb = lambda x: np.ascontiguousarray(x[..., ::-1].astype(np.float32))
        return {"lq": {"img": to_rgb(img_lq),
                       "score": np.float32(score)},
                "gt": {"hq": to_rgb(img_gt)},
                "lq_path": p["lq_path"], "gt_path": p["gt_path"]}


class GaussianDenoisingDataset(_SeededDataset):
    """Synthetic gaussian-noise dataset (Dataset_GaussianDenoising,
    paired_image_dataset.py:1107-1247): clean images only; train-time noise
    at sigma constant/random/choice, eval at fixed sigma_test (reference
    seeds eval noise with numpy seed 0 per item — reproduced via the
    deterministic per-index RNG with a fixed eval seed)."""

    def __init__(self, opt: dict):
        io_opt = dict(opt.get("io_backend") or {"type": "disk"})
        root = opt["dataroot_gt"]
        if io_opt.get("type") == "lmdb":
            # single-shard lmdb on the clean images (reference
            # paired_image_dataset.py:1263-1270 pattern)
            io_opt.setdefault("db_paths", [root])
            io_opt.setdefault("client_keys", ["gt"])
        super().__init__(opt.get("seed", 0),
                         opt.get("cache_decoded", False), io_opt)
        self.opt = opt
        self.phase = opt.get("phase", "train")
        self.scale = opt.get("scale", 1)
        self.in_ch = opt.get("in_ch", 3)
        self.geometric_augs = opt.get("geometric_augs", False)
        if self.phase == "train":
            self.sigma_type = opt["sigma_type"]
            self.sigma_range = opt["sigma_range"]
            assert self.sigma_type in ("constant", "random", "choice")
        else:
            self.sigma_test = opt["sigma_test"]
        from .lmdb_util import paths_from_lmdb
        from .pairing import scan_files

        if io_opt.get("type") == "lmdb":
            self.paths = paths_from_lmdb(root)
        elif opt.get("meta_info_file"):
            with open(opt["meta_info_file"]) as f:
                self.paths = [osp.join(root, line.split(" ")[0].strip())
                              for line in f if line.strip()]
        else:
            self.paths = [osp.join(root, f) for f in scan_files(root)]

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, index: int) -> dict[str, Any]:
        rng = self._rng(index)
        path = self.paths[index % len(self.paths)]
        if self.in_ch == 3:
            img_gt = np.ascontiguousarray(
                self._read(path, imread_bgr, "gt")[..., ::-1])  # RGB
        else:
            img_gt = self._read(path, imread_gray, "gt")[..., None]
        img_lq = img_gt.copy()

        if self.phase == "train":
            gt_size = self.opt["gt_size"]
            img_lq, img_gt = pad_to_min_size(img_lq, img_gt, gt_size)
            img_gt, img_lq = paired_random_crop(img_gt, img_lq, gt_size,
                                                self.scale, rng)
            if self.geometric_augs:
                img_gt, img_lq = random_augmentation(img_gt, img_lq, rng=rng)
            if self.sigma_type == "constant":
                sigma = float(self.sigma_range)
            elif self.sigma_type == "random":
                sigma = float(rng.uniform(*self.sigma_range))
            else:
                sigma = float(rng.choice(self.sigma_range))
            img_lq = img_lq + rng.standard_normal(img_lq.shape) * (sigma / 255.0)
        else:
            eval_rng = np.random.default_rng(0)
            img_lq = img_lq + eval_rng.normal(
                0, self.sigma_test / 255.0, img_lq.shape)

        return {"lq": np.ascontiguousarray(img_lq.astype(np.float32)),
                "gt": np.ascontiguousarray(img_gt.astype(np.float32)),
                "lq_path": path, "gt_path": path}


class SingleImageDataset(_SeededDataset):
    """LQ-only inference dataset (single_image_dataset.py): reads one
    folder (or meta-info list), returns {'lq', 'lq_path'}."""

    def __init__(self, opt: dict):
        io_opt = dict(opt.get("io_backend") or {"type": "disk"})
        root = opt["dataroot_lq"]
        if io_opt.get("type") == "lmdb":
            io_opt.setdefault("db_paths", [root])
            io_opt.setdefault("client_keys", ["lq"])
        super().__init__(opt.get("seed", 0),
                         opt.get("cache_decoded", False), io_opt)
        self.opt = opt
        from .lmdb_util import paths_from_lmdb
        from .pairing import scan_files

        if io_opt.get("type") == "lmdb":
            self.paths = paths_from_lmdb(root)
        elif opt.get("meta_info_file"):
            with open(opt["meta_info_file"]) as f:
                self.paths = [osp.join(root, line.split(" ")[0].strip())
                              for line in f if line.strip()]
        else:
            self.paths = [osp.join(root, f) for f in scan_files(root)]

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, index: int) -> dict[str, Any]:
        path = self.paths[index % len(self.paths)]
        img = np.ascontiguousarray(
            self._read(path, imread_bgr, "lq")[..., ::-1])
        return {"lq": img.astype(np.float32), "lq_path": path}


class DefocusDeblurDualPixel16Dataset(_SeededDataset):
    """Dual-pixel defocus deblurring (Dataset_DefocusDeblur_DualPixel_16bit,
    paired_image_dataset.py:1249-1336): 16-bit lqL/lqR/gt triplets, paired
    crop/aug across all three, lq = concat(lqL, lqR) on channels (use with
    the teacher's dual_pixel_task=True, inp_channels=6)."""

    def __init__(self, opt: dict):
        super().__init__(opt.get("seed", 0),
                         opt.get("cache_decoded", False),
                         _io_opt_no_lmdb(opt, type(self).__name__))
        self.opt = opt
        self.phase = opt.get("phase", "train")
        self.scale = opt.get("scale", 1)
        self.geometric_augs = opt.get("geometric_augs", False)
        self.paths = paired_paths_from_folder(
            [opt["dataroot_lqL"], opt["dataroot_lqR"], opt["dataroot_gt"]],
            ["lqL", "lqR", "gt"], opt.get("filename_tmpl", "{}"))

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, index: int) -> dict[str, Any]:
        rng = self._rng(index)
        p = self.paths[index % len(self.paths)]
        img_gt = self._read(p["gt_path"], _imread_16bit, "gt")
        img_lql = self._read(p["lqL_path"], _imread_16bit, "lqL")
        img_lqr = self._read(p["lqR_path"], _imread_16bit, "lqR")

        if self.phase == "train":
            gt_size = self.opt["gt_size"]
            img_lql, img_gt = pad_to_min_size(img_lql, img_gt, gt_size)
            img_lqr, _ = pad_to_min_size(img_lqr, img_lqr, gt_size)
            # same crop window for all three (paired_random_crop_DP)
            gts, lqs = paired_random_crop([img_gt], [img_lql, img_lqr],
                                          gt_size, self.scale, rng)
            img_gt, (img_lql, img_lqr) = gts[0], lqs
            if self.geometric_augs:
                img_lql, img_lqr, img_gt = random_augmentation(
                    img_lql, img_lqr, img_gt, rng=rng)

        to_rgb = lambda x: np.ascontiguousarray(x[..., ::-1].astype(np.float32))
        lq = np.concatenate([to_rgb(img_lql), to_rgb(img_lqr)], axis=-1)
        return {"lq": lq, "gt": to_rgb(img_gt),
                "lq_path": p["lqL_path"], "gt_path": p["gt_path"]}


def _video_datasets():
    from .video_datasets import (
        FFHQDataset,
        REDSDataset,
        VideoTestDataset,
        Vimeo90KDataset,
    )

    return {
        "REDSDataset": REDSDataset,
        "Vimeo90KDataset": Vimeo90KDataset,
        "VideoTestDataset": VideoTestDataset,
        "FFHQDataset": FFHQDataset,
    }


DATASETS = {
    "Dataset_PairedImage": PairedImageDataset,
    "Dataset_SuperRestoration_param": SuperRestorationParamDataset,
    "Dataset_SuperRestoration": SuperRestorationDataset,
    "Dataset_PairedMutiImage": PairedMultiImageDataset,
    "Dataset_S_IQA": SIQADataset,
    "Dataset_GaussianDenoising": GaussianDenoisingDataset,
    "Dataset_SingleImage": SingleImageDataset,
    "Dataset_DefocusDeblur_DualPixel_16bit": DefocusDeblurDualPixel16Dataset,
}
DATASETS.update(_video_datasets())

# Every dataset option key any registered dataset or the loader layer
# consumes. Config validation rejects keys outside this set, so a
# misspelled or dead key fails fast instead of being silently ignored
# (the string-typed-config trap SURVEY §5.6 calls out; io_backend was
# exactly such a dead key in round 2).
KNOWN_DATASET_KEYS = frozenset({
    # identity / injected by config parsing
    "type", "name", "phase", "scale",
    # storage + decode
    "io_backend", "cache_decoded", "filename_tmpl", "meta_info_file",
    "dataroot_lq", "dataroot_gt", "dataroot_sr", "dataroot_param",
    "dataroot_lqL", "dataroot_lqR", "dataroot_flow",
    # sampling / loader (data/__init__.py:56-119 analog)
    "use_shuffle", "num_worker_per_gpu", "batch_size_per_gpu",
    "dataset_enlarge_ratio", "drop_last", "pin_memory", "prefetch_mode",
    "seed", "device_resident",
    # crops / aug
    "gt_size", "geometric_augs", "mean", "std", "use_hflip", "use_rot",
    # progressive curriculum (train.py:246-252)
    "mini_batch_sizes", "iters", "gt_sizes", "prob", "probs",
    # teacher / student specifics
    "denoise_rate", "num_pairs", "stride_range",
    # gaussian-denoising specifics
    "in_ch", "sigma_type", "sigma_range", "sigma_test",
    # video datasets
    "num_frame", "interval_list", "random_reverse", "center_frame_idx",
    "frames_per_clip", "padding", "cache_data", "val_partition",
})


def validate_dataset_opt(opt: dict, where: str = "datasets") -> None:
    """Fail fast on unknown/ignored dataset keys."""
    unknown = set(opt) - KNOWN_DATASET_KEYS
    if unknown:
        raise KeyError(
            f"{where}: unknown dataset option key(s) {sorted(unknown)} — "
            "these would be silently ignored; remove or fix them "
            f"(known keys: {sorted(KNOWN_DATASET_KEYS)})")


def create_dataset(opt: dict):
    """Reference-style registry (data/__init__.py:29-54)."""
    t = opt["type"]
    if t not in DATASETS:
        raise KeyError(f"unknown dataset type {t!r}; known: {sorted(DATASETS)}")
    return DATASETS[t](opt)

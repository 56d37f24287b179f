"""Inference predictors — the reference notebooks' serving path as an API.

TeacherPredictor  = KDLAE_T.ipynb cell 5: reflect-pad to multiple of 8,
                    denoise-rate plane, forward, clamp, crop hq/sr, ubyte,
                    fan-beam zero-mask.
StudentPredictor  = KDLAE-S.ipynb cell 3: 7-frame grayscale stack
                    (resize-to-first), reflect-pad to multiple of 32,
                    forward, clamp, crop.
ASDQEScorer       = ASDQE_test.py:87-104 batch scoring.

TPU specifics: forwards are jitted per padded shape; ``shape_bucket``
optionally rounds padded sizes up to a coarser grid so arbitrary-size image
folders hit a handful of compiled programs instead of one per size. Params
can live in bf16 for speed (quality path stays fp32 by default).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models import DenoiseRatePredictor, KDLAEStudent, KDLAETeacher
from ..ops.mask import apply_zero_mask, zero_mask_from_input
from ..utils.image_io import imread_gray, imread_rgb, list_images, resize_area, to_ubyte


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nullcontext():
    import contextlib

    return contextlib.nullcontext()


def _to_ubyte_device(x: jnp.ndarray) -> jnp.ndarray:
    """On-device img_as_ubyte: clip, fp32, *255, round-half-to-even.

    Bit-identical to utils.image_io.to_ubyte applied to the fetched float
    array (elementwise fp32 ops, jnp.rint == np.rint), but the jit emits
    uint8 so the device->host fetch carries 1 byte/px instead of 4 (fp32)
    or 2 (bf16) — a serving-boundary win on any interconnect, and 4x on
    this host's ~38 MB/s tunnel where the fetch dominates latency."""
    x32 = jnp.clip(x, 0.0, 1.0).astype(jnp.float32)
    return jnp.rint(x32 * 255.0).astype(jnp.uint8)


def _data_axis_size(mesh, who: str) -> int:
    """Validate a DP-serving mesh — only the 'data' axis may exceed 1
    (spatial/model axes partition ONE sample's compute and belong to the
    whole-image serving path) — and return the axis size."""
    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS, SPATIAL_AXIS

    shape = dict(mesh.shape)
    if (int(shape.get(SPATIAL_AXIS, 1)) > 1
            or int(shape.get(MODEL_AXIS, 1)) > 1):
        raise ValueError(
            f"{who} shards its batch over the 'data' mesh axis only; "
            "spatial/model axes are not supported on this path")
    if DATA_AXIS not in shape:
        raise ValueError(
            f"{who} needs a '{DATA_AXIS}' axis in the serving mesh "
            f"(got axes {sorted(shape)}); build it with "
            "parallel.mesh.make_mesh or name your batch axis 'data'")
    return int(shape[DATA_AXIS])


def _data_batch_put(mesh, x: np.ndarray, dtype):
    """Upload a host batch sharded over 'data' (uint8 ships as-is and
    converts in-jit; floats cast to the serving dtype host-side)."""
    from ..parallel.mesh import batch_sharding

    return jax.device_put(x if x.dtype == np.uint8 else x.astype(dtype),
                          batch_sharding(mesh))


def _pad_reflect_np(x: np.ndarray, ph: int, pw: int, axes=(1, 2)) -> np.ndarray:
    if ph == 0 and pw == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axes[0]] = (0, ph)
    pad[axes[1]] = (0, pw)
    return np.pad(x, pad, mode="reflect")


@dataclass
class TeacherPredictor:
    """Whole-image KDLAE-T denoiser with the notebook's pre/postprocessing."""

    params: Any
    model: KDLAETeacher = field(default_factory=lambda: KDLAETeacher(
        layernorm_type="BiasFree", static="train", params="cat"))
    multiple_of: int = 8
    # shape_bucket rounds padded sizes up to a coarser grid so arbitrary
    # folders hit a handful of compiled programs. NB: MDTA attention is
    # global over the padded pixels, so bucketed outputs deviate slightly
    # from exact multiple-of-8 padding (the reference notebook semantics);
    # leave None for reference-exact behavior.
    shape_bucket: int | None = None
    dtype: Any = jnp.float32
    # Optional multi-chip serving: a Mesh with a 'spatial' axis shards
    # image rows across devices — XLA's SPMD partitioner inserts the conv
    # halo exchanges and the MDTA pixel-axis reductions (psum) over ICI
    # (the §5.7 CP analog for huge sonar frames). Numerics match the
    # single-device path to fp tolerance (tests/test_parallel.py) WHEN the
    # padded height is unchanged; because rows must split evenly, H is
    # rounded up to multiple_of * n_spatial, and any extra padding rows
    # shift the global-MDTA statistics exactly like shape_bucket does.
    mesh: Any = None
    # Serve with the folded resamplers (models/blocks.py Downsample /
    # Upsample fused=True): same params, same math, one strided/dilated
    # conv per resampler instead of conv + pixel-(un)shuffle formatting.
    fused_resample: bool = False
    # Route eligible TransformerStages through the batched Pallas stage
    # megakernel (ops/pallas/stage.py — per-block weights VMEM-resident
    # across the tile batch). Opt-in: ties XLA at the b8x256 tile shape,
    # loses at whole-image shapes (docs/perf_plan.md).
    fused: bool = False

    def __post_init__(self):
        if self.fused_resample:
            self.model = self.model.clone(fused_resample=True)
        if self.fused:
            self.model = self.model.clone(fused=True)
        if self.shape_bucket and self.shape_bucket % self.multiple_of:
            # a bucket that isn't a multiple of the model's pad unit would
            # replace it in padding and feed the pixel-unshuffle stages a
            # size they reject with an opaque reshape error deep in jit
            raise ValueError(
                f"shape_bucket={self.shape_bucket} must be a multiple of "
                f"multiple_of={self.multiple_of}")
        self._apply = functools.partial(jax.jit(self._forward))
        self._placed_params = None
        if self.mesh is not None:
            from ..parallel.mesh import MODEL_AXIS, SPATIAL_AXIS

            shape = dict(self.mesh.shape)
            self._n_spatial = int(shape[SPATIAL_AXIS])
            self._n_model = int(shape.get(MODEL_AXIS, 1))
            if self._n_spatial > 1 and self._n_model > 1:
                # measured miscompare (2026-08-18, jax 0.8 CPU SPMD): conv
                # kernels sharded on output features combined with
                # halo-partitioned (row-sharded) inputs produce wrong
                # numerics (max|diff| 22 on a [0,1] image; either axis
                # alone is exact to 1e-5 — tests/test_parallel.py). Refuse
                # rather than serve silently-corrupt images.
                raise ValueError(
                    "tensor-parallel ('model') and spatial mesh axes "
                    "cannot be combined in one predictor: XLA's SPMD "
                    "partitioner mis-partitions feature-sharded conv "
                    "kernels under halo exchange; use one axis > 1")
        else:
            self._n_spatial = 1
            self._n_model = 1

    def _place_inputs(self, x: np.ndarray, rate: np.ndarray):
        """Shard (1, H, W, C) host arrays over the spatial mesh (one H2D
        each — no staging copy on the default device); place params once
        on first use — replicated, or channel-sharded over the 'model'
        axis when the mesh has one (tensor-parallel serving: XLA SPMD
        propagates the Megatron-style block interior and inserts the
        channel collectives; see parallel.mesh.model_param_specs)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import SPATIAL_AXIS, model_param_specs, replicated

        spec = NamedSharding(self.mesh, P(None, SPATIAL_AXIS, None, None))
        if self._placed_params is None:
            placement = (model_param_specs(self.mesh, self.params)
                         if self._n_model > 1 else replicated(self.mesh))
            self._placed_params = jax.device_put(self.params, placement)
        return (self._placed_params,
                jax.device_put(x, spec).astype(self.dtype),
                jax.device_put(rate, spec).astype(self.dtype))

    def _forward(self, params, img, rate_plane):
        # uint8 input boundary: images land as 1 byte/px and convert on
        # device (x/255 — the model sees float values identical to the
        # host readers' astype/255; uint8 OUTPUTS can differ from the
        # float-input program by <=1 quantization level on isolated
        # pixels where XLA fuses the cast differently). Host->device is
        # the dominant serving cost off-chip (4 B/px fp32 + a constant
        # fp32 rate PLANE was 5.3x the bytes of uint8 + a scalar rate).
        if img.dtype == jnp.uint8:
            # divide in float32 FIRST, then cast: u8->f32/255 reproduces
            # the host readers' values exactly, so the model input is
            # bit-identical to the float boundary in every serving dtype
            # (dividing directly in bf16 would perturb inputs by a bf16
            # ulp, which a model can amplify)
            img = (img.astype(jnp.float32) / 255.0).astype(self.dtype)
        if rate_plane.ndim == 0:
            # scalar denoise rate: materialize the (1, H, W, 1) plane the
            # model expects on device (broadcast is free under XLA fusion)
            rate_plane = jnp.broadcast_to(
                rate_plane.astype(self.dtype), (*img.shape[:3], 1))
        # fp32 quality path pins matmul precision so TPU fp32 matches the
        # reference's CPU numerics (see ASDQEScorer)
        ctx = (jax.default_matmul_precision("highest")
               if self.dtype == jnp.float32 else _nullcontext())
        with ctx:
            out = self.model.apply({"params": params},
                                   {"img": img, "denoise_rate": rate_plane})
            # clamp + ubyte on device: the jit emits uint8 (see
            # _to_ubyte_device) — same values as the notebook's host-side
            # clamp/img_as_ubyte, minus 2-4x of D2H traffic
            hq = _to_ubyte_device(out["hq"])
            sr = None if out["sr"] is None else _to_ubyte_device(out["sr"])
            return hq, sr

    def __call__(self, img_rgb: np.ndarray, denoise_rate: float = 1.0,
                 zero_mask: bool = True):
        """img_rgb: (H, W, 3) float32 [0,1] or uint8. Returns dict with
        'hq' and (when the model has the SR branch) 'sr' uint8 arrays.
        uint8 inputs ship 1 byte/px and convert in-jit; outputs agree
        with the float boundary to <=1 quantization level."""
        h, w, _ = img_rgb.shape
        m = self.multiple_of
        if self.shape_bucket:
            m = self.shape_bucket
        if self._n_spatial > 1:
            # padded H must split evenly across the spatial mesh axis
            m = m * self._n_spatial
        ph = _round_up(h, m) - h
        pw = _round_up(w, self.shape_bucket or self.multiple_of) - w
        if img_rgb.dtype == np.uint8:
            x = _pad_reflect_np(img_rgb[None], ph, pw)
        else:
            x = _pad_reflect_np(img_rgb[None], ph, pw).astype(np.float32)
        if self.mesh is not None:
            # spatial-mesh placement converts host-side (device_put shards
            # with an .astype outside the jit, which must not reinterpret
            # raw uint8 values)
            if x.dtype == np.uint8:
                x = x.astype(np.float32) / 255.0
            rate = np.full((1, x.shape[1], x.shape[2], 1), denoise_rate,
                           np.float32)
            args = self._place_inputs(x, rate)
        else:
            args = (self.params,
                    jnp.asarray(x) if x.dtype == np.uint8
                    else jnp.asarray(x, self.dtype),
                    jnp.asarray(denoise_rate, self.dtype))
        hq, sr = self._apply(*args)
        hq = np.asarray(hq[0, :h, :w])
        out = {}
        if zero_mask:
            mask = zero_mask_from_input(
                img_rgb if img_rgb.dtype == np.uint8 else to_ubyte(img_rgb))
            hq = apply_zero_mask(hq, mask)
        out["hq"] = hq
        if sr is not None:
            sr_img = np.asarray(sr[0, : 2 * h, : 2 * w])
            if zero_mask:
                sr_img = apply_zero_mask(sr_img, mask, scale=2)
            out["sr"] = sr_img
        return out

    def denoise_file(self, path: str, denoise_rate: float = 1.0, **kw):
        from ..utils.image_io import imread_rgb_ubyte

        # uint8 boundary: 4x less H2D; outputs within 1 quantization
        # level of the float reader (see _forward)
        return self(imread_rgb_ubyte(path), denoise_rate, **kw)

    def denoise_group(self, imgs_rgb: list[np.ndarray],
                      denoise_rate: float = 1.0, zero_mask: bool = True,
                      group_size: int = 8) -> list[dict]:
        """Throughput serving mode: same-shape images are run back-to-back
        inside ONE jit via lax.scan, amortizing per-dispatch overhead
        (measured +4% img/s on v5e at 512px, bench.py). Numerics are
        bit-identical to per-image ``__call__`` — scan iterates the
        leading dim and every model op is per-image (on-chip parity:
        PERF_SWEEP2.json scan_parity_max_abs_diff = 0.0). With
        ``shape_bucket`` set, images whose BUCKETED padded size matches
        scan together (each cropped back to its own size); without it,
        raw shapes must match. Everything else — including mesh mode,
        whose even-split padding differs — falls back to per-image calls.
        """
        if not imgs_rgb:
            return []
        if self.mesh is not None:
            # spatial-mesh mode is a latency path for huge frames; its
            # padded sizes differ from the scan path's, so keep numerics
            # consistent by serving per image
            return [self(im, denoise_rate, zero_mask=zero_mask)
                    for im in imgs_rgb]
        shape0 = imgs_rgb[0].shape
        if any(im.shape != shape0 for im in imgs_rgb):
            m_b = self.shape_bucket
            targets = {( _round_up(im.shape[0], m_b),
                         _round_up(im.shape[1], m_b)) for im in imgs_rgb} \
                if m_b else None
            if not (m_b and len(targets) == 1):
                return [self(im, denoise_rate, zero_mask=zero_mask)
                        for im in imgs_rgb]

        full_end = (len(imgs_rgb) // group_size) * group_size
        groups = [imgs_rgb[b:b + group_size]
                  for b in range(0, full_end, group_size)]
        tail = imgs_rgb[full_end:]

        results: list[dict] = []
        pending = None
        # two-stage pipeline: a one-slot worker thread preps (pad/stack)
        # and UPLOADS group k+1 while group k computes on device and
        # group k-1's D2H fetch + host post-processing run on the main
        # thread. jax device_put is thread-safe and H2D overlaps device
        # compute (the training DevicePrefetcher relies on the same);
        # numerics are identical — the worker runs the exact host path
        # dispatch_group would.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = (ex.submit(self._prep_and_upload, groups[0], denoise_rate)
                   if groups else None)
            for i in range(len(groups)):
                uploaded = fut.result()
                fut = (ex.submit(self._prep_and_upload, groups[i + 1],
                                 denoise_rate)
                       if i + 1 < len(groups) else None)
                handle = self._dispatch_uploaded(uploaded)
                # the previous group's fetch + post-processing overlap
                # this group's device compute (jax dispatch is async) —
                # VERDICT r2 #6a
                if pending is not None:
                    results.extend(self.fetch_group(pending,
                                                    zero_mask=zero_mask))
                pending = handle
        if pending is not None:
            results.extend(self.fetch_group(pending, zero_mask=zero_mask))
        # short tail: a different scan length would retrace and pay
        # minutes of remote compile to serve a few images — the
        # per-image program is already compiled (or cheaper to)
        results.extend(self(im, denoise_rate, zero_mask=zero_mask)
                       for im in tail)
        return results

    # ------------------------------------------------------------ tiled --
    def denoise_tiled(self, imgs_rgb: list[np.ndarray],
                      denoise_rate: float = 1.0, zero_mask: bool = True,
                      tile: int | tuple[int, int] = 256,
                      halo: int | tuple[int, int] = 0,
                      tile_batch: int = 8) -> list[dict]:
        """Tiled batched serving — the measured fast path for large frames.

        Splits each image into a grid of ``tile``-sized interiors, each
        forwarded with a ``halo``-pixel context ring (reflect-padded
        canvas), batched ``tile_batch`` tiles per dispatch ACROSS images,
        then reassembled from the tile interiors. Covers the same
        notebook serving contract as ``__call__`` (pad / clamp / crop /
        uint8 / fan-beam zero-mask; KDLAE_T.ipynb cell 5) but is NOT
        bit-identical to whole-image inference: the MDTA attention
        statistics (KDLAE_model.py:134-140 — global over the image) are
        computed per tile, and conv receptive fields are truncated past
        the halo. Measured on v5e (512px bf16): 8x256px tiles per
        dispatch run at 0.356 us/px vs whole-image 0.485 — a 1.36x
        throughput win at halo 0 (93 vs 127 ms/512px-image). The default
        halo is 0 — the full win, and golden-equivalent quality on real
        frames (vs-golden PSNR 31.65 vs 31.73 at halo 8, trained-ASDQE
        identical; artifacts/tiled_ab). halo > 0 buys whole-image
        fidelity (+1.7 dB vs-whole at halo 8) but pads the program off
        the fast 256-dims (+24% time). Quality-vs-halo numbers live in
        docs/perf_plan.md; whole-image remains the reference-exact
        default.

        Multi-chip: with a mesh whose 'data' axis is > 1 (spatial and
        model axes must be 1) the tile batch shards across devices —
        tiles are independent samples, so the DP split is exact vs
        single-device (tests/test_tiled_serving.py) and needs no
        collectives; throughput scales with the axis up to the
        host-boundary limit.

        ``tile`` and ``halo`` accept (rows, cols) tuples for rectangular
        modes — notably STRIPS (e.g. ``tile=(256, 512)``, full-width
        rows): one seam direction instead of two (half the seam surface
        of the square grid) at a measured 1.29x on 512px frames
        (docs/perf_plan.md round-4 table, 256x512 row), and a per-axis
        halo like ``halo=(8, 0)`` buys context across the single seam
        without paying it on the full-width axis.
        """
        if not imgs_rgb:
            return []
        n_data = 1
        if self.mesh is not None:
            # multi-chip tiled serving: the TILE BATCH shards over the
            # 'data' mesh axis (tiles are independent samples, so DP is
            # exact — XLA runs the same per-tile program per device, no
            # collectives).
            n_data = _data_axis_size(self.mesh, "tiled serving")
            if tile_batch % n_data:
                raise ValueError(
                    f"tile_batch ({tile_batch}) must be divisible by the "
                    f"mesh 'data' axis size ({n_data})")
        t_h, t_w = (tile, tile) if isinstance(tile, int) else tile
        h_h, h_w = (halo, halo) if isinstance(halo, int) else halo
        T_h, T_w = t_h + 2 * h_h, t_w + 2 * h_w
        if any(v % self.multiple_of
               for v in (t_h, t_w, T_h, T_w)):
            # the model's pixel-unshuffle stages need /8-divisible inputs
            # (notebook pad contract); a bad halo would die deep in jit
            raise ValueError(
                f"tile ({t_h}x{t_w}) and tile+2*halo ({T_h}x{T_w}) must "
                f"be multiples of {self.multiple_of}")
        # ---- host prep: grid-pad + halo-pad each image, slice tiles ----
        metas = []   # (h, w, gh, gw) per image
        tiles = []   # uint8/float tiles in image-major, row-major order
        norm = []
        small = {}   # index -> whole-image result (reflect needs pad < dim)
        for idx, im in enumerate(imgs_rgb):
            h, w = im.shape[:2]
            gh, gw = -(-h // t_h), -(-w // t_w)
            ph, pw = gh * t_h - h, gw * t_w - w
            if ph + h_h >= h or pw + h_w >= w:
                # image (axis) smaller than a tile: tiling buys nothing
                # and reflect padding is ill-defined — whole-image path
                small[idx] = self(im, denoise_rate, zero_mask=zero_mask)
                continue
            canvas = np.pad(im, ((h_h, ph + h_h), (h_w, pw + h_w),
                                 (0, 0)), mode="reflect")
            metas.append((idx, h, w, gh, gw))
            norm.append(im)
            for i in range(gh):
                for j in range(gw):
                    tiles.append(canvas[i * t_h:i * t_h + T_h,
                                        j * t_w:j * t_w + T_w])
        if not tiles:
            return [small[i] for i in range(len(imgs_rgb))]
        if any(t.dtype != np.uint8 for t in tiles):
            tiles = [t.astype(np.float32) / 255.0 if t.dtype == np.uint8
                     else t.astype(np.float32) for t in tiles]

        # ---- batched device pass (static batch: pad the last chunk).
        # Dispatch EVERY chunk before fetching any: jax dispatch is async,
        # so chunk k+1's H2D upload and compute overlap chunk k's D2H
        # fetch — without this the per-chunk round trips serialize and a
        # faster device program LOSES end-to-end (measured 2x slower
        # through the tunnel).
        if not hasattr(self, "_tile_apply"):
            self._tile_apply = jax.jit(self._forward)
        rate_dev = jnp.asarray(denoise_rate, self.dtype)
        params_used = None
        if n_data > 1:
            from ..parallel.mesh import replicated

            if self._placed_params is None:
                self._placed_params = jax.device_put(
                    self.params, replicated(self.mesh))
            params_used = self._placed_params
        # Bounded in-flight window: dispatch stays ahead of the fetches
        # (the overlap that makes the path win e2e) but never holds more
        # than max_in_flight chunks of device buffers at once, so a
        # whole-folder call on thousands of images keeps memory flat
        # (the serve daemon additionally slices its backlog — cli.py).
        max_in_flight = 16
        pending: list = []
        hq_tiles, sr_tiles = [], []

        def _drain_one():
            n, (hq, sr) = pending.pop(0)
            hq_tiles.extend(np.asarray(hq[:n]))
            if sr is not None:
                sr_tiles.extend(np.asarray(sr[:n]))

        for b in range(0, len(tiles), tile_batch):
            chunk = tiles[b:b + tile_batch]
            n = len(chunk)
            if n < tile_batch:  # keep ONE compiled batch shape
                chunk = chunk + [chunk[-1]] * (tile_batch - n)
            x = np.stack(chunk)
            if x.dtype != np.uint8:
                x = x.astype(self.dtype)
            if params_used is not None:
                pending.append((n, self._tile_apply(
                    params_used, _data_batch_put(self.mesh, x, self.dtype),
                    rate_dev)))
            else:
                pending.append((n, self._tile_apply(self.params,
                                                    jnp.asarray(x),
                                                    rate_dev)))
            if len(pending) >= max_in_flight:
                _drain_one()
        while pending:
            _drain_one()

        # ---- reassemble interiors ----
        tiled_results, k = {}, 0
        for (idx, h, w, gh, gw), im in zip(metas, norm):
            out_hq = np.empty((gh * t_h, gw * t_w, 3), np.uint8)
            out_sr = (np.empty((2 * gh * t_h, 2 * gw * t_w, 3), np.uint8)
                      if sr_tiles else None)
            for i in range(gh):
                for j in range(gw):
                    out_hq[i * t_h:(i + 1) * t_h,
                           j * t_w:(j + 1) * t_w] = \
                        hq_tiles[k][h_h:h_h + t_h, h_w:h_w + t_w]
                    if out_sr is not None:
                        out_sr[2 * i * t_h:2 * (i + 1) * t_h,
                               2 * j * t_w:2 * (j + 1) * t_w] = \
                            sr_tiles[k][2 * h_h:2 * (h_h + t_h),
                                        2 * h_w:2 * (h_w + t_w)]
                    k += 1
            hq = out_hq[:h, :w]
            out = {}
            if zero_mask:
                mask = zero_mask_from_input(
                    im if im.dtype == np.uint8 else to_ubyte(im))
                hq = apply_zero_mask(hq, mask)
            out["hq"] = hq
            if out_sr is not None:
                sr_img = out_sr[:2 * h, :2 * w]
                if zero_mask:
                    sr_img = apply_zero_mask(sr_img, mask, scale=2)
                out["sr"] = sr_img
            tiled_results[idx] = out
        tiled_results.update(small)
        return [tiled_results[i] for i in range(len(imgs_rgb))]

    def scan_eligible(self, imgs: list[np.ndarray],
                      group_size: int) -> bool:
        """True when ``imgs`` can run as ONE scan dispatch (full group,
        uniform raw — or uniformly bucketed — shape, no spatial mesh)."""
        if self.mesh is not None or len(imgs) != group_size:
            return False
        shape0 = imgs[0].shape
        if all(im.shape == shape0 for im in imgs):
            return True
        m_b = self.shape_bucket
        if not m_b:
            return False
        targets = {(_round_up(im.shape[0], m_b), _round_up(im.shape[1], m_b))
                   for im in imgs}
        return len(targets) == 1

    def _prep_and_upload(self, chunk: list[np.ndarray],
                         denoise_rate: float):
        """Host prep (normalize/pad/stack) + H2D upload of one scan group.
        Thread-safe: runs in the upload-prefetch worker so group k+1's
        ~20 ms/img H2D rides under group k's device compute. Returns the
        (possibly dtype-normalized) chunk plus device-resident inputs."""
        m = self.shape_bucket or self.multiple_of
        target_h = max(_round_up(im.shape[0], m) for im in chunk)
        target_w = max(_round_up(im.shape[1], m) for im in chunk)
        if any(im.dtype != np.uint8 for im in chunk):
            # mixed dtypes must not stack raw (uint8 0..255 would promote
            # without the /255): normalize stragglers to the float boundary
            chunk = [im.astype(np.float32) / 255.0 if im.dtype == np.uint8
                     else im for im in chunk]
        x = np.stack([
            _pad_reflect_np(im[None], target_h - im.shape[0],
                            target_w - im.shape[1])
            for im in chunk])
        if x.dtype != np.uint8:  # uint8 groups ship 1 byte/px (see _forward)
            x = x.astype(np.float32)
        # per-image SCALAR rates; the (H, W, 1) plane the model wants is
        # broadcast on device — shipping it cost 1 fp32/px of pure H2D
        rates = np.full((len(chunk),), denoise_rate, np.float32)
        return (chunk,
                jnp.asarray(x) if x.dtype == np.uint8
                else jnp.asarray(x, self.dtype),
                jnp.asarray(rates, self.dtype))

    def _dispatch_uploaded(self, uploaded):
        """Dispatch one scan group whose inputs already live on device."""
        if not hasattr(self, "_scan_apply"):
            def scan_fwd(params, imgs, rates):
                def body(_, xs):
                    i, r = xs
                    return None, self._forward(params, i, r)

                _, outs = jax.lax.scan(body, None, (imgs, rates))
                return outs

            self._scan_apply = jax.jit(scan_fwd)
        norm_chunk, x_dev, rates_dev = uploaded
        hqs, srs = self._scan_apply(self.params, x_dev, rates_dev)
        return (norm_chunk, hqs, srs)

    def dispatch_group(self, chunk: list[np.ndarray],
                       denoise_rate: float = 1.0):
        """Asynchronously dispatch one scan group; returns an opaque
        handle for ``fetch_group``. Caller guarantees the chunk is
        scan-eligible (uniform bucketed shape, full group)."""
        return self._dispatch_uploaded(
            self._prep_and_upload(chunk, denoise_rate))

    def fetch_group(self, handle, zero_mask: bool = True) -> list[dict]:
        """Fetch + post-process a dispatched group (D2H boundary)."""
        chunk, hqs, srs = handle
        results: list[dict] = []
        for j, im in enumerate(chunk):
            h, w = im.shape[:2]
            hq = np.asarray(hqs[j, 0, :h, :w])
            out = {}
            if zero_mask:
                mask = zero_mask_from_input(
                    im if im.dtype == np.uint8 else to_ubyte(im))
                hq = apply_zero_mask(hq, mask)
            out["hq"] = hq
            if srs is not None:
                sr_img = np.asarray(srs[j, 0, :2 * h, :2 * w])
                if zero_mask:
                    sr_img = apply_zero_mask(sr_img, mask, scale=2)
                out["sr"] = sr_img
            results.append(out)
        return results


@dataclass
class StudentPredictor:
    """Multi-frame KDLAE-S denoiser (temporal stack serving path)."""

    params: Any
    model: KDLAEStudent = field(default_factory=lambda: KDLAEStudent(
        residual=True, hidden_channels=(16, 32, 64)))
    multiple_of: int = 32
    num_frames: int = 7
    dtype: Any = jnp.float32
    # Optional multi-chip serving: a mesh whose 'data' axis is > 1 shards
    # the STACK BATCH in denoise_batch across devices (stacks are
    # independent, so DP is exact — no collectives; same pattern as
    # TeacherPredictor.denoise_tiled). Spatial/model axes are refused:
    # the 3D-conv student is small enough that partitioning one stack's
    # compute never pays.
    mesh: Any = None

    def __post_init__(self):
        self._apply = jax.jit(self._forward)
        self._placed_params = None
        self._n_data = (1 if self.mesh is None
                        else _data_axis_size(self.mesh, "StudentPredictor"))

    def _forward(self, params, stack):
        if stack.dtype == jnp.uint8:
            # uint8 boundary, same contract as TeacherPredictor._forward:
            # f32 /255 first, then cast — the model input is bit-identical
            # to the float boundary in every serving dtype
            stack = (stack.astype(jnp.float32) / 255.0).astype(self.dtype)
        out = self.model.apply({"params": params}, stack)
        return _to_ubyte_device(out)

    def _ship(self, x: np.ndarray):
        if x.dtype == np.uint8:
            return jnp.asarray(x)
        return jnp.asarray(x.astype(np.float32), self.dtype)

    def __call__(self, stack: np.ndarray) -> np.ndarray:
        """stack: (F, H, W) float32 [0,1] or uint8. Returns (F, H, W)
        uint8. uint8 stacks ship 1 byte/px and convert in-jit."""
        f, h, w = stack.shape
        m = self.multiple_of
        ph, pw = _round_up(h, m) - h, _round_up(w, m) - w
        x = _pad_reflect_np(stack[None], ph, pw, axes=(2, 3))
        out = self._apply(self.params, self._ship(x))
        return np.asarray(out[0, :, :h, :w])

    def denoise_batch(self, stacks: np.ndarray) -> np.ndarray:
        """Throughput mode: (B, F, H, W) stacks in one dispatch. The 3D-conv
        student has no cross-image coupling, so batching is exact (and
        MXU-friendly: bench_suite measures 1934 frames/s at b32 vs ~7 stacks
        of dispatch overhead when served one-by-one)."""
        b, f, h, w = stacks.shape
        m = self.multiple_of
        ph, pw = _round_up(h, m) - h, _round_up(w, m) - w
        x = _pad_reflect_np(stacks, ph, pw, axes=(2, 3))
        if self._n_data > 1:
            from ..parallel.mesh import replicated

            if self._placed_params is None:
                self._placed_params = jax.device_put(
                    self.params, replicated(self.mesh))
            if b % self._n_data:  # pad to an even split, slice back below
                reps = self._n_data - b % self._n_data
                x = np.concatenate([x, np.repeat(x[-1:], reps, axis=0)])
            out = self._apply(self._placed_params,
                              _data_batch_put(self.mesh, x, self.dtype))
            return np.asarray(out[:b, :, :h, :w])
        out = self._apply(self.params, self._ship(x))
        return np.asarray(out[:, :, :h, :w])

    def load_stack(self, folder: str, start: int = 0) -> np.ndarray:
        """Load ``num_frames`` consecutive grayscale frames, resized to the
        first frame's size (KDLAE-S.ipynb cell 3 loader)."""
        files = list_images(folder)
        if len(files) < self.num_frames:
            raise ValueError(
                f"need {self.num_frames} frames, found {len(files)} in {folder}")
        seq = files[start:start + self.num_frames]
        frames = []
        target = None
        resized = False
        for p in seq:
            img = imread_gray(p)
            if target is None:
                target = (img.shape[1], img.shape[0])
            elif (img.shape[1], img.shape[0]) != target:
                img = resize_area(img, *target)
                resized = True
            frames.append(img)
        stack = np.stack(frames, axis=0)
        if not resized:
            # uniform-size sequence: the decoded floats are exact uint8/255,
            # so re-quantizing is lossless and the stack ships at 1 byte/px
            # (__call__ converts in-jit; resized frames stay float — their
            # INTER_AREA values are not uint8-exact)
            stack = np.rint(stack * 255.0).astype(np.uint8)
        return stack

    def denoise_folder(self, folder: str, start: int = 0) -> np.ndarray:
        return self(self.load_stack(folder, start))

    def denoise_all_frames(self, folder: str,
                           stack_batch: int = 18) -> np.ndarray:
        """Denoise EVERY frame in a folder: consecutive ``num_frames``
        stacks, with the tail stack overlapping backwards so the last
        ``len % num_frames`` frames are still covered (each frame's
        output comes from the FIRST stack containing it — deterministic,
        unlike the notebook's random single stack). Returns (N, H, W)
        uint8 in ``list_images`` order.

        Uniform-size folders decode once and run ``stack_batch`` stacks
        per dispatch through denoise_batch: the conv3d program carries a
        large batch-independent cost, so per-frame time falls ~4.6x from
        b32 to b128 frames/dispatch (artifacts/roofline_r5/roofline.json
        student sweep — 555 -> 119 us/frame at 7x256px; 18 stacks = 126
        frames rides that sweet spot). Mixed-size folders keep the
        per-stack path (load_stack resizes each stack to ITS first
        frame; batching would change those semantics)."""
        files = list_images(folder)
        n = len(files)
        if n < self.num_frames:
            raise ValueError(
                f"need {self.num_frames} frames, found {n} in {folder}")
        starts = []
        start = 0
        while start < n:
            s = min(start, n - self.num_frames)
            starts.append(s)
            start = s + self.num_frames
        imgs = [imread_gray(p) for p in files]
        if len({im.shape for im in imgs}) == 1 and stack_batch > 1:
            # uniform sizes: decoded floats are exact uint8/255, so the
            # re-quantization is lossless (same rule as load_stack) and
            # stacks ship 1 byte/px
            u8 = np.stack([np.rint(im * 255.0).astype(np.uint8)
                           for im in imgs])
            stacks = np.stack([u8[s:s + self.num_frames] for s in starts])
            outs = np.concatenate(
                [self.denoise_batch(stacks[b:b + stack_batch])
                 for b in range(0, len(stacks), stack_batch)])
            frames: dict[int, np.ndarray] = {}
            for k, s in enumerate(starts):
                for j in range(self.num_frames):
                    frames.setdefault(s + j, outs[k, j])
            return np.stack([frames[i] for i in range(n)])
        frames = {}
        for s in starts:
            out = self.denoise_folder(folder, start=s)
            for j in range(out.shape[0]):
                frames.setdefault(s + j, out[j])
        shape0 = frames[0].shape
        if any(f.shape != shape0 for f in frames.values()):
            # mixed-size folders: each stack resized to ITS first frame
            # (load_stack semantics) — normalize outputs to frame 0's size
            frames = {i: resize_area(f, shape0[1], shape0[0])
                      if f.shape != shape0 else f
                      for i, f in frames.items()}
        return np.stack([frames[i] for i in range(n)])


@dataclass
class ASDQEScorer:
    """Pairwise quality scorer (ASDQE_test.py infer loop).

    The fp32 path pins matmul precision to 'highest' so TPU fp32 matches
    the reference's CPU fp32 numerics (BASELINE.md's ASDQE-parity target —
    default TPU fp32 matmuls use bf16x3 passes otherwise).
    """

    variables: Any  # {'params': ..., 'batch_stats': ...}
    model: DenoiseRatePredictor = field(default_factory=DenoiseRatePredictor)
    dtype: Any = jnp.float32
    # Optional multi-chip serving: a mesh whose 'data' axis is > 1 shards
    # batched (B, H, W, 3) pairs across devices (pairs are independent —
    # BN runs in inference mode on frozen batch_stats, so DP is exact; no
    # collectives). Same pattern as the teacher/student predictors;
    # batches that don't divide the axis (incl. the reference protocol's
    # batch-1 streaming) pad to an even split and slice back.
    mesh: Any = None

    def __post_init__(self):
        self._apply = jax.jit(self._forward)
        self._placed_vars = None
        self._n_data = (1 if self.mesh is None
                        else _data_axis_size(self.mesh, "ASDQEScorer"))

    def _forward(self, variables, lq, gt):
        if lq.dtype == jnp.uint8:  # uint8 boundary (see TeacherPredictor)
            lq = (lq.astype(jnp.float32) / 255.0).astype(self.dtype)
        if gt.dtype == jnp.uint8:
            gt = (gt.astype(jnp.float32) / 255.0).astype(self.dtype)
        if self.dtype == jnp.float32:
            with jax.default_matmul_precision("highest"):
                return self.model.apply(variables, lq, gt)
        return self.model.apply(variables, lq, gt)

    def upload(self, lq: np.ndarray, gt: np.ndarray):
        """H2D of one pair (thread-safe; used by the score pipeline to
        prefetch pair k+1's upload under pair k's device compute)."""
        if lq.ndim == 3:
            lq, gt = lq[None], gt[None]
        if self._n_data > 1:
            # pad to an even split (repeat the last pair) so batch-1
            # streaming — the reference's scoring protocol — works on a
            # mesh; callers slice real scores back (`__call__` below;
            # the eval pipeline reads element 0 of each batch-1 handle)
            if lq.shape[0] % self._n_data:
                reps = self._n_data - lq.shape[0] % self._n_data
                lq = np.concatenate([lq, np.repeat(lq[-1:], reps, axis=0)])
                gt = np.concatenate([gt, np.repeat(gt[-1:], reps, axis=0)])
            return (_data_batch_put(self.mesh, lq, self.dtype),
                    _data_batch_put(self.mesh, gt, self.dtype))
        ship = lambda x: (jnp.asarray(x) if x.dtype == np.uint8  # noqa: E731
                          else jnp.asarray(x, self.dtype))
        return ship(lq), ship(gt)

    def dispatch(self, uploaded) -> jnp.ndarray:
        """Asynchronously score an ``upload``-ed pair; the returned device
        array resolves under np.asarray (the D2H fetch boundary)."""
        if self._n_data > 1:
            from ..parallel.mesh import replicated

            if self._placed_vars is None:
                self._placed_vars = jax.device_put(
                    self.variables, replicated(self.mesh))
            return self._apply(self._placed_vars, *uploaded)
        return self._apply(self.variables, *uploaded)

    def __call__(self, lq: np.ndarray, gt: np.ndarray) -> np.ndarray:
        """lq/gt: (H, W, 3) or (B, H, W, 3), float32 [0,1] or uint8
        (1 byte/px H2D, in-jit /255 — exact in fp32); returns (B,)."""
        b = 1 if lq.ndim == 3 else lq.shape[0]
        scores = np.asarray(self.dispatch(self.upload(lq, gt))).reshape(-1)
        return scores[:b]  # drop mesh even-split padding, if any

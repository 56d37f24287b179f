"""Host-side image I/O (cv2 with a PIL fallback).

Conventions follow the reference apps:
  * ``imread_rgb``: RGB float32 [0,1] HWC (KDLAE_T.ipynb cell 5 load path:
    cv2.IMREAD_UNCHANGED, drop alpha, BGR->RGB, /255).
  * ``imread_gray``: grayscale float32 [0,1] HW (KDLAE-S.ipynb cell 3).
  * ``to_ubyte``: skimage.img_as_ubyte equivalent for [0,1] floats.
"""

from __future__ import annotations

import os
from glob import glob

import numpy as np

try:
    import cv2

    cv2.setNumThreads(1)  # reference pins cv2 threads in workers (data_util.py:2)
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def list_images(folder: str) -> list[str]:
    files = [f for f in glob(os.path.join(folder, "*"))
             if f.lower().endswith(IMG_EXTS)]
    return sorted(files)


def imread_rgb(path: str) -> np.ndarray:
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise IOError(f"failed to read image: {path}")
        if img.ndim == 2:
            img = img[:, :, None]
        if img.shape[2] == 4:
            img = img[:, :, :3]
        if img.shape[2] == 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        elif img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
    else:  # pragma: no cover
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"))
    return img.astype(np.float32) / 255.0


def imread_rgb_ubyte(path: str) -> np.ndarray:
    """RGB uint8 HWC. The serving paths ship this straight to the device
    (TeacherPredictor converts in-jit with the identical /255 — the model
    sees the same float values as imread_rgb's, at a quarter of the H2D
    bytes; uint8 outputs agree to <=1 quantization level)."""
    img = imread_rgb(path)
    # imread_rgb is the decode source of truth (cv2/PIL fallbacks, alpha
    # and gray handling); the decoded data is exact uint8/255, so the
    # round-trip is lossless
    return np.rint(img * 255.0).astype(np.uint8)


def imread_gray(path: str) -> np.ndarray:
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise IOError(f"failed to read image: {path}")
        if img.ndim == 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    else:  # pragma: no cover
        from PIL import Image

        img = np.asarray(Image.open(path).convert("L"))
    return img.astype(np.float32) / 255.0


def imread_bgr(path: str) -> np.ndarray:
    """BGR float32 [0,1] HWC — the training datasets read BGR then flip to
    RGB at tensor time (imfrombytes + img2tensor(bgr2rgb=True))."""
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"failed to read image: {path}")
    else:  # pragma: no cover
        img = imread_rgb(path)[..., ::-1] * 255.0
    return img.astype(np.float32) / 255.0


def imfrombytes_bgr(buf: bytes) -> np.ndarray:
    """Decode encoded image bytes -> BGR float32 [0,1] HWC; the FileClient
    read path (img_util.imfrombytes, flag='color'). Bit-identical to
    imread_bgr on the same file's bytes."""
    if not _HAS_CV2:  # pragma: no cover
        raise ImportError("byte decoding needs cv2")
    img = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise IOError("failed to decode image bytes")
    return img.astype(np.float32) / 255.0


def imfrombytes_gray(buf: bytes) -> np.ndarray:
    """Decode encoded image bytes -> grayscale float32 [0,1] HW, matching
    imread_gray (IMREAD_UNCHANGED + BGR2GRAY on color input)."""
    if not _HAS_CV2:  # pragma: no cover
        raise ImportError("byte decoding needs cv2")
    img = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_UNCHANGED)
    if img is None:
        raise IOError("failed to decode image bytes")
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    return img.astype(np.float32) / 255.0


def resize_area(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """cv2.INTER_AREA resize (student stack loader resizes to frame 0)."""
    if _HAS_CV2:
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
    from PIL import Image  # pragma: no cover

    return np.asarray(
        Image.fromarray((img * 255).astype(np.uint8)).resize((w, h), Image.BOX)
    ).astype(np.float32) / 255.0


def to_ubyte(img: np.ndarray) -> np.ndarray:
    """skimage.img_as_ubyte for float [0,1] input: round-half-to-even."""
    return np.rint(np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)


def imwrite(path: str, img: np.ndarray, rgb: bool = True) -> None:
    """Write a uint8 (or [0,1] float) image; creates parent dirs."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if img.dtype != np.uint8:
        img = to_ubyte(img)
    if _HAS_CV2:
        out = img
        if img.ndim == 3 and img.shape[2] == 3 and rgb:
            out = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        if not cv2.imwrite(path, out):
            raise IOError(f"failed to write image: {path}")
    else:  # pragma: no cover
        from PIL import Image

        Image.fromarray(img).save(path)

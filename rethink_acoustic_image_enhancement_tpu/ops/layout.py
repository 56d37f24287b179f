"""NHWC layout ops: pixel (un)shuffle, pad-to-multiple, cropping.

The reference uses torch's NCHW ``PixelShuffle``/``PixelUnshuffle``
(reference: KDLAE/KDLAE_model.py:182-200) and reflect-padding to a size
multiple before whole-image eval (KDLAE/KDLAE_T.ipynb cell 5,
KDLAE/KDLAE-S.ipynb cell 3, ASDQE/ASDQE_model.py:113-121). Here everything
is NHWC (TPU-friendly: channels on the 128-lane minor axis); the channel
ordering of the (un)shuffle matches torch's exactly so converted weights
are numerically identical.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_unshuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """NHWC pixel-unshuffle, torch channel ordering.

    torch: out[n, c*r*r + i*r + j, h, w] = in[n, c, h*r + i, w*r + j]
    (reference Downsample: KDLAE/KDLAE_model.py:182-190).
    """
    b, h, w, c = x.shape
    assert h % r == 0 and w % r == 0, f"spatial dims {(h, w)} not divisible by {r}"
    x = x.reshape(b, h // r, r, w // r, r, c)
    # -> (b, H, W, c, i, j): channel index = c*r*r + i*r + j
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // r, w // r, c * r * r)


def pixel_shuffle(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """NHWC pixel-shuffle, torch channel ordering.

    torch: out[n, c, h*r + i, w*r + j] = in[n, c*r*r + i*r + j, h, w]
    (reference Upsample: KDLAE/KDLAE_model.py:192-200).
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    assert c * r * r == crr, f"channels {crr} not divisible by {r*r}"
    x = x.reshape(b, h, w, c, r, r)
    # want out[b, h*r+i, w*r+j, c] = x[b, h, w, c, i, j]
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


def pad_to_multiple(
    x: jnp.ndarray, multiple: int, mode: str = "reflect", axes: tuple[int, int] = (1, 2)
) -> tuple[jnp.ndarray, tuple[int, int]]:
    """Pad spatial axes up to the next multiple. Returns (padded, (ph, pw)).

    Matches the reference's eval-time padding (bottom/right pad):
    ASDQE/ASDQE_model.py:113-121 uses zero pad; the notebooks use reflect
    pad (KDLAE_T.ipynb cell 5). ``mode`` selects between them.
    """
    h, w = x.shape[axes[0]], x.shape[axes[1]]
    ph = (multiple - h % multiple) % multiple
    pw = (multiple - w % multiple) % multiple
    if ph == 0 and pw == 0:
        return x, (0, 0)
    pad = [(0, 0)] * x.ndim
    pad[axes[0]] = (0, ph)
    pad[axes[1]] = (0, pw)
    kw = {} if mode != "constant" else {"constant_values": 0}
    return jnp.pad(x, pad, mode=mode, **kw), (ph, pw)


def crop_to(x: jnp.ndarray, h: int, w: int, axes: tuple[int, int] = (1, 2)) -> jnp.ndarray:
    """Crop spatial axes back to (h, w) after padded inference."""
    sl = [slice(None)] * x.ndim
    sl[axes[0]] = slice(0, h)
    sl[axes[1]] = slice(0, w)
    return x[tuple(sl)]


def nchw_to_nhwc(x) -> jnp.ndarray:
    return jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))


def nhwc_to_nchw(x) -> jnp.ndarray:
    return jnp.transpose(jnp.asarray(x), (0, 3, 1, 2))

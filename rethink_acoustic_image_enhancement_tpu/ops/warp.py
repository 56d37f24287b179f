"""Optical-flow warping (the arch_util.flow_warp equivalent).

Reference: Train/basicsr/models/archs/arch_util.py flow_warp — bilinear
grid_sample of an image at positions (x + flow), align_corners=True,
zero padding outside. Implemented as a gather + lerp (jit/TPU friendly;
no scatter).
"""

from __future__ import annotations

import jax.numpy as jnp


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray,
              padding_mode: str = "zeros") -> jnp.ndarray:
    """Warp (B, H, W, C) by flow (B, H, W, 2) (dx, dy order, pixels).

    Output[b, i, j] = x[b, i + dy, j + dx] sampled bilinearly;
    out-of-range samples are 0 ('zeros') or edge-clamped ('border').
    """
    b, h, w, c = x.shape
    assert flow.shape == (b, h, w, 2), flow.shape
    grid_y = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    grid_x = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    sx = grid_x + flow[..., 0]
    sy = grid_y + flow[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        batch_idx = jnp.arange(b)[:, None, None]
        vals = x[batch_idx, yc, xc]  # (B, H, W, C)
        if padding_mode == "zeros":
            inside = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
            vals = vals * inside[..., None].astype(x.dtype)
        return vals

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy

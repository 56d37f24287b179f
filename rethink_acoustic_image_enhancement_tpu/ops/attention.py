"""MDTA ("transposed" channel attention) core.

Reference math (KDLAE/KDLAE_model.py:124-145): after a 1x1 qkv conv and a
3x3 depthwise conv, q/k/v are reshaped to (b, head, c, hw); q and k are
L2-normalized along the *pixel* axis; the attention matrix is the tiny
(c x c) per-head Gram matrix scaled by a learnable per-head temperature and
softmaxed over the key-channel dim; out = attn @ v. Complexity is linear in
pixels (C^2 * HW), never materializing an HW x HW matrix.

TPU formulation: keep tensors as (B, P, H, c) with P = H*W on the sublane
axis and channels minor; both contractions are large batched matmuls with
P as the contraction / free dimension -> MXU-friendly. The softmax operates
on a (heads, c, c) tensor, which is negligible.
"""

from __future__ import annotations

import jax.numpy as jnp

_L2_EPS = 1e-12  # torch F.normalize default eps (KDLAE_model.py:134-135)


def l2_normalize_pixels(x: jnp.ndarray) -> jnp.ndarray:
    """L2-normalize over the pixel axis (axis 1) of a (B, P, heads, c) tensor.

    Matches ``torch.nn.functional.normalize(x, dim=-1)`` on (b, head, c, p):
    x / max(||x||_2, eps).
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True))
    return x / jnp.maximum(norm, _L2_EPS)


def mdta_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    temperature: jnp.ndarray,
    num_heads: int,
) -> jnp.ndarray:
    """Transposed channel attention.

    Args:
      q, k, v: (B, H, W, C) NHWC tensors (C ordered head-major, matching the
        torch channel layout so converted weights line up).
      temperature: (heads, 1, 1) learnable scale (KDLAE_model.py:116,137).
      num_heads: number of heads; c = C // num_heads.

    Returns (B, H, W, C).
    """
    b, h, w, c_total = q.shape
    hd = num_heads
    c = c_total // hd
    p = h * w

    def split(t):
        return t.reshape(b, p, hd, c)

    qh, kh, vh = split(q), split(k), split(v)
    qh = l2_normalize_pixels(qh)
    kh = l2_normalize_pixels(kh)

    ctype = jnp.promote_types(q.dtype, jnp.float32)
    # (c x c) per-head Gram matrix, contracted over all pixels.
    attn = jnp.einsum("bphc,bphd->bhcd", qh, kh, preferred_element_type=ctype)
    attn = attn * temperature.reshape(1, hd, 1, 1).astype(ctype)
    attn = _softmax_lastdim(attn)
    out = jnp.einsum("bhcd,bphd->bphc", attn.astype(q.dtype), vh,
                     preferred_element_type=ctype).astype(q.dtype)
    return out.reshape(b, h, w, c_total)


def _softmax_lastdim(x: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)

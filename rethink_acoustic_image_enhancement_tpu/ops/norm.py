"""Channel LayerNorm over the NHWC channel axis.

The reference normalizes over the channel dim after a b,c,h,w -> b,(hw),c
reshape (KDLAE/KDLAE_model.py:32-83, to_3d/to_4d + {BiasFree,WithBias}
LayerNorm). In NHWC the channel axis is already minor, so this is a pure
per-pixel reduction over the 128-lane axis — no data movement at all.

Semantics replicated exactly:
  * biased variance (torch ``unbiased=False``)
  * eps = 1e-5 added *inside* the sqrt
  * BiasFree:  x / sqrt(var + eps) * weight          (no mean subtraction!)
  * WithBias: (x - mean) / sqrt(var + eps) * weight + bias
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def channel_layernorm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm over the last (channel) axis of an NHWC tensor.

    ``bias is None`` selects the BiasFree variant
    (reference KDLAE/KDLAE_model.py:38-52): variance is still computed
    around the mean, but the mean is NOT subtracted from the output.
    """
    ctype = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(ctype)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    if bias is None:
        y = xf * inv * weight
    else:
        y = (xf - mean) * inv * weight + bias
    return y.astype(x.dtype)

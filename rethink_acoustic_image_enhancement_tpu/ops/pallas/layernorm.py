"""Pallas TPU kernel: fused channel LayerNorm.

The XLA lowering of the NHWC channel LayerNorm materializes the fp32
promotion and the mean/var broadcasts through HBM (~3.4 ms for
512x512x96 bf16 on v5e vs a ~0.25 ms roofline). This kernel streams x
through VMEM once: load a (rows, C) tile, reduce along the lane axis in
fp32, scale, write — one read + one write of x total.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, bias_free: bool, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    w = w_ref[:].astype(jnp.float32)
    if bias_free:
        y = x * inv * w
    else:
        y = (x - mean) * inv * w + b_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bias_free", "eps", "interpret"))
def fused_channel_layernorm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    bias_free: bool = True,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (..., C) NHWC; same semantics as ops.norm.channel_layernorm."""
    orig_shape = x.shape
    c = orig_shape[-1]
    p = 1
    for d in orig_shape[:-1]:
        p *= d
    xf = x.reshape(p, c)

    row_tile = 1024
    while p % row_tile != 0:
        row_tile //= 2
    grid = (p // row_tile,)

    if bias is None:
        bias = jnp.zeros((c,), x.dtype)

    out = pl.pallas_call(
        functools.partial(_ln_kernel, bias_free=bias_free, eps=eps),
        out_shape=jax.ShapeDtypeStruct((p, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xf, weight, bias)
    return out.reshape(orig_shape)

"""Stock architecture helpers (port of
Train/basicsr/models/archs/arch_util.py — none used by the KDLAE path,
kept for framework parity): residual block without BN, layer stacking,
scaled init.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn


def scaled_lecun_init(scale: float = 0.1):
    """default_init_weights' residual-scaling trick (arch_util.py:19-41):
    smaller init for residual branches stabilizes deep stacks."""
    base = nn.initializers.lecun_normal()

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


class ResidualBlockNoBN(nn.Module):
    """conv-relu-conv + identity (arch_util.py ResidualBlockNoBN), with
    the 0.1-scaled second-conv init and optional res_scale."""

    num_feat: int = 64
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        y = nn.Conv(self.num_feat, (3, 3), padding=1, name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.num_feat, (3, 3), padding=1,
                    kernel_init=scaled_lecun_init(0.1), name="conv2")(y)
        return identity + y * self.res_scale


def make_layer(block: Callable[..., nn.Module], num_blocks: int,
               **kwargs) -> nn.Module:
    """Sequential stack factory (arch_util.py make_layer)."""

    class _Stack(nn.Module):
        @nn.compact
        def __call__(self, x, *args, **call_kwargs):
            for i in range(num_blocks):
                x = block(**kwargs, name=str(i))(x, *args, **call_kwargs)
            return x

    return _Stack()

"""KDLAE-S student: lightweight 3D-conv U-Net over temporal frame stacks.

Reference: KDLAE/KDLAE_model.py:340-430 (duplicate at
Train/basicsr/models/archs/restormer_arch.py:838-928). A stack of N
consecutive frames (B, N, H, W) is denoised jointly; the N frames become
the depth axis of 3D convolutions. Pooling / upsampling is spatial-only
(kernel (1,2,2)), the depth axis is preserved, and skip connections are
*additive* (not concat).

TPU layout: NDHWC with depth = frames. The (1,2,2)-kernel ConvTranspose3d
is implemented as a single einsum + block reshape (a "learned pixel
shuffle") instead of a scatter-style transposed conv — exactly equivalent
because kernel == stride (no overlap), and far friendlier to the MXU.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class ConvTranspose3dS2(nn.Module):
    """ConvTranspose3d with kernel=stride=(1,2,2): each input voxel emits a
    2x2 spatial block. out[b,d,2h+p,2w+q,o] = sum_i x[b,d,h,w,i]*K[p,q,i,o]."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_feat = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (2, 2, in_feat, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        b, d, h, w, _ = x.shape
        y = jnp.einsum("bdhwi,pqio->bdhpwqo", x, kernel)
        y = y.reshape(b, d, h * 2, w * 2, self.features)
        return y + bias


class ConvBlock3d(nn.Module):
    """[Conv3d 3^3 + ReLU] x 2 (reference _create_conv_block,
    KDLAE/KDLAE_model.py:386-393)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = (self.kernel_size,) * 3
        p = self.kernel_size // 2
        x = nn.Conv(self.features, k, padding=p, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, k, padding=p, name="conv2")(x)
        return nn.relu(x)


def _spatial_max_pool(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool3d(kernel=(1,2,2)) over NDHWC (KDLAE/KDLAE_model.py:366)."""
    return nn.max_pool(x, window_shape=(1, 2, 2), strides=(1, 2, 2))


class KDLAEStudent(nn.Module):
    """KDLAE-S (reference KDLAE/KDLAE_model.py:340-430).

    Input:  (B, N, H, W) frame stack, H and W multiples of 2**num_levels
            (the shipped config [16,32,64] -> 2 levels -> multiple of 4;
            the reference notebook pads to 32).
    Output: (B, N, H, W) denoised stack.
    """

    inp_channels: int = 1
    out_channels: int = 1
    residual: bool = False
    hidden_channels: Sequence[int] = (16, 32, 64)
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        num_levels = len(self.hidden_channels) - 1
        # (B, N, H, W) -> NDHWC with C = inp_channels (the reference
        # unsqueezes a channel dim at axis 1: KDLAE_model.py:397)
        x_in = x[..., None]

        current = x_in
        skips = []
        for i in range(num_levels):
            enc = ConvBlock3d(self.hidden_channels[i], self.kernel_size,
                              name=f"encoders_{i}")(current)
            skips.append(enc)
            current = _spatial_max_pool(enc)

        current = ConvBlock3d(self.hidden_channels[-1], self.kernel_size,
                              name="st_fusion")(current)

        for j, i in enumerate(range(num_levels - 1, -1, -1)):
            current = ConvTranspose3dS2(self.hidden_channels[i],
                                        name=f"upconv_{j}")(current)
            current = current + skips[num_levels - 1 - j]
            current = ConvBlock3d(self.hidden_channels[i], self.kernel_size,
                                  name=f"decoders_{j}")(current)

        out = nn.Conv(self.out_channels, (1, 1, 1), name="out_conv")(current)
        if self.residual:
            out = out + x_in
        return out[..., 0]

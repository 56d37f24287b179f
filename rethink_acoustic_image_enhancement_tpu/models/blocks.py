"""Core KDLAE building blocks as flax.linen modules (NHWC).

Each block reproduces the reference math exactly (citations inline) but is
laid out TPU-first: NHWC tensors, channel LayerNorm as a lane-axis
reduction, MDTA as two large batched matmuls, and all 1x1 convs as plain
channel contractions that XLA maps straight onto the MXU.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.nn import gelu

from ..ops.attention import mdta_attention
from ..ops.layout import pixel_shuffle, pixel_unshuffle
from ..ops.norm import channel_layernorm

Dtype = Any


class PointwiseConv(nn.Module):
    """1x1 conv as a channel einsum.

    Identical math and parameter tree to nn.Conv(features, (1,1))
    (kernel (1, 1, C, F)), lowered as a plain matmul on the NHWC minor
    axis. Measured on v5e: despite the profiler showing ~24 GB/step of
    layout "data formatting" around XLA's conv lowering, replacing the
    model's 1x1 convs with this einsum form made the full teacher SLOWER
    (203 vs 134 ms) — the conv layouts XLA picks are part of a globally
    faster assignment. Production blocks therefore use nn.Conv; this is
    an opt-in building block (same story as DepthwiseConv3x3 and the
    Pallas GDFN kernel).
    """

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features))
        y = jnp.einsum("...c,cf->...f", x, kernel[0, 0])
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class ChannelLayerNorm(nn.Module):
    """LayerNorm over NHWC channels (reference KDLAE/KDLAE_model.py:32-83)."""

    dim: int
    bias_free: bool = False  # 'BiasFree' vs 'WithBias' LayerNorm_type

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        bias = None
        if not self.bias_free:
            bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return channel_layernorm(x, weight, bias)


class DepthwiseConv3x3(nn.Module):
    """3x3 depthwise conv as nine shifted multiply-adds.

    Parameter tree identical to nn.Conv(feature_group_count=C):
    kernel (3, 3, 1, C). Measured on v5e: 32% faster than XLA's
    depthwise-conv op in ISOLATION (5.1 vs 7.5 ms @512^2x288) but 2.3x
    SLOWER inside the full teacher (303 vs 134 ms end-to-end — XLA
    materializes the shifted temporaries when the surrounding graph is
    large). Kept as an opt-in building block; the production blocks use
    nn.Conv. Same isolated-vs-in-model inversion as the Pallas GDFN
    kernel — see ops/pallas/gdfn.py::worthwhile.
    """

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 1, self.features))
        h, w = x.shape[1], x.shape[2]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for di in range(3):
            for dj in range(3):
                t = xp[:, di:di + h, dj:dj + w, :] * kernel[di, dj, 0]
                acc = t if acc is None else acc + t
        if self.use_bias:
            acc = acc + self.param("bias", nn.initializers.zeros,
                                   (self.features,))
        return acc


class GDFN(nn.Module):
    """Gated-Dconv feed-forward network (KDLAE/KDLAE_model.py:89-106).

    1x1 conv -> 2*hidden, 3x3 depthwise, split, gelu(x1)*x2, 1x1 conv back.
    torch uses exact (erf) GELU, so ``approximate=False``.
    """

    dim: int
    expansion_factor: float = 2.66
    use_bias: bool = False
    dwconv_shift: bool = False  # shift-add depthwise (see TransformerBlock)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = int(self.dim * self.expansion_factor)
        x = nn.Conv(hidden * 2, (1, 1), use_bias=self.use_bias, name="project_in")(x)
        if self.dwconv_shift:
            x = DepthwiseConv3x3(hidden * 2, self.use_bias, name="dwconv")(x)
        else:
            x = nn.Conv(
                hidden * 2, (3, 3), padding=1, feature_group_count=hidden * 2,
                use_bias=self.use_bias, name="dwconv",
            )(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = gelu(x1, approximate=False) * x2
        return nn.Conv(self.dim, (1, 1), use_bias=self.use_bias, name="project_out")(x)


class MDTA(nn.Module):
    """Multi-DConv-head transposed attention (KDLAE/KDLAE_model.py:112-145)."""

    dim: int
    num_heads: int
    use_bias: bool = False
    dwconv_shift: bool = False  # shift-add depthwise (see TransformerBlock)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        temperature = self.param(
            "temperature", nn.initializers.ones, (self.num_heads, 1, 1)
        )
        qkv = nn.Conv(self.dim * 3, (1, 1), use_bias=self.use_bias, name="qkv")(x)
        if self.dwconv_shift:
            qkv = DepthwiseConv3x3(self.dim * 3, self.use_bias,
                                   name="qkv_dwconv")(qkv)
        else:
            qkv = nn.Conv(
                self.dim * 3, (3, 3), padding=1, feature_group_count=self.dim * 3,
                use_bias=self.use_bias, name="qkv_dwconv",
            )(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = mdta_attention(q, k, v, temperature, self.num_heads)
        return nn.Conv(self.dim, (1, 1), use_bias=self.use_bias, name="project_out")(out)


class TransformerBlock(nn.Module):
    """Pre-norm residual LN->MDTA, LN->GDFN (KDLAE/KDLAE_model.py:150-163).

    ``fused=True`` routes the LN2->GDFN->residual branch through the Pallas
    TPU kernel (ops/pallas/gdfn.py) — same parameters, bf16 MXU internals;
    intended for the serving path (inference predictors / bench). Falls
    back to the XLA composition when the spatial shape can't be tiled.
    """

    dim: int
    num_heads: int
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    bias_free_ln: bool = False
    fused: bool = False
    # Route BOTH depthwise convs through DepthwiseConv3x3 (nine shifted
    # multiply-adds, identical parameter tree). Required for tensor-parallel
    # TRAINING: XLA SPMD (jax 0.9) silently produces 4x-scaled gradients for
    # grouped-conv kernels on a mesh with a 'model' axis (which leaves break
    # depends on the global partitioning strategy — measured in
    # tests/test_parallel.py); the shift-add form is elementwise ops whose
    # grads partition exactly.
    dwconv_shift: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        norm1 = ChannelLayerNorm(self.dim, self.bias_free_ln, name="norm1")
        attn = MDTA(self.dim, self.num_heads, self.use_bias,
                    dwconv_shift=self.dwconv_shift, name="attn")
        norm2 = ChannelLayerNorm(self.dim, self.bias_free_ln, name="norm2")
        ffn = GDFN(self.dim, self.ffn_expansion_factor, self.use_bias,
                   dwconv_shift=self.dwconv_shift, name="ffn")

        use_mega = self.fused and not self.is_initializing()
        if use_mega:
            from ..ops.pallas.block import mega_worthwhile

            use_mega = mega_worthwhile(
                x.shape[0], x.shape[1], x.shape[2], self.dim,
                self.num_heads, self.bias_free_ln, self.use_bias,
                self.ffn_expansion_factor)
        if use_mega:
            # whole-block Pallas megakernel; identical parameter tree —
            # the kernel consumes the submodule weights directly
            from ..ops.pallas.block import fused_transformer_block

            p = self.variables["params"]
            return fused_transformer_block(
                x,
                p["norm1"]["weight"], p["norm1"].get("bias"),
                p["attn"]["qkv"]["kernel"], p["attn"]["qkv_dwconv"]["kernel"],
                p["attn"]["temperature"], p["attn"]["project_out"]["kernel"],
                p["norm2"]["weight"], p["norm2"].get("bias"),
                p["ffn"]["project_in"]["kernel"], p["ffn"]["dwconv"]["kernel"],
                p["ffn"]["project_out"]["kernel"],
                bias_free=self.bias_free_ln, num_heads=self.num_heads)

        x = x + attn(norm1(x))
        return x + ffn(norm2(x))


class OverlapPatchEmbed(nn.Module):
    """3x3 conv patch embed (KDLAE/KDLAE_model.py:169-178)."""

    embed_dim: int = 48
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.embed_dim, (3, 3), padding=1, use_bias=self.use_bias,
                       name="proj")(x)


class Downsample(nn.Module):
    """3x3 conv C->C/2 then PixelUnshuffle(2): net C->2C, H/2
    (KDLAE/KDLAE_model.py:182-190).

    ``fused=True`` folds the unshuffle into the conv itself: a stride-2
    4x4 conv whose kernel embeds the 3x3 weights at the four spatial
    phases. Mathematically identical taps (the same zero padding the
    stride-1 conv saw), same parameter tree (``conv/kernel``), but the
    intermediate HxWx(C/2) tensor and its pixel-unshuffle data-formatting
    pass never materialize in HBM. Opt-in pending an on-chip end-to-end
    win (see docs/perf_plan.md: every previous local rewrite lost to
    XLA's global layout assignment).
    """

    n_feat: int
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = nn.Conv(self.n_feat // 2, (3, 3), padding=1, use_bias=False,
                       name="conv")
        if not self.fused or self.is_initializing():
            return pixel_unshuffle(conv(x), 2)
        w3 = self.variables["params"]["conv"]["kernel"]  # (3, 3, C, C//2)
        c = x.shape[-1]
        f = self.n_feat // 2
        # w4[ky, kx, c, f, i, j] = w3[ky-i, kx-j, c, f]; out channel f*4+i*2+j
        # matches pixel_unshuffle's torch channel order.
        w4 = jnp.zeros((4, 4, c, f, 2, 2), w3.dtype)
        for i in (0, 1):
            for j in (0, 1):
                w4 = w4.at[i:i + 3, j:j + 3, :, :, i, j].set(w3)
        w4 = w4.reshape(4, 4, c, f * 4).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            x, w4, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class Upsample(nn.Module):
    """3x3 conv C->2C then PixelShuffle(2): net C->C/2, 2H
    (KDLAE/KDLAE_model.py:192-200).

    ``fused=True`` folds the shuffle into the conv: the sub-pixel conv is
    rewritten as one input-dilated (fractionally-strided) 6x6 conv whose
    kernel scatters the 3x3 weights by output phase — the standard
    sub-pixel-conv == transposed-conv identity. Same taps, same parameter
    tree; the low-res HxWx2C intermediate and the pixel-shuffle pass are
    never written to HBM. Opt-in (see Downsample.fused).
    """

    n_feat: int
    fused: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = nn.Conv(self.n_feat * 2, (3, 3), padding=1, use_bias=False,
                       name="conv")
        if not self.fused or self.is_initializing():
            return pixel_shuffle(conv(x), 2)
        w3 = self.variables["params"]["conv"]["kernel"]  # (3, 3, C, 2C)
        c = x.shape[-1]
        f = self.n_feat // 2
        w3r = w3.reshape(3, 3, c, f, 2, 2)  # [dy, dx, c, f, i, j]
        # out[2h+i, 2w+j, f] = sum_{dy,dx,c} x[h+dy-1, w+dx-1, c]
        #                      * w3[dy, dx, c, f*4+i*2+j]
        # As an lhs-dilated conv (dilate 2, pad 3, kernel 6), the tap index
        # is t = 2*d - phase + 1; entries at the wrong parity only ever
        # multiply dilation zeros.
        w6 = jnp.zeros((6, 6, c, f), w3.dtype)
        for dy in range(3):
            for i in (0, 1):
                for dx in range(3):
                    for j in (0, 1):
                        w6 = w6.at[2 * dy - i + 1, 2 * dx - j + 1].set(
                            w3r[dy, dx, :, :, i, j])
        return jax.lax.conv_general_dilated(
            x, w6.astype(x.dtype), window_strides=(1, 1),
            padding=((3, 3), (3, 3)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

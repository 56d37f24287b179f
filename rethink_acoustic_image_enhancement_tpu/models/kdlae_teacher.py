"""KDLAE-T teacher: 4-level conv-attention U-Net with denoise-rate
conditioning and a 2x super-resolution auxiliary head.

Re-designed NHWC/TPU-first from the reference architecture
(KDLAE/KDLAE_model.py:204-336; training-half duplicate
Train/basicsr/models/archs/restormer_arch.py:702-834). Module names mirror
the torch attribute names so the weight converter is a mechanical mapping.

Differences from the reference (deliberate fixes, not behavior changes):
  * one implementation shared by inference and training (the reference
    duplicates the model byte-for-byte across KDLAE/ and Train/).
  * ``params`` in {'cat', 'none'}: the reference ctor advertises
    'plus'/'mul' but its forward only implements 'cat'
    (KDLAE/KDLAE_model.py:217,315-319) — we fail fast instead.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    Downsample,
    OverlapPatchEmbed,
    TransformerBlock,
    Upsample,
)


class TransformerStage(nn.Module):
    """A sequence of TransformerBlocks (torch nn.Sequential equivalent)."""

    dim: int
    num_heads: int
    num_blocks: int
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    bias_free_ln: bool = False
    fused: bool = False
    dwconv_shift: bool = False  # see TransformerBlock.dwconv_shift

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        use_stage = self.fused and not self.is_initializing()
        if use_stage:
            from ..ops.pallas.stage import stage_worthwhile

            use_stage = stage_worthwhile(
                x.shape[0], x.shape[1], x.shape[2], self.dim,
                self.num_heads, self.bias_free_ln, self.use_bias,
                self.ffn_expansion_factor)
        if use_stage:
            # the whole stage in ONE pallas call (see ops/pallas/stage.py):
            # one layout transition in/out instead of per block
            from ..ops.pallas.stage import (
                fused_transformer_stage,
                stack_block_params,
            )

            # declare the blocks so the param tree is identical, but run
            # the stacked kernel on their weights
            for i in range(self.num_blocks):
                TransformerBlock(
                    dim=self.dim, num_heads=self.num_heads,
                    ffn_expansion_factor=self.ffn_expansion_factor,
                    use_bias=self.use_bias, bias_free_ln=self.bias_free_ln,
                    fused=False, name=str(i))
            p = self.variables["params"]
            stacked = stack_block_params([p[str(i)]
                                          for i in range(self.num_blocks)])
            return fused_transformer_stage(x, **stacked)

        for i in range(self.num_blocks):
            x = TransformerBlock(
                dim=self.dim,
                num_heads=self.num_heads,
                ffn_expansion_factor=self.ffn_expansion_factor,
                use_bias=self.use_bias,
                bias_free_ln=self.bias_free_ln,
                fused=False,  # stage-level fusion supersedes per-block
                dwconv_shift=self.dwconv_shift,
                name=str(i),
            )(x)
        return x


class KDLAETeacher(nn.Module):
    """KDLAE-T (reference KDLAE/KDLAE_model.py:204-336).

    Input:  {'img': (B, H, W, C) in [0,1], 'denoise_rate': (B, H, W, 1)}
    Output: {'hq': (B, H, W, C), 'sr': (B, 2H, 2W, C) or None}

    H and W must be multiples of 8 (three Downsample levels); use
    ``ops.layout.pad_to_multiple(x, 8)`` first, as the reference notebooks do.
    """

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    layernorm_type: str = "WithBias"  # or 'BiasFree'
    dual_pixel_task: bool = False
    static: str = "train"  # 'train' enables the 2x SR branch
    params: str = "cat"  # 'cat' (denoise-rate conditioning) or 'none'
    fused: bool = False  # Pallas LN+GDFN kernels (serving path)
    fused_resample: bool = False  # fold pixel-(un)shuffle into the convs
    dwconv_shift: bool = False  # see TransformerBlock.dwconv_shift

    def setup(self):
        if self.params not in ("cat", "none"):
            raise ValueError(
                f"params={self.params!r} unsupported: the reference only "
                "implements 'cat' (KDLAE/KDLAE_model.py:315)"
            )
        bf = self.layernorm_type == "BiasFree"
        d = self.dim
        ff = self.ffn_expansion_factor
        b = self.use_bias

        def stage(dim, heads, blocks):
            return TransformerStage(
                dim=dim, num_heads=heads, num_blocks=blocks,
                ffn_expansion_factor=ff, use_bias=b, bias_free_ln=bf,
                fused=self.fused, dwconv_shift=self.dwconv_shift,
            )

        fr = self.fused_resample
        self.patch_embed = OverlapPatchEmbed(d, b)
        self.encoder_level1 = stage(d, self.heads[0], self.num_blocks[0])
        self.down1_2 = Downsample(d, fused=fr)
        self.encoder_level2 = stage(d * 2, self.heads[1], self.num_blocks[1])
        self.down2_3 = Downsample(d * 2, fused=fr)
        self.encoder_level3 = stage(d * 4, self.heads[2], self.num_blocks[2])
        self.down3_4 = Downsample(d * 4, fused=fr)
        self.latent = stage(d * 8, self.heads[3], self.num_blocks[3])

        self.up4_3 = Upsample(d * 8, fused=fr)
        self.reduce_chan_level3 = nn.Conv(d * 4, (1, 1), use_bias=b)
        self.decoder_level3 = stage(d * 4, self.heads[2], self.num_blocks[2])
        self.up3_2 = Upsample(d * 4, fused=fr)
        self.reduce_chan_level2 = nn.Conv(d * 2, (1, 1), use_bias=b)
        self.decoder_level2 = stage(d * 2, self.heads[1], self.num_blocks[1])
        self.up2_1 = Upsample(d * 2, fused=fr)
        # level-1 decoder runs at 2*dim: skip concat, no channel reduce
        self.decoder_level1 = stage(d * 2, self.heads[0], self.num_blocks[0])
        self.refinement = stage(d * 2, self.heads[0], self.num_refinement_blocks)

        if self.dual_pixel_task:
            self.skip_conv = nn.Conv(d * 2, (1, 1), use_bias=b)

        self.output = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=b)
        if self.params == "cat":
            # dilated 3x3 conv over (out + denoise_rate) channels
            # (KDLAE/KDLAE_model.py:259)
            self.output_param = nn.Conv(
                d * 2, (3, 3), padding=2, kernel_dilation=2, use_bias=b
            )
            self.refinement_out = stage(d * 2, self.heads[0], self.num_refinement_blocks)
            self.output2 = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=b)

        if self.static == "train":
            hc = d * 2
            self.cen = nn.Conv(hc, (3, 3), padding=1, use_bias=b)
            self.upen = Upsample(hc, fused=fr)
            self.enhance = stage(hc // 2, self.heads[0], self.num_refinement_blocks)
            self.outputen = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=b)

    def __call__(self, inputs: dict) -> dict:
        inp_img = inputs["img"]

        x1 = self.patch_embed(inp_img)
        e1 = self.encoder_level1(x1)
        e2 = self.encoder_level2(self.down1_2(e1))
        e3 = self.encoder_level3(self.down2_3(e2))
        latent = self.latent(self.down3_4(e3))

        d3 = self.up4_3(latent)
        d3 = self.reduce_chan_level3(jnp.concatenate([d3, e3], axis=-1))
        d3 = self.decoder_level3(d3)
        d2 = self.up3_2(d3)
        d2 = self.reduce_chan_level2(jnp.concatenate([d2, e2], axis=-1))
        d2 = self.decoder_level2(d2)
        d1 = self.up2_1(d2)
        d1 = self.decoder_level1(jnp.concatenate([d1, e1], axis=-1))
        d1 = self.refinement(d1)

        if self.dual_pixel_task:
            d1 = d1 + self.skip_conv(x1)
            out_hq = self.output(d1)
        else:
            out = self.output(d1)
            if self.params == "cat":
                denoise_rate = inputs["denoise_rate"]
                out = jnp.concatenate([out, denoise_rate], axis=-1)
                out = self.output_param(out)
                out = self.refinement_out(out)
                out = self.output2(out)
            out_hq = out + inp_img

        out_sr = None
        if self.static == "train":
            sr = self.cen(out_hq)
            sr = self.upen(sr)
            sr = self.enhance(sr)
            out_sr = self.outputen(sr)

        return {"hq": out_hq, "sr": out_sr}


class Restormer(nn.Module):
    """Vanilla Restormer baseline (Train/.../restormer_arch.py:471-562):
    plain tensor in/out, global residual, no conditioning / SR branch."""

    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement_blocks: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    ffn_expansion_factor: float = 2.66
    use_bias: bool = False
    layernorm_type: str = "WithBias"
    dual_pixel_task: bool = False
    fused_resample: bool = False  # fold pixel-(un)shuffle into the convs
    dwconv_shift: bool = False  # see TransformerBlock.dwconv_shift

    @nn.compact
    def __call__(self, inp_img: jnp.ndarray) -> jnp.ndarray:
        bf = self.layernorm_type == "BiasFree"
        d, ff, b = self.dim, self.ffn_expansion_factor, self.use_bias
        fr = self.fused_resample

        def stage(dim, heads, blocks, name):
            return TransformerStage(
                dim=dim, num_heads=heads, num_blocks=blocks,
                ffn_expansion_factor=ff, use_bias=b, bias_free_ln=bf,
                dwconv_shift=self.dwconv_shift, name=name,
            )

        x1 = OverlapPatchEmbed(d, b, name="patch_embed")(inp_img)
        e1 = stage(d, self.heads[0], self.num_blocks[0], "encoder_level1")(x1)
        e2 = stage(d * 2, self.heads[1], self.num_blocks[1], "encoder_level2")(
            Downsample(d, fused=fr, name="down1_2")(e1))
        e3 = stage(d * 4, self.heads[2], self.num_blocks[2], "encoder_level3")(
            Downsample(d * 2, fused=fr, name="down2_3")(e2))
        latent = stage(d * 8, self.heads[3], self.num_blocks[3], "latent")(
            Downsample(d * 4, fused=fr, name="down3_4")(e3))

        d3 = Upsample(d * 8, fused=fr, name="up4_3")(latent)
        d3 = nn.Conv(d * 4, (1, 1), use_bias=b, name="reduce_chan_level3")(
            jnp.concatenate([d3, e3], axis=-1))
        d3 = stage(d * 4, self.heads[2], self.num_blocks[2], "decoder_level3")(d3)
        d2 = Upsample(d * 4, fused=fr, name="up3_2")(d3)
        d2 = nn.Conv(d * 2, (1, 1), use_bias=b, name="reduce_chan_level2")(
            jnp.concatenate([d2, e2], axis=-1))
        d2 = stage(d * 2, self.heads[1], self.num_blocks[1], "decoder_level2")(d2)
        d1 = Upsample(d * 2, fused=fr, name="up2_1")(d2)
        d1 = stage(d * 2, self.heads[0], self.num_blocks[0], "decoder_level1")(
            jnp.concatenate([d1, e1], axis=-1))
        d1 = stage(d * 2, self.heads[0], self.num_refinement_blocks, "refinement")(d1)

        if self.dual_pixel_task:
            d1 = d1 + nn.Conv(d * 2, (1, 1), use_bias=b, name="skip_conv")(x1)
            return nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=b,
                           name="output")(d1)
        return nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=b,
                       name="output")(d1) + inp_img


# The pre-rename class used by configs 02-06 (restormer_arch.py:566-698) is
# mathematically identical to KDLAE_teacher; expose it as an alias.
RestormerSuperResolutionParam2 = KDLAETeacher

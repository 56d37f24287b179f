"""Per-frame temporal/positional embedding modules.

Ports of the training-half's defined-but-unreferenced embedding blocks
(Train/basicsr/models/archs/restormer_arch.py:167-364 —
OverlapPatchTimePoseEmbed / ...WD / BasicSpy / WDSpybottle). No shipped
config uses them (SURVEY.md §2.1), but they document the temporal-encoding
direction the student experiments explored; kept for capability parity
and future multi-frame variants.

NHWC formulation: the per-channel 5x5 embed becomes ONE grouped conv over
all frames (each frame shares the torch version's single-channel 'proj'
weights), and the per-frame sinusoidal position/time encodings are learned
parameters initialized exactly like the reference and added per frame.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.resize import resize_bilinear_align_corners


def sinusoidal_position_encoding(h: int, w: int, embed_dim: int,
                                 variant: str = "default") -> np.ndarray:
    """2-D sinusoidal position map (restormer_arch.py:189-198 / 313-321).
    Returns (h, w, embed_dim)."""
    pos = np.zeros((h, w, embed_dim), np.float32)
    ys = np.linspace(0, h - 1, h)[:, None]
    xs = np.linspace(0, w - 1, w)[None, :]
    for i in range(embed_dim):
        if variant == "default":
            div1 = 1000 ** (2 * (i // 2) / embed_dim)
            div2 = 10 ** (2 * (i // 2 + 1) / embed_dim)
            if i % 2 == 0:
                pos[..., i] = 0.5 * (np.sin(ys / div1) + np.sin(xs / div2))
            else:
                pos[..., i] = 0.5 * (np.cos(ys / div2) + np.cos(xs / div1))
        else:  # 'wd' variant: shared div, no 0.5 scale
            div = 100 ** (2 * (i // 2) / embed_dim)
            if i % 2 == 0:
                pos[..., i] = np.sin(ys / div) + np.sin(xs / div)
            else:
                pos[..., i] = np.cos(ys / div) + np.cos(xs / div)
    return pos


def sinusoidal_time_encoding(seq_pos: int, embed_dim: int,
                             scale: float = 1.0) -> np.ndarray:
    """Per-frame time code (restormer_arch.py:201-210). Returns (embed_dim,)."""
    t = np.zeros((embed_dim,), np.float32)
    for i in range(embed_dim):
        div = 100 ** (2 * (i // 2) / embed_dim)
        t[i] = (np.sin((seq_pos - 1) / div) if i % 2 == 0
                else np.cos((seq_pos - 1) / div)) * scale
    return t


class OverlapPatchTimePoseEmbed(nn.Module):
    """Frame stack (B, H, W, F) -> (B, H, W, out_dim): each frame gets a
    shared 5x5 single-channel embed + its own learned (sinusoidal-init)
    position map and time code, then a 3x3 reconstruct merges frames."""

    in_frames: int = 3
    embed_dim: int = 48
    out_dim: int = 48
    use_bias: bool = False
    base_size: Sequence[int] = (128, 128)
    variant: str = "default"  # 'default' or 'wd'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, f = x.shape
        assert f == self.in_frames
        time_scale = 2.0 if self.variant == "wd" else 1.0

        pos_embeds = [
            self.param(f"pos_embed_{i}",
                       lambda *_: jnp.asarray(sinusoidal_position_encoding(
                           self.base_size[0], self.base_size[1],
                           self.embed_dim, self.variant)))
            for i in range(f)
        ]
        time_embeds = [
            self.param(f"time_embed_{i}",
                       lambda *_, i=i: jnp.asarray(sinusoidal_time_encoding(
                           1 + i, self.embed_dim, time_scale)))
            for i in range(f)
        ]

        # shared single-channel 5x5 embed applied per frame: a grouped conv
        # over the frame axis with tied weights
        proj = nn.Conv(self.embed_dim, (5, 5), padding=2,
                       use_bias=self.use_bias, name="proj")
        chunks = []
        for i in range(f):
            emb = proj(x[..., i:i + 1])  # (B, H, W, E)
            pos = resize_bilinear_align_corners(
                pos_embeds[i][None], h, w)[0] if (h, w) != tuple(
                    self.base_size) else pos_embeds[i]
            emb = emb + pos + time_embeds[i]
            chunks.append(emb)
        merged = jnp.concatenate(chunks, axis=-1)
        return nn.Conv(self.out_dim, (3, 3), padding=1,
                       use_bias=self.use_bias, name="reconstruct")(merged)


class BasicSpy(nn.Module):
    """Conv(7)->BN->ReLU x4 stack with input concat + 1x1 reconstruct
    (restormer_arch.py:247-269)."""

    out_c: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = x
        for i, ch in enumerate([32, 64, 32, self.out_c]):
            y = nn.Conv(ch, (7, 7), padding=3, name=f"conv{i}")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(y)
            y = nn.relu(y)
        combined = jnp.concatenate([x, y], axis=-1)
        return nn.Conv(self.out_c, (1, 1), name="reconstruct")(combined)


class WDSpybottle(nn.Module):
    """Three chained BasicSpy blocks (restormer_arch.py:271-282)."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = BasicSpy(self.in_dim, name="netBasic1")(x, train)
        x = BasicSpy(self.in_dim, name="netBasic2")(x, train)
        return BasicSpy(self.out_dim, name="netBasic3")(x, train)

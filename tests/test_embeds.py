"""Temporal/positional embed modules (inventory parity; unused by shipped
configs in both codebases)."""

import numpy as np

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.models.embeds import (
    BasicSpy,
    OverlapPatchTimePoseEmbed,
    WDSpybottle,
    sinusoidal_position_encoding,
    sinusoidal_time_encoding,
)


def test_sinusoidal_encodings_match_reference_formulas():
    import torch

    # reference formulas (restormer_arch.py:189-210) recomputed directly
    h, w, e = 8, 10, 6
    ours = sinusoidal_position_encoding(h, w, e)
    ref = np.zeros((e, h, w), np.float32)
    for i in range(e):
        d1 = 1000 ** (2 * (i // 2) / e)
        d2 = 10 ** (2 * (i // 2 + 1) / e)
        ys = torch.linspace(0, h - 1, h).unsqueeze(1)
        xs = torch.linspace(0, w - 1, w).unsqueeze(0)
        if i % 2 == 0:
            ref[i] = ((torch.sin(ys / d1) + torch.sin(xs / d2)) * 0.5).numpy()
        else:
            ref[i] = ((torch.cos(ys / d2) + torch.cos(xs / d1)) * 0.5).numpy()
    np.testing.assert_allclose(ours.transpose(2, 0, 1), ref, atol=1e-6)

    t = sinusoidal_time_encoding(3, 6)
    for i in range(6):
        d = 100 ** (2 * (i // 2) / 6)
        expected = np.sin(2 / d) if i % 2 == 0 else np.cos(2 / d)
        assert abs(t[i] - expected) < 1e-6


def test_time_pose_embed_shapes():
    m = OverlapPatchTimePoseEmbed(in_frames=3, embed_dim=8, out_dim=16,
                                  base_size=(16, 16))
    x = jnp.asarray(np.random.default_rng(0).random((2, 24, 20, 3)),
                    jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (2, 24, 20, 16)
    # per-frame learned encodings exist
    assert "pos_embed_0" in params and "time_embed_2" in params


def test_spy_blocks():
    x = jnp.asarray(np.random.default_rng(1).random((1, 16, 16, 4)),
                    jnp.float32)
    spy = BasicSpy(out_c=8)
    v = spy.init(jax.random.PRNGKey(0), x)
    out = spy.apply(v, x)
    assert out.shape == (1, 16, 16, 8)

    wd = WDSpybottle(in_dim=4, out_dim=6)
    v2 = wd.init(jax.random.PRNGKey(1), x)
    out2 = wd.apply(v2, x)
    assert out2.shape == (1, 16, 16, 6)

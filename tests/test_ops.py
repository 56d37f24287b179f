"""Unit tests for NHWC ops: pixel (un)shuffle vs torch, align-corners
resize vs torch, corruption mask statistics and semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rethink_acoustic_image_enhancement_tpu.ops.layout import (
    crop_to,
    pad_to_multiple,
    pixel_shuffle,
    pixel_unshuffle,
)
from rethink_acoustic_image_enhancement_tpu.ops.mask import (
    frame_interpolation_corrupt,
    input_mask,
    input_mask_np,
)
from rethink_acoustic_image_enhancement_tpu.ops.resize import (
    resize_bilinear_align_corners,
)


def _rand(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_pixel_unshuffle_matches_torch():
    torch = pytest.importorskip("torch")
    x = _rand((2, 6, 8, 12))  # NCHW for torch
    expected = torch.nn.functional.pixel_unshuffle(torch.from_numpy(x), 2).numpy()
    got = pixel_unshuffle(jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), 2)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), expected)


def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip("torch")
    x = _rand((2, 8, 5, 7), seed=1)
    expected = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    got = pixel_shuffle(jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), 2)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)), expected)


def test_pixel_shuffle_roundtrip():
    x = jnp.asarray(_rand((1, 4, 6, 8), seed=2))
    assert jnp.allclose(pixel_shuffle(pixel_unshuffle(x, 2), 2), x)


def test_pad_crop_roundtrip():
    x = jnp.asarray(_rand((1, 13, 21, 3), seed=3))
    padded, (ph, pw) = pad_to_multiple(x, 8)
    assert padded.shape[1] % 8 == 0 and padded.shape[2] % 8 == 0
    assert (ph, pw) == (3, 3)
    np.testing.assert_array_equal(crop_to(padded, 13, 21), x)


def test_resize_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    x = _rand((2, 5, 9, 11), seed=4)  # NCHW
    expected = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=2, mode="bilinear",
        align_corners=True).numpy()
    got = resize_bilinear_align_corners(
        jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), 18, 22)
    np.testing.assert_allclose(np.transpose(np.asarray(got), (0, 3, 1, 2)),
                               expected, rtol=2e-4, atol=5e-6)


def test_input_mask_semantics():
    """Kept pixels unchanged; dropped pixels become exactly -value
    (reference paired_image_dataset.py:19-36)."""
    img = jnp.full((64, 64), 0.7, jnp.float32)
    out = np.asarray(input_mask(img, jax.random.PRNGKey(0), prob=0.5, value=0.1))
    dropped = np.isclose(out, -0.1, atol=1e-6)
    kept = np.isclose(out, 0.7, atol=1e-6)
    assert np.all(dropped | kept)
    assert 0.4 < dropped.mean() < 0.6

    out_np = input_mask_np(np.full((64, 64), 0.7, np.float32),
                           np.random.default_rng(0), prob=0.5)
    assert np.all(np.isclose(out_np, -0.1, atol=1e-6)
                  | np.isclose(out_np, 0.7, atol=1e-6))


def test_input_mask_prob_extremes():
    img = jnp.full((32, 32), 0.5, jnp.float32)
    all_kept = np.asarray(input_mask(img, jax.random.PRNGKey(1), prob=0.0))
    np.testing.assert_allclose(all_kept, 0.5)
    all_dropped = np.asarray(input_mask(img, jax.random.PRNGKey(2), prob=1.5))
    np.testing.assert_allclose(all_dropped, -0.1, atol=1e-6)


def test_frame_interpolation_corrupt_shapes_and_even_frames():
    stack = jnp.asarray(_rand((7, 16, 16), seed=5))
    out = frame_interpolation_corrupt(stack, jax.random.PRNGKey(0), prob=0.0)
    assert out.shape == stack.shape
    # prob=0 -> even frames untouched (up to the -v+v float round-trip),
    # odd frames = neighbor mean masked at 0.5
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(stack)[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[2], np.asarray(stack)[2], atol=1e-6)
    odd = np.asarray(out)[1]
    mean = 0.5 * (np.asarray(stack)[0] + np.asarray(stack)[2])
    kept = np.isclose(odd, mean, atol=1e-6)
    dropped = np.isclose(odd, -0.1, atol=1e-6)
    assert np.all(kept | dropped)
    assert 0.3 < dropped.mean() < 0.7  # masked at prob 0.5


def test_dwconv_shift_matches_grouped_conv():
    """The shift-add depthwise form (models' ``dwconv_shift=True``, what
    train.model_shard swaps in — see parallel/mesh.py SECOND DEFECT) is
    numerically the grouped conv: identical parameter tree, matching
    forward AND parameter gradients on the same weights."""
    from rethink_acoustic_image_enhancement_tpu.models import KDLAETeacher

    kw = dict(dim=8, num_blocks=(1, 1, 1, 1), num_refinement_blocks=1,
              heads=(1, 2, 4, 8), layernorm_type="BiasFree",
              static="train", params="cat")
    conv = KDLAETeacher(**kw)
    shift = KDLAETeacher(**kw, dwconv_shift=True)
    lq = {"img": jnp.asarray(_rand((2, 16, 16, 3), seed=11)),
          "denoise_rate": jnp.full((2, 16, 16, 1), 0.6, jnp.float32)}
    params = conv.init(jax.random.PRNGKey(3), lq)["params"]
    # identical param trees (the converter/checkpoints see no difference)
    ps = shift.init(jax.random.PRNGKey(3), lq)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(ps)

    def loss(model):
        def f(p):
            out = model.apply({"params": p}, lq)
            return (jnp.abs(out["hq"]).mean()
                    + jnp.abs(out["sr"]).mean())
        return f

    (l_c, g_c) = jax.jit(jax.value_and_grad(loss(conv)))(params)
    (l_s, g_s) = jax.jit(jax.value_and_grad(loss(shift)))(params)
    np.testing.assert_allclose(float(l_c), float(l_s), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_c), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)

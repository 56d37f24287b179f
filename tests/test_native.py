"""Native C++ host-pipeline library tests (builds with g++ on first use)."""

import numpy as np
import pytest

from rethink_acoustic_image_enhancement_tpu.data.transforms import (
    data_augmentation,
)
from rethink_acoustic_image_enhancement_tpu.utils import native


def test_native_builds_and_loads():
    assert native.available(), "g++ build of raie_native.so failed"


def test_input_mask_semantics_and_stats():
    img = np.full((256, 256), 0.7, np.float32)
    out = native.input_mask(img, prob=0.4, value=0.1, seed=42)
    dropped = np.isclose(out, -0.1)
    kept = np.isclose(out, 0.7)
    assert np.all(dropped | kept)
    assert abs(dropped.mean() - 0.4) < 0.02
    # prob 0 -> untouched
    np.testing.assert_array_equal(native.input_mask(img, 0.0, seed=1), img)
    # determinism in seed
    np.testing.assert_array_equal(out, native.input_mask(img, 0.4, seed=42))
    assert not np.array_equal(out, native.input_mask(img, 0.4, seed=43))


def test_mask_frames_per_frame_probs():
    stack = np.full((3, 128, 128), 0.5, np.float32)
    out = native.mask_frames(stack, np.asarray([0.0, 0.5, 1.0]), seed=7)
    np.testing.assert_array_equal(out[0], stack[0])
    frac = np.isclose(out[1], -0.1).mean()
    assert 0.45 < frac < 0.55
    np.testing.assert_allclose(out[2], -0.1, atol=1e-6)


@pytest.mark.parametrize("mode", range(8))
def test_geometric_matches_numpy(mode):
    img = np.random.default_rng(0).normal(size=(6, 9, 3)).astype(np.float32)
    expected = np.ascontiguousarray(data_augmentation(img, mode))
    got = native.geometric(img, mode)
    np.testing.assert_array_equal(got, expected)
    # 2-D input path
    g2 = native.geometric(img[..., 0], mode)
    np.testing.assert_array_equal(g2, data_augmentation(img[..., 0], mode))


def test_u8_to_f32():
    img = np.random.default_rng(1).integers(0, 256, (5, 7, 3), np.uint8)
    np.testing.assert_allclose(native.u8_to_f32(img),
                               img.astype(np.float32) / 255.0)
    np.testing.assert_allclose(native.u8_to_f32(img, bgr2rgb=True),
                               img[..., ::-1].astype(np.float32) / 255.0)

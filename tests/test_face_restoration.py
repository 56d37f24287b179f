"""Face-restoration geometry: similarity estimation, warp-crop round trip,
and soft-mask paste-back (face_util.py:16-217 port, dlib detection gated)."""

import numpy as np
import pytest

from rethink_acoustic_image_enhancement_tpu.utils.face_restoration import (
    FFHQ_TEMPLATE_1024,
    FaceRestorationHelper,
    estimate_similarity,
    invert_affine,
    warp_affine,
)


def _apply(matrix, pts):
    return pts @ matrix[:, :2].T + matrix[:, 2]


def test_estimate_similarity_recovers_known_transform():
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 100, size=(5, 2))
    theta, scale, t = 0.3, 1.7, np.array([12.0, -5.0])
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    dst = scale * src @ rot.T + t
    m = estimate_similarity(src, dst)
    np.testing.assert_allclose(_apply(m, src), dst, atol=1e-8)
    # similarity structure: equal column norms, orthogonal columns
    a, b = m[:, 0], m[:, 1]
    assert abs(np.linalg.norm(a) - np.linalg.norm(b)) < 1e-9
    assert abs(a @ b) < 1e-9


def test_invert_affine_roundtrip():
    m = estimate_similarity(np.array([[0, 0], [1, 0], [0, 1], [2, 2], [3, 1]]),
                            np.array([[5, 5], [7, 5], [5, 7], [9, 9], [11, 7]]))
    pts = np.array([[0.5, 0.5], [2.0, 1.0]])
    back = _apply(invert_affine(m), _apply(m, pts))
    np.testing.assert_allclose(back, pts, atol=1e-9)


def test_warp_crop_and_paste_roundtrip():
    """A face aligned at the template position survives crop -> identity
    'restore' -> paste with small error inside the face region."""
    cv2 = pytest.importorskip("cv2")
    del cv2
    face_size = 128
    helper = FaceRestorationHelper(upscale_factor=1, face_size=face_size)
    # smooth image: the crop->paste path bilinearly resamples twice, which
    # cannot reproduce per-pixel noise — gradients survive the round trip
    yy, xx = np.mgrid[0:200, 0:200] / 200.0
    img = np.stack([0.2 + 0.6 * xx, 0.2 + 0.6 * yy,
                    0.5 + 0.3 * np.sin(4 * xx + 3 * yy)],
                   axis=-1).astype(np.float32)

    # landmarks: the template itself, offset into the image
    lm = FFHQ_TEMPLATE_1024 / (1024 // face_size) * 0.9 + 30.0
    helper.read_image(img)
    helper.add_landmarks(lm)
    crops = helper.warp_crop_faces()
    assert len(crops) == 1 and crops[0].shape == (face_size, face_size, 3)

    helper.add_restored_face(crops[0])
    out = helper.paste_faces_to_image()
    assert out.shape == img.shape
    # interior of the pasted face region matches the original (identity
    # restore): compare a central window around the warped-back center
    cy, cx = lm.mean(0).astype(int)[::-1]
    win = 12
    np.testing.assert_allclose(out[cy - win:cy + win, cx - win:cx + win],
                               img[cy - win:cy + win, cx - win:cx + win],
                               atol=0.06)


def test_paste_upscale_shape():
    cv2 = pytest.importorskip("cv2")
    del cv2
    helper = FaceRestorationHelper(upscale_factor=2, face_size=128)
    img = np.zeros((100, 120, 3), np.float32)
    helper.read_image(img)
    helper.add_landmarks(FFHQ_TEMPLATE_1024 / 8 * 0.5 + 20.0)
    helper.warp_crop_faces()
    helper.add_restored_face(np.ones((128, 128, 3), np.float32))
    out = helper.paste_faces_to_image()
    assert out.shape == (200, 240, 3)


def test_bad_landmark_shape_rejected():
    helper = FaceRestorationHelper()
    with pytest.raises(ValueError):
        helper.add_landmarks(np.zeros((4, 2)))

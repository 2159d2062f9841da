"""Bit/numeric parity of preprocessing ops against OpenCV."""

import cv2
import numpy as np
import pytest

from face_detection_recognization_pca_tpu.ops.color import (
    bgr_to_gray,
    bgr_to_gray_exact,
)
from face_detection_recognization_pca_tpu.ops.preprocess import (
    crop_resize_dynamic,
    preprocess_crops,
)
from face_detection_recognization_pca_tpu.ops.resize import (
    resize_bilinear,
    resize_bilinear_u8_exact,
)


def test_gray_bit_exact(rng):
    img = rng.integers(0, 256, (97, 211, 3), dtype=np.uint8)
    ours = np.asarray(bgr_to_gray_exact(img))
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    np.testing.assert_array_equal(ours, ref)


def test_gray_float_within_one_lsb(rng):
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    ours = np.asarray(bgr_to_gray(img, np.float64))
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float64)
    assert np.abs(ours - ref).max() <= 1.0


@pytest.mark.parametrize(
    "ssize,dsize",
    [
        ((263, 263), (64, 64)),  # lock crops -> v2 face size
        ((231, 187), (64, 64)),
        ((120, 80), (100, 100)),  # mixed up/down
        ((100, 100), (100, 100)),  # identity
        ((37, 311), (64, 64)),
        ((30, 30), (64, 64)),  # pure upscale (border rows extrapolate)
        ((10, 10), (64, 64)),  # extreme upscale: many clamped rows
        ((48, 48), (120, 40)),  # vertical upscale, horizontal downscale
        ((20, 20), (60, 60)),  # 3x: interior rows with exactly-zero frac
    ],
)
def test_resize_u8_exact_downscale(rng, ssize, dsize):
    img = rng.integers(0, 256, ssize, dtype=np.uint8)
    ours = np.asarray(resize_bilinear_u8_exact(img, dsize))
    ref = cv2.resize(img, dsize)
    # Bit-exact in BOTH directions: cv2 keeps split fractional weights
    # at clamped borders (see ops.resize._fixed_point_coeffs).
    np.testing.assert_array_equal(ours, ref)


def test_resize_u8_batched(rng):
    imgs = rng.integers(0, 256, (5, 120, 90), dtype=np.uint8)
    ours = np.asarray(resize_bilinear_u8_exact(imgs, (64, 64)))
    for i in range(5):
        np.testing.assert_array_equal(ours[i], cv2.resize(imgs[i], (64, 64)))


def test_resize_float_close_to_cv2(rng):
    img = rng.integers(0, 256, (200, 160), dtype=np.uint8)
    ours = np.asarray(resize_bilinear(img, (64, 64), dtype=np.float64))
    ref = cv2.resize(img.astype(np.float64), (64, 64))
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_preprocess_crops_matches_cv2_chain(rng):
    crops = rng.integers(0, 256, (3, 150, 130, 3), dtype=np.uint8)
    ours = np.asarray(preprocess_crops(crops, (64, 64), exact=True))
    for i in range(3):
        gray = cv2.cvtColor(crops[i], cv2.COLOR_BGR2GRAY)
        ref = cv2.resize(gray, (64, 64)).flatten()
        np.testing.assert_array_equal(ours[i], ref.astype(ours.dtype))


def test_preprocess_real_reference_crops(reference_root, rng):
    import glob
    import os

    paths = sorted(
        glob.glob(
            os.path.join(reference_root, "faces/lock_version/Joseph_Lai/*.jpg")
        )
    )[:4]
    if not paths:
        pytest.skip("no reference crops")
    crops = [cv2.imread(p) for p in paths]
    for c in crops:
        ours = np.asarray(
            preprocess_crops(c[None], (64, 64), exact=True)
        )[0]
        ref = cv2.resize(
            cv2.cvtColor(c, cv2.COLOR_BGR2GRAY), (64, 64)
        ).flatten()
        np.testing.assert_array_equal(ours, ref.astype(ours.dtype))


def test_crop_resize_dynamic_matches_static(rng):
    frame = rng.integers(0, 256, (300, 400), dtype=np.uint8).astype(np.float64)
    box = np.array([50, 80, 120, 100])  # x, y, w, h
    ours = np.asarray(crop_resize_dynamic(frame, box, (64, 64), dtype=np.float64))
    crop = frame[80:180, 50:170]
    ref = np.asarray(resize_bilinear(crop, (64, 64), dtype=np.float64))
    np.testing.assert_allclose(ours, ref, atol=1e-6)

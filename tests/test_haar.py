"""Haar cascade engine: parsing, detection behavior, grouping."""

import glob
import os

import cv2
import numpy as np
import pytest

from face_detection_recognization_pca_tpu.detect.haar import (
    HaarDetector,
    group_rectangles,
    load_cascade,
)

CASCADE = "/usr/share/opencv4/haarcascades/haarcascade_frontalface_default.xml"


@pytest.fixture(scope="module")
def cascade():
    if not os.path.exists(CASCADE):
        pytest.skip("no cascade xml on this machine")
    return load_cascade(CASCADE)


@pytest.fixture(scope="module")
def detector(cascade):
    return HaarDetector(cascade, top_k=1024)


def test_parse_cascade(cascade):
    assert cascade.window_size == (24, 24)
    assert cascade.n_stages == 25
    assert cascade.n_stumps == 2913
    assert cascade.stage_offsets[-1] == cascade.n_stumps
    # Corner matrix column sums are 0 (each rect adds +w +w -w -w).
    np.testing.assert_allclose(
        cascade.corner_matrix.sum(axis=0), 0.0, atol=1e-3
    )


def test_detects_real_face_on_plain_background(reference_root, detector):
    paths = sorted(
        glob.glob(
            os.path.join(reference_root, "faces/lock_version/Joseph_Lai/face_*.jpg")
        )
    )
    if not paths:
        pytest.skip("no crops")
    crop = cv2.resize(cv2.imread(paths[5], cv2.IMREAD_GRAYSCALE), (120, 120))
    frame = np.full((300, 400), 90, dtype=np.uint8)
    frame[80:200, 140:260] = crop
    faces = detector.detect_multi_scale(frame, 1.1, 3, (30, 30))
    assert faces, "no face found on planted crop"
    x, y, w, h = max(faces, key=lambda f: f[2])
    # Overlaps the planted region.
    assert x < 260 and x + w > 140 and y < 200 and y + h > 80


def test_no_faces_on_blank_and_noise(detector, rng):
    blank = np.full((240, 320), 128, dtype=np.uint8)
    assert detector.detect_multi_scale(blank, 1.1, 5, (30, 30)) == []
    noise = rng.integers(0, 256, (240, 320), dtype=np.uint8)
    assert len(detector.detect_multi_scale(noise, 1.1, 5, (30, 30))) == 0


def test_detects_face_in_reference_video_frame(reference_root, detector):
    cap = cv2.VideoCapture(os.path.join(reference_root, "videos/test.mp4"))
    ret, fr = cap.read()
    cap.release()
    if not ret:
        pytest.skip("video unreadable")
    gray = cv2.cvtColor(fr, cv2.COLOR_BGR2GRAY)
    faces = detector.detect_multi_scale(gray, 1.1, 5, (30, 30))
    assert len(faces) >= 1
    # All boxes inside the frame.
    for (x, y, w, h) in faces:
        assert 0 <= x and 0 <= y and x + w <= 960 and y + h <= 544


def test_min_size_respected(reference_root, detector):
    cap = cv2.VideoCapture(os.path.join(reference_root, "videos/test.mp4"))
    ret, fr = cap.read()
    cap.release()
    gray = cv2.cvtColor(fr, cv2.COLOR_BGR2GRAY)
    faces = detector.detect_multi_scale(gray, 1.1, 5, (300, 300))
    for (x, y, w, h) in faces:
        assert w >= 300 and h >= 300


def test_group_rectangles_semantics():
    # 6 near-identical rects + 1 outlier, threshold 5 like the reference.
    base = [(100 + i, 100 - i, 50, 50) for i in range(6)]
    outlier = [(300, 300, 60, 60)]
    out = group_rectangles(base + outlier, 5)
    assert len(out) == 1
    x, y, w, h = out[0]
    assert abs(x - 102) <= 2 and abs(y - 98) <= 2 and abs(w - 50) <= 1
    # Threshold 0 returns everything ungrouped.
    assert len(group_rectangles(base + outlier, 0)) == 7
    # Clusters with exactly threshold members are dropped (strict >).
    out2 = group_rectangles(base, 6)
    assert out2 == []


def test_batch_matches_single(reference_root, detector):
    import cv2

    cap = cv2.VideoCapture(os.path.join(reference_root, "videos/test.mp4"))
    frames = []
    for _ in range(3):
        ret, fr = cap.read()
        if not ret:
            break
        frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2GRAY))
    cap.release()
    batch = np.stack(frames)
    out_batch = detector.detect_multi_scale_batch(batch, 1.1, 5, (30, 30))
    for b, g in enumerate(frames):
        single = detector.detect_multi_scale(g, 1.1, 5, (30, 30))
        assert out_batch[b] == single


def test_pool_overflow_retry_learns_capacity(cascade, rng):
    """A pool overflow retries with doubled capacity AND records the
    floor, so the next call runs the right-sized program directly
    (without this, footage exceeding the static sizing re-ran its
    chunks on EVERY call -- measured 13 fps vs 59 at B=32/16)."""
    det = HaarDetector(cascade, k_per_level=8)
    noise = rng.integers(0, 256, (240, 320), dtype=np.uint8)
    first = det.detect_multi_scale(noise, 1.1, 5, (30, 30))
    d_first = det.last_dispatches
    assert det._cap_floor, "expected a pool overflow on noise input"
    second = det.detect_multi_scale(noise, 1.1, 5, (30, 30))
    assert second == first
    assert det.last_dispatches < d_first  # no retry dispatches now


def test_batch_splitting_matches_unsplit(reference_root, detector):
    """max_device_batch splits wide batches into pipelined sub-batches
    (cached-program reuse on TPU; B=32 >= B=16 by construction) with
    identical detections, including a padded tail sub-batch."""
    import cv2

    cap = cv2.VideoCapture(os.path.join(reference_root, "videos/test.mp4"))
    frames = []
    for _ in range(5):
        ret, fr = cap.read()
        if not ret:
            break
        frames.append(
            cv2.resize(cv2.cvtColor(fr, cv2.COLOR_BGR2GRAY), (480, 272))
        )
    cap.release()
    batch = np.stack(frames)  # 5 frames -> sub-batches of 2, 2, 1(+pad)
    split_det = HaarDetector(max_device_batch=2)
    got = split_det.detect_multi_scale_batch(batch, 1.1, 3, (24, 24))
    want = split_det_ref = HaarDetector(max_device_batch=0)
    want = split_det_ref.detect_multi_scale_batch(batch, 1.1, 3, (24, 24))
    assert got == want
    assert len(got) == 5

"""TM_CCOEFF_NORMED and NMS parity against OpenCV / Python oracles."""

import cv2
import numpy as np
import pytest

from face_detection_recognization_pca_tpu.ops.match import (
    match_best,
    match_template_ccoeff_normed,
)
from face_detection_recognization_pca_tpu.ops.nms import (
    in_border_or_corner,
    iou_matrix,
    nms,
)


@pytest.mark.parametrize("method", ["direct", "fft"])
def test_ccoeff_normed_matches_cv2(rng, method):
    frame = rng.integers(0, 256, (120, 160), dtype=np.uint8)
    tmpl = frame[40:80, 60:110].copy()  # embedded template -> peak 1.0
    ours = np.asarray(
        match_template_ccoeff_normed(
            frame.astype(np.float64), tmpl.astype(np.float64), method=method
        )
    )
    ref = cv2.matchTemplate(frame, tmpl, cv2.TM_CCOEFF_NORMED)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)
    # Peak location identical to minMaxLoc.
    _, _, _, max_loc = cv2.minMaxLoc(ref)
    score, loc = match_best(frame.astype(np.float64), tmpl.astype(np.float64))
    assert tuple(np.asarray(loc)) == max_loc
    assert float(score) > 0.9999


def test_ccoeff_normed_real_face_crop(reference_root, rng):
    import glob
    import os

    paths = sorted(
        glob.glob(
            os.path.join(reference_root, "faces/lock_version/Joseph_Lai/face_*.jpg")
        )
    )
    if len(paths) < 2:
        pytest.skip("need reference crops")
    a = cv2.imread(paths[0], cv2.IMREAD_GRAYSCALE)
    frame = cv2.copyMakeBorder(a, 30, 25, 40, 15, cv2.BORDER_REFLECT)
    tmpl = cv2.resize(a, (a.shape[1] // 2, a.shape[0] // 2))
    ours = np.asarray(
        match_template_ccoeff_normed(
            frame.astype(np.float64), tmpl.astype(np.float64)
        )
    )
    ref = cv2.matchTemplate(frame, tmpl, cv2.TM_CCOEFF_NORMED)
    np.testing.assert_allclose(ours, ref, atol=5e-4)
    assert abs(ours.max() - ref.max()) < 1e-4


def test_flat_window_gives_zero():
    frame = np.full((50, 50), 77.0)
    tmpl = np.arange(64, dtype=np.float64).reshape(8, 8)
    ours = np.asarray(match_template_ccoeff_normed(frame, tmpl))
    np.testing.assert_array_equal(ours, np.zeros_like(ours))


def _py_nms(dets, thr):
    """Reference-style greedy NMS oracle (scan-template-v4.py:199-251)."""
    dets = sorted(enumerate(dets), key=lambda kv: -kv[1][4])
    keep = []
    while dets:
        i, cur = dets.pop(0)
        keep.append(i)
        rest = []
        for j, d in dets:
            xa0, ya0 = max(cur[0], d[0]), max(cur[1], d[1])
            xa1 = min(cur[0] + cur[2], d[0] + d[2])
            ya1 = min(cur[1] + cur[3], d[1] + d[3])
            inter = max(xa1 - xa0, 0) * max(ya1 - ya0, 0)
            union = cur[2] * cur[3] + d[2] * d[3] - inter
            if (inter / union if union > 0 else 0.0) < thr:
                rest.append((j, d))
        dets = rest
    return sorted(keep)


def test_nms_matches_python_oracle(rng):
    for _ in range(10):
        n = 12
        boxes = np.stack(
            [
                rng.uniform(0, 200, n),
                rng.uniform(0, 200, n),
                rng.uniform(20, 120, n),
                rng.uniform(20, 120, n),
            ],
            axis=1,
        )
        scores = rng.uniform(0, 1, n)
        dets = np.concatenate([boxes, scores[:, None]], axis=1)
        expected = _py_nms(dets.tolist(), 0.3)
        keep = np.asarray(nms(boxes, scores, 0.3))
        assert sorted(np.nonzero(keep)[0].tolist()) == expected


def test_nms_padding_slots_never_kept(rng):
    boxes = np.zeros((8, 4))
    scores = np.full(8, -1e30)
    boxes[0] = [10, 10, 50, 50]
    scores[0] = 0.9
    keep = np.asarray(nms(boxes, scores, 0.3))
    assert keep[0] and not keep[1:].any()


def test_border_corner_rejection_matches_reference_rules():
    fw, fh = 640, 480
    cases = [
        ([300, 200, 60, 60], False),  # center -> keep
        ([2, 200, 60, 60], True),  # left border
        ([300, 1, 60, 60], True),  # top border
        ([610, 200, 60, 60], True),  # right border overflow (x+w > 608)
        ([40, 40, 50, 50], True),  # top-left corner center
        ([560, 400, 50, 50], True),  # bottom-right corner + border
    ]
    boxes = np.array([c[0] for c in cases], dtype=np.float64)
    out = np.asarray(in_border_or_corner(boxes, fw, fh))
    assert out.tolist() == [c[1] for c in cases]


def test_iou_matrix_basics():
    boxes = np.array([[0, 0, 10, 10], [5, 0, 10, 10], [100, 100, 10, 10]], dtype=float)
    m = np.asarray(iou_matrix(boxes))
    assert m[0, 0] == pytest.approx(1.0)
    assert m[0, 1] == pytest.approx(50 / 150)
    assert m[0, 2] == 0.0


def test_dft_correlate_valid_matches_fft(rng):
    """Full-frame MXU-DFT correlation == rFFT correlation (the TPU and
    CPU backends of _fused_score_maps' numerator must agree)."""
    import jax.numpy as jnp

    from face_detection_recognization_pca_tpu.ops.dft_match import (
        dft_correlate_valid,
    )

    frames = rng.normal(0, 30, (2, 40, 56)).astype(np.float32)
    kernels = rng.normal(0, 30, (3, 9, 13)).astype(np.float32)
    kernels -= kernels.mean(axis=(1, 2), keepdims=True)
    oh, ow = 40 - 9 + 1, 56 - 13 + 1
    got = np.asarray(
        dft_correlate_valid(jnp.asarray(frames), jnp.asarray(kernels), oh, ow)
    )
    ff = np.fft.rfft2(frames, (40, 56))
    kf = np.conj(np.fft.rfft2(kernels, (40, 56)))
    want = np.fft.irfft2(ff[:, None] * kf[None], (40, 56))[:, :, :oh, :ow]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=0.5)


def _cv2_nms_keep(boxes, scores, score_thr, nms_thr):
    idx = cv2.dnn.NMSBoxes(
        [tuple(map(float, b)) for b in boxes],
        [float(s) for s in scores],
        score_thr,
        nms_thr,
    )
    return set(np.asarray(idx).reshape(-1).tolist())


def test_nms_boxes_cv2_random_parity(rng):
    """nms_boxes_cv2 == cv2.dnn.NMSBoxes on random candidate sets
    (the reference template detector's NMS, useless/scan-template.py:156)."""
    from face_detection_recognization_pca_tpu.ops.nms import nms_boxes_cv2

    for trial in range(5):
        n = 40
        boxes = np.stack(
            [
                rng.integers(0, 120, n),
                rng.integers(0, 90, n),
                rng.integers(8, 48, n),
                rng.integers(8, 48, n),
            ],
            axis=1,
        ).astype(np.float64)
        scores = rng.uniform(0.0, 1.0, n)
        want = _cv2_nms_keep(boxes, scores, 0.3, 0.35)
        keep = np.asarray(nms_boxes_cv2(boxes, scores, 0.3, 0.35))
        assert set(np.nonzero(keep)[0].tolist()) == want


def test_nms_boxes_cv2_edge_semantics():
    """The three semantics that differ from the v4 Python NMS, pinned
    against cv2 5.0 behavior: strict score >, strict IoU >, index
    tie-break."""
    from face_detection_recognization_pca_tpu.ops.nms import nms_boxes_cv2

    # score == score_threshold is dropped (strict >).
    boxes = np.array([[0, 0, 10, 10], [100, 100, 10, 10]], dtype=float)
    scores = np.array([0.7, 0.8])
    assert _cv2_nms_keep(boxes, scores, 0.7, 0.3) == {1}
    keep = np.asarray(nms_boxes_cv2(boxes, scores, 0.7, 0.3))
    assert set(np.nonzero(keep)[0].tolist()) == {1}

    # IoU == nms_threshold survives (suppression is strict >).
    boxes = np.array([[0, 0, 10, 30], [0, 10, 10, 30]], dtype=float)  # IoU 0.5
    scores = np.array([0.9, 0.8])
    assert _cv2_nms_keep(boxes, scores, 0.1, 0.5) == {0, 1}
    keep = np.asarray(nms_boxes_cv2(boxes, scores, 0.1, 0.5))
    assert set(np.nonzero(keep)[0].tolist()) == {0, 1}
    assert _cv2_nms_keep(boxes, scores, 0.1, 0.49) == {0}
    keep = np.asarray(nms_boxes_cv2(boxes, scores, 0.1, 0.49))
    assert set(np.nonzero(keep)[0].tolist()) == {0}

    # Equal scores: lowest original index wins.
    boxes = np.array(
        [[0, 0, 10, 10], [2, 0, 10, 10], [4, 0, 10, 10]], dtype=float
    )
    scores = np.array([0.9, 0.9, 0.9])
    assert _cv2_nms_keep(boxes, scores, 0.1, 0.3) == {0}
    keep = np.asarray(nms_boxes_cv2(boxes, scores, 0.1, 0.3))
    assert set(np.nonzero(keep)[0].tolist()) == {0}

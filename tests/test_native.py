"""Native framestage: parity with cv2 and ring-buffer correctness."""

import glob
import os
import time

import cv2
import numpy as np
import pytest

from face_detection_recognization_pca_tpu.io import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="libframestage.so not built"
)


def test_batch_decode_matches_cv2(reference_root):
    paths = sorted(
        glob.glob(
            os.path.join(reference_root, "faces/lock_version/Joseph_Lai/face_*.jpg")
        )
    )[:16]
    imgs, ok = native.decode_jpegs_batch(paths, gray=True, size_wh=(64, 64))
    assert ok.all()
    for i, p in enumerate(paths):
        ref = cv2.resize(cv2.imread(p, cv2.IMREAD_GRAYSCALE), (64, 64))
        np.testing.assert_array_equal(imgs[i], ref)


def test_batch_decode_return_dims(reference_root):
    """Original (pre-resize) dims come back exactly (feeds template-bank
    native_scale), and the native-decode TemplateBank path computes the
    same native_scale the cv2 full-decode path does."""
    paths = sorted(
        glob.glob(
            os.path.join(reference_root, "faces/lock_version/Joseph_Lai/face_*.jpg")
        )
    )[:8]
    imgs, ok, dims = native.decode_jpegs_batch(
        paths, gray=True, size_wh=(64, 64), return_dims=True
    )
    assert ok.all() and dims.shape == (len(paths), 2)
    for i, p in enumerate(paths):
        ref = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        assert tuple(dims[i]) == ref.shape

    from face_detection_recognization_pca_tpu.detect.template import (
        TemplateBank,
    )

    lock = os.path.join(reference_root, "faces/lock_version")
    bank_native = TemplateBank.from_person_dirs(lock, per_person=3)
    # cv2 fallback path: full-size decode of the SAME JSON-sourced
    # template files (scan-template-v4.py:46-58 sourcing rule), bank
    # resizes itself.
    import json

    cv2_pairs = []
    for pdir in sorted(glob.glob(os.path.join(lock, "*"))):
        if not os.path.isdir(pdir):
            continue
        name = os.path.basename(pdir)
        jpath = os.path.join(pdir, f"{name}_faces_detection.json")
        paths = []
        if os.path.exists(jpath):
            with open(jpath, "r", encoding="utf-8") as f:
                faces = json.load(f).get("faces") or []
            for face in faces[:3]:
                rel = str(face.get("image_path", "")).replace("\\", "/")
                cand = os.path.join(reference_root, rel)
                if os.path.exists(cand):
                    paths.append(cand)
        if not paths:
            paths = sorted(glob.glob(os.path.join(pdir, "face_*.jpg")))[:3]
        for c in paths:
            img = cv2.imread(c, cv2.IMREAD_GRAYSCALE)
            if img is not None:
                cv2_pairs.append((name, img))
    bank_cv2 = TemplateBank(cv2_pairs, canonical_size=(128, 128))
    assert abs(bank_native.native_scale - bank_cv2.native_scale) < 1e-9
    np.testing.assert_allclose(
        bank_native.native_ratios, bank_cv2.native_ratios, atol=1e-9
    )
    assert bank_native.native_scale > 0.5


def test_batch_decode_bgr(reference_root):
    paths = sorted(
        glob.glob(
            os.path.join(reference_root, "faces/lock_version/shun/face_*.jpg")
        )
    )[:4]
    imgs, ok = native.decode_jpegs_batch(paths, gray=False, size_wh=(48, 48))
    assert ok.all() and imgs.shape == (4, 48, 48, 3)
    ref = cv2.resize(cv2.imread(paths[0]), (48, 48))
    np.testing.assert_array_equal(imgs[0], ref)


def test_batch_decode_bad_paths(tmp_path):
    bad = str(tmp_path / "nope.jpg")
    imgs, ok = native.decode_jpegs_batch([bad], gray=True, size_wh=(8, 8))
    assert not ok[0]


def test_video_ring_matches_cv2(reference_root):
    vp = os.path.join(reference_root, "videos/test.mp4")
    r = native.NativeVideoReader(vp, ring=4, gray=True)
    assert (r.width, r.height) == (960, 544)
    cap = cv2.VideoCapture(vp)
    n = 0
    for frame in r.frames():
        ret, ref = cap.read()
        if not ret:
            break
        np.testing.assert_array_equal(
            frame, cv2.cvtColor(ref, cv2.COLOR_BGR2GRAY)
        )
        n += 1
        if n >= 10:
            break
    r.close()
    cap.release()
    assert n == 10


def test_parallel_decode_faster_than_serial(reference_root):
    paths = (
        sorted(
            glob.glob(
                os.path.join(reference_root, "faces/lock_version/shun/face_*.jpg")
            )
        )
        * 2
    )[:200]
    if len(paths) < 100:
        pytest.skip("not enough crops")
    native.decode_jpegs_batch(paths[:20], gray=True, size_wh=(64, 64))  # warm
    t0 = time.perf_counter()
    native.decode_jpegs_batch(paths, gray=True, size_wh=(64, 64))
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for p in paths:
        cv2.resize(cv2.imread(p, cv2.IMREAD_GRAYSCALE), (64, 64))
    t_serial = time.perf_counter() - t0
    # On multi-core hosts the pool wins outright; this CI box has a
    # single core, so just require the native path not to regress badly
    # (it also avoids per-image Python/GIL overhead).
    assert t_native < 3.0 * t_serial


def test_group_rectangles_native_matches_python():
    """Native gr_group is element-exact vs the Python oracle, including
    threshold 0 passthrough, empties, and half-even rounding edges."""
    from face_detection_recognization_pca_tpu.detect.haar import (
        _group_rectangles_py,
        group_rectangles,
    )

    rng = np.random.default_rng(7)
    for trial in range(200):
        n = int(rng.integers(0, 90))
        ncent = int(rng.integers(1, 7))
        centers = rng.integers(30, 900, (ncent, 2))
        rects = []
        for i in range(n):
            c = centers[i % ncent]
            s = int(rng.integers(24, 280))
            rects.append(
                (
                    int(c[0] + rng.integers(-12, 13)),
                    int(c[1] + rng.integers(-12, 13)),
                    s + int(rng.integers(-6, 7)),
                    s + int(rng.integers(-6, 7)),
                )
            )
        thr = int(rng.integers(0, 7))
        assert group_rectangles(rects, thr) == _group_rectangles_py(rects, thr)
    # Half-even rounding edge: cluster means landing exactly on .5.
    rects = [(10, 10, 50, 50), (11, 11, 51, 51)]  # means 10.5/50.5
    assert group_rectangles(rects, 1) == _group_rectangles_py(rects, 1)
    direct = native.group_rectangles_native(rects, 1, 0.2)
    assert direct == _group_rectangles_py(rects, 1)

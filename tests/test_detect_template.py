"""Template detection engines: parity vs reference-style cv2 loop, and
fused-engine correctness on planted faces."""

import glob
import os

import cv2
import numpy as np
import pytest

from face_detection_recognization_pca_tpu.config import DetectConfig
from face_detection_recognization_pca_tpu.detect.guided import GuidedMatcher
from face_detection_recognization_pca_tpu.detect.template import (
    TemplateBank,
    TemplateDetector,
)


@pytest.fixture(scope="module")
def face_crop(reference_root):
    paths = sorted(
        glob.glob(
            os.path.join(reference_root, "faces/lock_version/Joseph_Lai/face_*.jpg")
        )
    )
    if not paths:
        pytest.skip("no reference crops")
    return cv2.imread(paths[0], cv2.IMREAD_GRAYSCALE)


def _plant(frame, crop, x, y):
    h, w = crop.shape
    frame[y : y + h, x : x + w] = crop
    return frame


def test_parity_engine_finds_planted_face(face_crop, rng):
    crop = cv2.resize(face_crop, (80, 80))
    frame = rng.integers(0, 256, (480, 640), dtype=np.uint8)
    frame = cv2.GaussianBlur(frame, (31, 31), 10)
    _plant(frame, crop, 250, 180)
    bank = TemplateBank([("Joseph_Lai", crop)], canonical_size=None)
    det = TemplateDetector(bank, DetectConfig())
    out = det.detect_parity(frame)
    assert len(out) == 1
    d = out[0]
    assert d.person_name == "Joseph_Lai"
    assert (d.x, d.y) == (250, 180)
    assert d.confidence > 0.99
    assert d.scale == 1.0


def test_parity_engine_matches_cv2_oracle(face_crop, rng):
    """Score/selection identical to a direct cv2 reimplementation of the
    reference loop on the same inputs."""
    crop = cv2.resize(face_crop, (72, 90))
    frame = rng.integers(0, 256, (360, 480), dtype=np.uint8)
    frame = cv2.GaussianBlur(frame, (15, 15), 6)
    _plant(frame, cv2.resize(crop, (86, 108)), 150, 100)  # 1.2x scale hit

    cfg = DetectConfig()
    bank = TemplateBank([("p", crop)], canonical_size=None)
    ours = TemplateDetector(bank, cfg).detect_parity(frame)

    best_score, best = -1.0, None
    fh, fw = frame.shape
    for scale in cfg.template_scales:
        nw, nh = int(crop.shape[1] * scale), int(crop.shape[0] * scale)
        if nw < 20 or nh < 20 or nw > fw or nh > fh:
            continue
        scaled = cv2.resize(crop, (nw, nh))
        res = cv2.matchTemplate(frame, scaled, cv2.TM_CCOEFF_NORMED)
        _, mv, _, ml = cv2.minMaxLoc(res)
        if mv > best_score:
            best_score, best = mv, (ml[0], ml[1], nw, nh)
    assert ours, "detector found nothing"
    d = ours[0]
    assert (d.x, d.y, d.width, d.height) == best
    assert abs(d.confidence - best_score) < 1e-3


def test_fused_engine_finds_planted_face(face_crop, rng):
    crop = np.asarray(cv2.resize(face_crop, (128, 128)))
    frame = rng.integers(0, 256, (480, 640), dtype=np.uint8)
    frame = cv2.GaussianBlur(frame, (31, 31), 10)
    _plant(frame, crop, 300, 200)
    bank = TemplateBank(
        [("Joseph_Lai", crop), ("other", 255 - crop)], canonical_size=(128, 128)
    )
    det = TemplateDetector(bank, DetectConfig())
    out = det.detect_fused(frame)
    names = [d.person_name for d in out]
    assert "Joseph_Lai" in names
    d = next(x for x in out if x.person_name == "Joseph_Lai")
    assert abs(d.x - 300) <= 2 and abs(d.y - 200) <= 2
    assert d.confidence > 0.95


def test_fused_engine_native_scale_coverage(face_crop, rng):
    """A bank built from LARGE native crops must still find faces at
    their native size: the reference scales native template sizes
    (scan-template-v4.py:161-169), so the fused engine folds the bank's
    native/canonical ratio into its effective scales.  Before this, a
    219 px-crop bank searched only 102-153 px boxes (canonical 128 x
    0.8/1.0/1.2) and never re-found its own faces (r4 e2e bench:
    170 detections, 0 recognized)."""
    native = np.asarray(cv2.resize(face_crop, (192, 192)))
    frame = rng.integers(0, 256, (480, 640), dtype=np.uint8)
    frame = cv2.GaussianBlur(frame, (31, 31), 10)
    _plant(frame, native, 260, 180)
    bank = TemplateBank([("p", native)], canonical_size=(128, 128))
    assert abs(bank.native_scale - 1.5) < 1e-6
    out = TemplateDetector(bank, DetectConfig()).detect_fused(frame)
    assert len(out) == 1
    d = out[0]
    # Box size must cover the native 192 px face (eff scale 1.0 -> 192).
    assert abs(d.width - 192) <= 2 and abs(d.height - 192) <= 2
    assert abs(d.x - 260) <= 3 and abs(d.y - 180) <= 3
    assert d.confidence > 0.9


def test_fused_engine_per_template_scales(face_crop, rng):
    """Mixed-size banks search EACH template's own native size
    (scan-template-v4.py:161-169 scales every template independently):
    an 80 px and a 240 px template in one bank must both re-find their
    faces at native size, not at a shared median size."""
    small = np.asarray(cv2.resize(face_crop, (80, 80)))
    large = np.asarray(255 - cv2.resize(face_crop, (240, 240)))
    frame = rng.integers(0, 256, (480, 640), dtype=np.uint8)
    frame = cv2.GaussianBlur(frame, (31, 31), 10)
    _plant(frame, small, 90, 300)
    _plant(frame, large, 300, 120)
    bank = TemplateBank(
        [("small_p", small), ("large_p", large)], canonical_size=(128, 128)
    )
    np.testing.assert_allclose(bank.native_ratios, [0.625, 1.875])
    out = TemplateDetector(bank, DetectConfig()).detect_fused(frame)
    by_name = {d.person_name: d for d in out}
    assert set(by_name) == {"small_p", "large_p"}
    s, l = by_name["small_p"], by_name["large_p"]
    assert abs(s.width - 80) <= 2 and abs(s.x - 90) <= 2 and abs(s.y - 300) <= 2
    assert abs(l.width - 240) <= 2 and abs(l.x - 300) <= 2 and abs(l.y - 120) <= 2
    assert s.confidence > 0.9 and l.confidence > 0.9


def test_bank_json_sourcing(reference_root):
    """Template sourcing follows the reference rule: the first N
    ``faces[].image_path`` entries of the person's detection JSON
    (scan-template-v4.py:46-58), with the shipped Windows separators
    normalized.  For Joseph_Lai those are the v1 100x100 crops (NOT the
    face_*.jpg files a directory glob would pick), and ruiyi's
    ``detected_face_*`` files are included at all."""
    lock = os.path.join(reference_root, "faces/lock_version")
    bank = TemplateBank.from_person_dirs(lock, per_person=5)
    assert bank.person_names == ["Joseph_Lai", "ruisheng", "ruiyi", "shun"]
    joseph = [t for n, t in bank.entries if n == "Joseph_Lai"]
    assert len(joseph) == 5
    # entries hold canonical-resized pixels; the recorded native ratios
    # must reflect the 100x100 on-disk v1 crops (100/128).
    jr = bank.native_ratios[
        [i for i, (n, _) in enumerate(bank.entries) if n == "Joseph_Lai"]
    ]
    np.testing.assert_allclose(jr, 100.0 / 128.0)
    assert sum(1 for n, _ in bank.entries if n == "ruiyi") == 5
    # persons= restricts the bank (reference: only persons whose model
    # loaded contribute templates).
    gated = TemplateBank.from_person_dirs(
        lock, per_person=5, persons={"Joseph_Lai"}
    )
    assert gated.person_names == ["Joseph_Lai"]
    assert len(gated.entries) == 5


def test_bank_json_unresolvable_leaves_person_templateless(tmp_path):
    """A detection JSON that exists but whose image_path entries don't
    resolve gives the person ZERO templates (reference
    scan-template-v4.py:46-58 never globs when a JSON is present); the
    glob fallback applies only when the JSON file is absent."""
    import json

    lock = tmp_path / "faces" / "lock_version"
    crop = np.full((64, 64), 128, np.uint8)
    # Person A: JSON present, paths unresolvable, crops on disk.
    a = lock / "alice"
    a.mkdir(parents=True)
    cv2.imwrite(str(a / "face_0001.jpg"), crop)
    (a / "alice_faces_detection.json").write_text(
        json.dumps({"faces": [{"image_path": "C:\\gone\\x.jpg"}]})
    )
    # Person B: no JSON, crops on disk -> glob fallback applies.
    b = lock / "bob"
    b.mkdir(parents=True)
    cv2.imwrite(str(b / "face_0001.jpg"), crop)
    bank = TemplateBank.from_person_dirs(str(lock), per_person=5)
    assert [n for n, _ in bank.entries] == ["bob"]


def test_fused_engine_corner_rejection(face_crop, rng):
    crop = np.asarray(cv2.resize(face_crop, (128, 128)))
    frame = rng.integers(0, 256, (480, 640), dtype=np.uint8)
    frame = cv2.GaussianBlur(frame, (31, 31), 10)
    _plant(frame, crop, 0, 0)  # top-left corner -> must be rejected
    bank = TemplateBank([("p", crop)], canonical_size=(128, 128))
    out = TemplateDetector(bank, DetectConfig()).detect_fused(frame)
    for d in out:
        assert not (d.x < 32 and d.y < 24)


def test_guided_matcher_tracks_prior(face_crop, rng):
    class Prior:
        width, height = 90, 90
        center_x, center_y = 305, 245

    crop = cv2.resize(face_crop, (90, 90))
    frame = rng.integers(0, 256, (480, 640), dtype=np.uint8)
    frame = cv2.GaussianBlur(frame, (21, 21), 8)
    _plant(frame, crop, 270, 210)  # within the 1.5x search window of prior
    gm = GuidedMatcher(face_crop, search_scale=1.5)
    hit = gm.match_frame(frame, [Prior()])
    assert hit is not None
    # cv2 oracle on the same window
    sw, sh = int(90 * 1.5), int(90 * 1.5)
    sx = max(0, 305 - sw // 2)
    sy = max(0, 245 - sh // 2)
    region = frame[sy : sy + sh, sx : sx + sw]
    tmpl = cv2.resize(face_crop, (90, 90))
    res = cv2.matchTemplate(region, tmpl, cv2.TM_CCOEFF_NORMED)
    _, mv, _, ml = cv2.minMaxLoc(res)
    assert (hit["x"], hit["y"]) == (sx + ml[0], sy + ml[1])
    assert abs(hit["confidence"] - mv) < 1e-3


def test_guided_matcher_ref_frame_diff(face_crop, rng):
    """The winning prior's frame distance is recorded in the hit
    (reference scan-template-v2.py:382,549)."""

    class Prior:
        width, height = 90, 90
        center_x, center_y = 305, 245
        frame_number = 12

    crop = cv2.resize(face_crop, (90, 90))
    frame = rng.integers(0, 256, (480, 640), dtype=np.uint8)
    frame = cv2.GaussianBlur(frame, (21, 21), 8)
    _plant(frame, crop, 270, 210)
    gm = GuidedMatcher(face_crop, search_scale=1.5)
    hit = gm.match_frame(frame, [Prior()], frame_number=15)
    assert hit is not None
    assert hit["ref_frame_diff"] == 3
    # Priors without frame_number (live mode synthetics) degrade to 0.
    class Bare:
        width, height = 90, 90
        center_x, center_y = 305, 245

    hit2 = gm.match_frame(frame, [Bare()], frame_number=15)
    assert hit2["ref_frame_diff"] == 0

"""Coverage for detection-JSON generation, video IO, images, utils."""

import json
import os

import cv2
import numpy as np
import pytest

from face_detection_recognization_pca_tpu.io.detection_json import (
    DetectionFile,
    DetectionRecord,
    generate_detection_json,
    read_detection_json,
    reference_positions,
    write_detection_json,
)
from face_detection_recognization_pca_tpu.io.images import (
    minmax_to_u8,
    save_eigenface_images,
)
from face_detection_recognization_pca_tpu.io.video import VideoReader, VideoWriter
from face_detection_recognization_pca_tpu.utils.logging import Counters
from face_detection_recognization_pca_tpu.utils.profiling import StageTimer


def test_detection_json_roundtrip(tmp_path):
    det = DetectionFile(
        video_path="v.mp4",
        total_frames=10,
        fps=30.0,
        total_faces_detected=1,
        processing_date="2026-01-01",
        faces=[
            DetectionRecord(0, 3, 0.1, 5, 6, 40, 50, 25, 31, 2000, "a.jpg", "a.jpg")
        ],
    )
    p = str(tmp_path / "d.json")
    write_detection_json(det, p)
    back = read_detection_json(p)
    assert back.faces[0].frame_number == 3
    assert back.faces[0].area == 2000
    assert back.fps == 30.0
    # Raw JSON has the reference's exact header keys.
    raw = json.load(open(p))
    assert set(raw) == {
        "video_path",
        "total_frames",
        "fps",
        "total_faces_detected",
        "processing_date",
        "faces",
    }


def test_generate_detection_json_regexes(tmp_path):
    d = tmp_path / "person"
    d.mkdir()
    # Both filename generations + artifacts that must be skipped.
    for name in (
        "face_000002_frame_000007.jpg",
        "somebody_face_0003.jpg",
        "person_eigenface_01.jpg",
        "person_mean_face.jpg",
    ):
        (d / name).write_bytes(b"")
    det = generate_detection_json(
        str(d), "person", image_size_fn=lambda p: (64, 48)
    )
    assert det.total_faces_detected == 2
    frames = sorted(r.frame_number for r in det.faces)
    assert frames == [3, 7]
    r = det.faces[0]
    assert (r.x, r.y) == (0, 0)
    assert r.width == 48 and r.height == 64


def test_reference_positions_tolerance():
    faces = [
        DetectionRecord(i, f, 0, 0, 0, 10, 10, 5, 5, 100, "", "")
        for i, f in enumerate([0, 4, 9, 20])
    ]
    det = DetectionFile("v", 30, 30, 4, "", faces)
    near = reference_positions(det, 5, tolerance=5)
    assert sorted(r.frame_number for r in near) == [0, 4, 9]
    assert reference_positions(det, 30, 5) == []


def test_video_reader_writer_roundtrip(tmp_path):
    p = str(tmp_path / "t.mp4")
    w = VideoWriter(p, (64, 48), 10.0)
    rng = np.random.default_rng(0)
    frames = [
        np.ascontiguousarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
        for _ in range(5)
    ]
    for f in frames:
        w.write(f)
    w.close()
    r = VideoReader(p)
    assert (r.meta.width, r.meta.height) == (64, 48)
    got = list(r.frames())
    r.close()
    assert len(got) == 5


def test_video_batches_padding(reference_root):
    r = VideoReader(os.path.join(reference_root, "videos/test.mp4"))
    batches = []
    for stack, n in r.batches(50, gray=True):
        batches.append((stack.shape, n))
        if len(batches) >= 4:
            break
    r.close()
    assert batches[0] == ((50, 544, 960), 50)
    # Last batch of the 184-frame video is padded (184 = 3*50 + 34).
    assert batches[3][0] == (50, 544, 960) and batches[3][1] == 34


def test_minmax_and_eigenface_dump(tmp_path, rng):
    x = rng.normal(0, 1, (16,))
    u = minmax_to_u8(x)
    assert u.min() == 0 and u.max() == 255
    assert (minmax_to_u8(np.zeros(4)) == 0).all()
    comps = rng.normal(0, 1, (3, 16))
    paths = save_eigenface_images(
        comps, rng.normal(0, 1, 16), (4, 4), str(tmp_path), prefix="p_", top_k=2
    )
    assert os.path.basename(paths[0]) == "p_mean_face.jpg"
    assert os.path.basename(paths[1]) == "p_eigenface_01.jpg"
    assert len(paths) == 3
    assert cv2.imread(paths[0]) is not None


def test_counters_summary_wording():
    c = Counters()
    for _ in range(4):
        c.inc("frames")
    c.inc("frames_with_detection", 2)
    c.inc("frames_recognized", 1)
    s = c.recognition_summary()
    assert "Total frames processed: 4" in s
    assert "Recognition rate: 50.0%" in s


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a:" in t.summary()


def test_reference_positions_sorted_by_frame_diff():
    """Priors come back closest-frame-first (stable within ties), like
    the reference's sort (scan-template-v2.py:158-159) -- the order that
    decides confidence ties and the recorded ref_frame_diff."""
    faces = [
        DetectionRecord(i, f, 0, 0, 0, 10, 10, 5, 5, 100, "", "")
        for i, f in enumerate([0, 4, 9, 5, 7, 3])
    ]
    det = DetectionFile("v", 30, 30, len(faces), "", faces)
    near = reference_positions(det, 5, tolerance=5)
    assert [r.frame_number for r in near] == [5, 4, 7, 3, 9, 0]
    # Stable: equal diffs keep file order (4 before 7? diff 1 vs 2 --
    # use the 3/7 pair, both diff 2: 7 appears before 3 in the file).
    diffs = [abs(r.frame_number - 5) for r in near]
    assert diffs == sorted(diffs)

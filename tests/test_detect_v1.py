"""v1 detection generation: 20px-padded 100x100 crops, resumable ids,
metadata JSON, and round-trip v1 training on its own output
(reference ``useless/detection.py``)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def v1_output(reference_root, tmp_path_factory):
    from face_detection_recognization_pca_tpu.pipeline.detect_app import (
        detect_video_v1,
    )

    out = tmp_path_factory.mktemp("v1det") / "TestPerson_version"
    meta = detect_video_v1(
        os.path.join(reference_root, "videos/test.mp4"),
        str(out),
        "TestPerson",
        max_frames=8,
    )
    return out, meta


def test_v1_artifacts_shape(v1_output):
    """Crops are Light_version-shaped: 100x100 BGR JPEGs named
    {person}_face_{id:04d}.jpg (useless/detection.py:103-115)."""
    import cv2

    out, meta = v1_output
    assert len(meta["faces"]) > 0
    jpgs = sorted(p for p in os.listdir(out) if p.endswith(".jpg"))
    assert jpgs, "no crops written"
    assert jpgs[0] == "TestPerson_face_0001.jpg"  # ids start at 1
    img = cv2.imread(str(out / jpgs[0]))
    assert img.shape == (100, 100, 3)
    # metadata records match the files on disk.
    assert {f["filename"] for f in meta["faces"]} == set(jpgs)
    rec = meta["faces"][0]
    assert rec["face_size"] == {"width": 100, "height": 100}
    assert set(rec["bbox"]) == {"x", "y", "width", "height"}
    assert rec["frame_number"] >= 1  # v1 frame numbering is 1-based


def test_v1_metadata_json(v1_output):
    out, meta = v1_output
    path = out / "test_metadata.json"  # {video_stem}_metadata.json
    assert path.exists()
    saved = json.loads(path.read_text())
    assert saved["video_name"] == "test.mp4"
    assert saved["person_name"] == "TestPerson"
    assert len(saved["faces"]) == len(meta["faces"])


def test_v1_resumable_ids(v1_output, reference_root):
    """A second run continues numbering after the existing max id
    (useless/detection.py:8-35)."""
    from face_detection_recognization_pca_tpu.pipeline.detect_app import (
        detect_video_v1,
        next_face_id,
    )

    out, meta = v1_output
    first_max = max(f["face_id"] for f in meta["faces"])
    assert next_face_id(str(out), "TestPerson") == first_max + 1
    meta2 = detect_video_v1(
        os.path.join(reference_root, "videos/test.mp4"),
        str(out),
        "TestPerson",
        max_frames=2,
    )
    ids2 = [f["face_id"] for f in meta2["faces"]]
    assert ids2 and min(ids2) == first_max + 1


def test_v1_padding_clamped(reference_root, tmp_path):
    """Boxes near the frame edge clamp the 20 px padding instead of
    reading out of bounds (useless/detection.py:103-107)."""
    from face_detection_recognization_pca_tpu.pipeline.detect_app import (
        detect_video_v1,
    )

    class EdgeDetector:
        def detect_multi_scale(self, gray, *a, **k):
            h, w = gray.shape
            return [(0, 0, 40, 40), (w - 40, h - 40, 40, 40)]

    meta = detect_video_v1(
        os.path.join(reference_root, "videos/test.mp4"),
        str(tmp_path),
        "Edge",
        detector=EdgeDetector(),
        max_frames=1,
    )
    assert len(meta["faces"]) == 2  # both edge crops survived


def test_v1_round_trip_training(v1_output):
    """train_v1_version consumes the generated directory exactly like
    the shipped Light_version (useless/train.py flow)."""
    from face_detection_recognization_pca_tpu.io.artifacts import load_model
    from face_detection_recognization_pca_tpu.models import eigenfaces as ef
    from face_detection_recognization_pca_tpu.pipeline.v1_apps import (
        train_v1_version,
    )

    out, meta = v1_output
    model_dir = str(out.parent / "models")
    path = train_v1_version(
        str(out), "TestPerson", model_dir, version="gen", n_components=4
    )
    art = load_model(path)
    assert art.mean_face.shape == (100 * 100,)
    model = ef.from_artifact(art, dtype=np.float64)
    # Self-recognition on a training crop.
    import cv2

    crop = cv2.imread(
        str(out / meta["faces"][0]["filename"]), cv2.IMREAD_GRAYSCALE
    )
    ids, conf = ef.recognize(
        model, crop.astype(np.float64)[None], threshold=0.7
    )
    assert float(conf[0]) > 0.9999

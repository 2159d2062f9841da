"""Batched v4 multi-model scan == per-frame scan, record for record."""

import os

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def planted_video(reference_root, tmp_path_factory):
    """Synthetic video with a real Joseph_Lai crop planted at varying
    (non-border) positions; recognized against the shipped v2 model."""
    rng = np.random.default_rng(1234)
    from face_detection_recognization_pca_tpu.io.video import VideoWriter

    crop = cv2.imread(
        os.path.join(
            reference_root, "faces/lock_version/Joseph_Lai/face_000000_frame_000000.jpg"
        ),
        cv2.IMREAD_GRAYSCALE,
    )
    if crop is None:
        import glob

        crop = cv2.imread(
            sorted(
                glob.glob(
                    os.path.join(
                        reference_root, "faces/lock_version/Joseph_Lai/face_*.jpg"
                    )
                )
            )[0],
            cv2.IMREAD_GRAYSCALE,
        )
    face = cv2.resize(crop, (128, 128))
    path = str(tmp_path_factory.mktemp("bscan") / "planted.mp4")
    w = VideoWriter(path, (640, 480), 10.0)
    positions = [(200, 150), (220, 160), (260, 180), (240, 170), (210, 155)]
    for (x, y) in positions:
        frame = rng.normal(90, 8, (480, 640, 3)).astype(np.uint8)
        frame[y : y + 128, x : x + 128] = face[..., None]
        w.write(frame)
    w.close()
    return path, positions


def test_batched_equals_per_frame(planted_video, reference_root):
    from face_detection_recognization_pca_tpu.pipeline.scan_app import (
        scan_multimodel,
        scan_multimodel_batched,
    )

    path, positions = planted_video
    lock = os.path.join(reference_root, "faces/lock_version")
    per_frame = scan_multimodel(path, lock_dir=lock, max_frames=5)
    batched = scan_multimodel_batched(
        path, lock_dir=lock, max_frames=5, batch_frames=3
    )
    # Identical records; confidences agree to float-reduction noise
    # (batch size changes XLA's reduction order by design).
    assert len(per_frame) == len(batched)
    for a, b in zip(per_frame, batched):
        for key in ("frame_number", "person_name", "x", "y", "width", "height"):
            assert a[key] == b[key]
        for key in ("template_confidence", "pca_confidence", "final_confidence"):
            assert abs(a[key] - b[key]) < 1e-5
    assert len(batched) == 5
    assert all(r["person_name"] == "Joseph_Lai" for r in batched)
    # Boxes track the plants.
    for r, (x, y) in zip(batched, positions):
        assert abs(r["x"] - x) <= 26 and abs(r["y"] - y) <= 26


def test_batched_tail_batch(planted_video, reference_root):
    """A final partial batch (5 frames, batch=4) flushes correctly."""
    from face_detection_recognization_pca_tpu.pipeline.scan_app import (
        scan_multimodel_batched,
    )

    path, _ = planted_video
    lock = os.path.join(reference_root, "faces/lock_version")
    out = scan_multimodel_batched(
        path, lock_dir=lock, max_frames=5, batch_frames=4
    )
    assert [r["frame_number"] for r in out] == [0, 1, 2, 3, 4]

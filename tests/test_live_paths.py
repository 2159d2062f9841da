"""Live/webcam code paths: clean failures without camera hardware."""

import os

import pytest


def test_record_camera_no_device(tmp_path):
    from face_detection_recognization_pca_tpu.io.video import record_camera

    with pytest.raises(IOError, match="camera"):
        record_camera(str(tmp_path / "o.mp4"), seconds=0.1, camera_index=99)


def test_scan_multimodel_live_no_camera(reference_root):
    from face_detection_recognization_pca_tpu.pipeline.scan_app import (
        scan_multimodel,
    )

    with pytest.raises(IOError, match="camera"):
        scan_multimodel(
            99,
            lock_dir=os.path.join(reference_root, "faces/lock_version"),
            max_frames=1,
        )


def test_run_pipeline_live_requires_camera(tmp_path, monkeypatch):
    from face_detection_recognization_pca_tpu.pipeline.run_pipeline import (
        run_pipeline,
    )

    monkeypatch.chdir(tmp_path)
    with pytest.raises((IOError, ValueError)):
        run_pipeline("nobody", live=True)


def test_run_pipeline_needs_video():
    from face_detection_recognization_pca_tpu.pipeline.run_pipeline import (
        run_pipeline,
    )

    with pytest.raises(ValueError, match="video_path"):
        run_pipeline("nobody")

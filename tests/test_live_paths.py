"""Live/webcam code paths: camera-mocked loops + clean failures
without camera hardware."""

import os

import pytest


@pytest.fixture(scope="module")
def live_workdir(reference_root, tmp_path_factory):
    """detect+train on test.mp4 so guided live mode has model+JSON."""
    cwd = os.getcwd()
    workdir = tmp_path_factory.mktemp("liveguided")
    os.chdir(workdir)
    try:
        from face_detection_recognization_pca_tpu.pipeline.run_pipeline import (
            run_pipeline,
        )

        run_pipeline(
            "livep",
            video_path=os.path.join(reference_root, "videos/test.mp4"),
            max_frames=6,
            scan=False,
        )
    finally:
        os.chdir(cwd)
    return workdir


def test_scan_live_guided_mocked_camera(live_workdir, reference_root):
    """Full guided live loop on replayed video frames: frame-0 priors
    (tolerance 10), 2.0x search window, 0.3 gate, overlay + records
    (reference scan-template-v2.py:298-423)."""
    from face_detection_recognization_pca_tpu.io.video import VideoReader
    from face_detection_recognization_pca_tpu.pipeline.scan_app import (
        scan_live_guided,
    )

    reader = VideoReader(os.path.join(reference_root, "videos/test.mp4"))
    out_path = str(live_workdir / "live_guided.mp4")
    results = scan_live_guided(
        "livep",
        lock_dir=str(live_workdir / "faces/lock_version"),
        output_path=out_path,
        max_frames=5,
        frame_source=reader.frames(),
    )
    reader.close()
    # Training frames replayed as "camera" frames: every frame must clear
    # the 0.3 live gate and self-recognize.
    assert len(results) == 5
    assert all(r["template_match_confidence"] > 0.3 for r in results)
    assert all(r["person_name"] == "livep" for r in results)
    for key in (
        "frame_number",
        "x",
        "y",
        "width",
        "height",
        "person_id",
        "person_name",
        "confidence",
        "template_match_confidence",
    ):
        assert key in results[0]
    assert os.path.exists(out_path) and os.path.getsize(out_path) > 0


def test_scan_live_guided_no_camera(live_workdir):
    from face_detection_recognization_pca_tpu.pipeline.scan_app import (
        scan_live_guided,
    )

    with pytest.raises(IOError, match="camera"):
        scan_live_guided(
            "livep",
            lock_dir=str(live_workdir / "faces/lock_version"),
            camera_index=99,
            max_frames=1,
        )


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

"""Tracked batch scanning on the real reference video."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_workdir(reference_root, tmp_path_factory):
    """detect+train once on test.mp4 so the tracker has a model+JSON."""
    cwd = os.getcwd()
    workdir = tmp_path_factory.mktemp("tracked")
    os.chdir(workdir)
    try:
        from face_detection_recognization_pca_tpu.pipeline.run_pipeline import (
            run_pipeline,
        )

        run_pipeline(
            "trk",
            video_path=os.path.join(reference_root, "videos/test.mp4"),
            max_frames=6,
            scan=False,
        )
    finally:
        os.chdir(cwd)
    return workdir


def test_tracked_scan_locks_and_recognizes(trained_workdir, reference_root):
    from face_detection_recognization_pca_tpu.pipeline.tracked_scan import (
        scan_video_tracked,
    )

    results = scan_video_tracked(
        os.path.join(reference_root, "videos/test.mp4"),
        "trk",
        lock_dir=str(trained_workdir / "faces/lock_version"),
        output_json=str(trained_workdir / "tracked.json"),
        max_frames=32,
    )
    assert len(results) == 32
    # Tracker must lock onto the face region the Haar stage found
    # (~(355, 193) with a ~219 px box on test.mp4).
    tm = np.array([r["template_match_confidence"] for r in results])
    assert tm.mean() > 0.8
    xs = np.array([r["x"] for r in results])
    ys = np.array([r["y"] for r in results])
    assert abs(np.median(xs) - 355) < 60
    assert abs(np.median(ys) - 193) < 60
    # Record schema matches the guided scanner's.
    for key in (
        "frame_number",
        "timestamp",
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
    import json

    saved = json.load(open(trained_workdir / "tracked.json"))
    assert saved["engine"] == "tracked-multistream"
    assert saved["total_recognitions"] == 32

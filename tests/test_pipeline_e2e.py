"""End-to-end pipeline: detect -> train -> guided recognize on the
reference's real test video (SURVEY §4 test strategy, config 4)."""

import json
import os

import numpy as np
import pytest

from face_detection_recognization_pca_tpu.config import PipelineConfig
from face_detection_recognization_pca_tpu.io.artifacts import load_model
from face_detection_recognization_pca_tpu.io.detection_json import (
    read_detection_json,
)


@pytest.fixture(scope="module")
def pipeline_output(reference_root, tmp_path_factory):
    cwd = os.getcwd()
    workdir = tmp_path_factory.mktemp("e2e")
    os.chdir(workdir)
    try:
        from face_detection_recognization_pca_tpu.pipeline.run_pipeline import (
            run_pipeline,
        )

        out = run_pipeline(
            "pytest_person",
            video_path=os.path.join(reference_root, "videos/test.mp4"),
            max_frames=6,
        )
    finally:
        os.chdir(cwd)
    return workdir, out


def test_pipeline_produces_reference_layout(pipeline_output):
    workdir, out = pipeline_output
    pdir = workdir / "faces/lock_version/pytest_person"
    assert out["faces_detected"] >= 4
    # Reference artifact layout (detection-v4 + train-v4 naming).
    assert (pdir / "pytest_person_faces_detection.json").exists()
    assert (pdir / "face_model.pkl").exists()
    assert (pdir / "pytest_person_model_info.json").exists()
    assert (pdir / "pytest_person_mean_face.jpg").exists()
    assert (pdir / "pytest_person_eigenface_01.jpg").exists()
    crops = list(pdir.glob("face_*_frame_*.jpg"))
    assert len(crops) == out["faces_detected"]


def test_pipeline_detection_json_schema(pipeline_output):
    workdir, out = pipeline_output
    det = read_detection_json(
        str(
            workdir
            / "faces/lock_version/pytest_person/pytest_person_faces_detection.json"
        )
    )
    assert det.total_faces_detected == out["faces_detected"]
    r = det.faces[0]
    raw = json.load(
        open(
            workdir
            / "faces/lock_version/pytest_person/pytest_person_faces_detection.json"
        )
    )
    for key in (
        "face_id",
        "frame_number",
        "timestamp",
        "x",
        "y",
        "width",
        "height",
        "center_x",
        "center_y",
        "area",
        "image_path",
        "image_filename",
    ):
        assert key in raw["faces"][0]
    assert r.area == r.width * r.height


def test_pipeline_model_is_loadable_and_consistent(pipeline_output):
    workdir, out = pipeline_output
    art = load_model(
        str(workdir / "faces/lock_version/pytest_person/face_model.pkl")
    )
    assert art.schema == "v2"
    assert art.n_components == out["n_components"]
    assert art.components.shape == (art.n_components, 64 * 64)
    assert art.features.shape[0] == out["faces_detected"]
    # Self-recognition through the saved artifact: gallery crop 0 must
    # match itself at cosine ~1.
    import cv2

    from face_detection_recognization_pca_tpu.models import eigenfaces as ef
    from face_detection_recognization_pca_tpu.ops.similarity import cosine_gallery

    crop_path = art.face_info[0]["image_path"]
    if not os.path.isabs(crop_path):
        crop_path = str(workdir / crop_path)
    crop = cv2.imread(crop_path)
    assert crop is not None, f"unreadable crop {crop_path}"
    model = ef.from_artifact(art, dtype=np.float64)
    feat = np.asarray(ef.extract_features(model, crop[None], exact=True))
    scores = np.asarray(cosine_gallery(feat, art.features.astype(np.float64)))[0]
    assert scores.argmax() == 0
    assert scores[0] > 0.9999


def test_pipeline_recognition_outputs(pipeline_output):
    workdir, out = pipeline_output
    assert (workdir / "output/recognition_output.mp4").exists()
    results = json.load(open(workdir / "output/recognition_results.json"))
    assert results["total_recognitions"] == out["recognitions"]
    assert results["results"], "no per-frame records"
    rec = results["results"][0]
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
        assert key in rec
    # Annotated video is decodable and same geometry as the input.
    import cv2

    cap = cv2.VideoCapture(str(workdir / "output/recognition_output.mp4"))
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 960
    cap.release()

"""Template-matching-as-detector generation (useless/scan-template.py):
raw TM_CCOEFF op oracle, multi-scale detector, and the dual-PCA scan
consumer on reference data."""

import os

import numpy as np
import pytest


def _numpy_ccoeff(frame, template):
    """Independent NumPy TM_CCOEFF: sum over window of
    (T - meanT) * (I - mean I_win), the cv2.TM_CCOEFF definition."""
    fh, fw = frame.shape
    th, tw = template.shape
    t0 = template - template.mean()
    out = np.zeros((fh - th + 1, fw - tw + 1))
    for y in range(out.shape[0]):
        for x in range(out.shape[1]):
            win = frame[y : y + th, x : x + tw]
            out[y, x] = np.sum(t0 * (win - win.mean()))
    return out


def test_ccoeff_op_matches_numpy(rng):
    """ops.match.match_template_ccoeff == the textbook definition."""
    import jax.numpy as jnp

    from face_detection_recognization_pca_tpu.ops.match import (
        match_template_ccoeff,
    )

    frame = rng.normal(100, 30, (40, 48)).astype(np.float64)
    template = rng.normal(100, 30, (9, 11)).astype(np.float64)
    got = np.asarray(
        match_template_ccoeff(jnp.asarray(frame), jnp.asarray(template))
    )
    want = _numpy_ccoeff(frame, template)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-6)


def test_ccoeff_op_fft_path_matches_direct(rng):
    from face_detection_recognization_pca_tpu.ops.match import (
        match_template_ccoeff,
    )
    import jax.numpy as jnp

    frame = jnp.asarray(rng.normal(100, 30, (70, 90)).astype(np.float32))
    template = jnp.asarray(rng.normal(100, 30, (40, 40)).astype(np.float32))
    direct = np.asarray(match_template_ccoeff(frame, template, "direct"))
    fft = np.asarray(match_template_ccoeff(frame, template, "fft"))
    np.testing.assert_allclose(fft, direct, rtol=2e-4, atol=2.0)


@pytest.fixture(scope="module")
def light_template(reference_root):
    import cv2

    path = os.path.join(
        reference_root, "faces/Light_version/Joseph_Lai_face_0001.jpg"
    )
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    assert img is not None and img.shape == (100, 100)
    return img


def test_detector_finds_planted_template(light_template, rng):
    """Planted Light_version crop is the top NMS survivor at its
    location across the 5-scale sweep."""
    from face_detection_recognization_pca_tpu.detect.ccoeff import (
        CcoeffTemplateDetector,
    )

    frame = rng.normal(90, 8, (320, 360)).astype(np.uint8)
    frame[120:220, 80:180] = light_template
    det = CcoeffTemplateDetector([light_template], max_candidates=64)
    boxes = det.detect(frame)
    assert boxes, "no detections"
    # Greedy NMS keeps the best candidate first; the planted position
    # must be among the survivors with the exact template size.
    hit = [
        b
        for b in boxes
        if abs(b[0] - 80) <= 3 and abs(b[1] - 120) <= 3 and b[2] == 100
    ]
    assert hit, f"planted box not found in {boxes[:5]}"


def test_detector_from_faces_dir_limit(reference_root, tmp_path):
    """<=10 templates per subdir, the reference loading rule."""
    import cv2

    from face_detection_recognization_pca_tpu.detect.ccoeff import (
        CcoeffTemplateDetector,
    )

    src = os.path.join(reference_root, "faces/Light_version")
    sub = tmp_path / "faces" / "person_a"
    sub.mkdir(parents=True)
    names = sorted(os.listdir(src))[:14]
    for n in names:
        img = cv2.imread(os.path.join(src, n))
        cv2.imwrite(str(sub / n), img)
    det = CcoeffTemplateDetector.from_faces_dir(str(tmp_path / "faces"))
    n_loaded = sum(int(t0.shape[0]) for _, t0 in det.groups)
    assert n_loaded == 10


def test_scan_dual_with_template_detector(
    reference_root, light_template, tmp_path, rng
):
    """The detector feeds dual-PCA recognition end-to-end: synthetic
    video with a planted (enlarged) training crop, real shipped v1
    model, recognition recorded (useless/scan-template.py:448+)."""
    import cv2

    from face_detection_recognization_pca_tpu.detect.ccoeff import (
        CcoeffTemplateDetector,
    )
    from face_detection_recognization_pca_tpu.io.video import VideoWriter
    from face_detection_recognization_pca_tpu.pipeline.v1_apps import scan_dual

    big = cv2.resize(light_template, (220, 220))
    video_path = str(tmp_path / "planted.mp4")
    writer = VideoWriter(video_path, (480, 360), 10.0)
    for _ in range(3):
        frame = rng.normal(90, 8, (360, 480, 3)).astype(np.uint8)
        frame[60:280, 100:320] = big[..., None]
        writer.write(frame)
    writer.close()

    detector = CcoeffTemplateDetector([big], max_candidates=32)
    out = scan_dual(
        video_path,
        [os.path.join(reference_root, "models/Joseph_Lai_light_pca_model.pkl")],
        output_dir=str(tmp_path / "out"),
        detector=detector,
        max_frames=3,
    )
    c = out["counters"]
    assert c["frames"] == 3
    assert c["frames_with_detection"] == 3
    assert c["frames_recognized"] == 3
    assert os.path.exists(out["output_video"])

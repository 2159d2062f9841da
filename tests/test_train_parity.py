"""Golden TRAINING parity: retrain v1 on the reference's own stills and
match the shipped artifacts (BASELINE north star at the training level).

Oracles per version (VERDICT r4 items 4a + 10):

* light: shipped pickle ``models/Joseph_Lai_light_pca_model.pkl``
  (full tensor parity) + model-info EVR + eigenface/mean-face JPEGs;
* dark: the pickle is stripped (``.MISSING_LARGE_BLOBS:5``), so the
  oracles are ``models/Joseph_Lai_dark_model_info.json:8-19`` (EVR,
  rtol 1e-4) and the ten shipped ``Joseph_Lai_dark_eigenface_NN.jpg``
  dumps + mean face (writer ``useless/train.py:194-258``).
"""

import json
import os

import numpy as np
import pytest

from face_detection_recognization_pca_tpu.io.artifacts import load_model
from face_detection_recognization_pca_tpu.pipeline.v1_apps import (
    train_v1_version,
)

_VERSIONS = [("light", "Light_version"), ("dark", "Dark_version")]


@pytest.fixture(scope="module")
def retrained(reference_root, tmp_path_factory):
    """Retrain each v1 version once per module; later tests share it."""
    out = {}
    for version, subdir in _VERSIONS:
        faces = os.path.join(reference_root, "faces", subdir)
        if not os.path.isdir(faces):
            continue
        model_dir = str(tmp_path_factory.mktemp(f"v1_{version}"))
        train_v1_version(
            faces, "Joseph_Lai", model_dir, version, n_components=50
        )
        out[version] = model_dir
    return out


@pytest.mark.parametrize("version,subdir", _VERSIONS)
def test_v1_retraining_reproduces_shipped_model(
    reference_root, retrained, version, subdir
):
    if version not in retrained:
        pytest.skip(f"faces/{subdir} missing")
    model_dir = retrained[version]

    # EVR parity vs the shipped model-info JSON (both versions; the only
    # numeric oracle for dark, whose pickle was stripped from the repo).
    meta = json.load(
        open(os.path.join(model_dir, f"Joseph_Lai_{version}_model_info.json"))
    )
    assert meta["n_components"] == 50
    assert meta["face_dimensions"] == 10000
    assert len(meta["explained_variance_ratio"]) == 10
    ref_meta_path = os.path.join(
        reference_root, f"models/Joseph_Lai_{version}_model_info.json"
    )
    assert os.path.exists(ref_meta_path), "shipped model-info JSON missing"
    ref_meta = json.load(open(ref_meta_path))
    assert meta["n_training_images"] == ref_meta["n_training_images"]
    np.testing.assert_allclose(
        meta["explained_variance_ratio"],
        ref_meta["explained_variance_ratio"][:10],
        rtol=1e-4,
    )

    # Full tensor parity vs the shipped pickle where it survives.
    shipped_path = os.path.join(
        reference_root, f"models/Joseph_Lai_{version}_pca_model.pkl"
    )
    if not os.path.exists(shipped_path):
        return  # dark: pickle stripped; EVR + JPEG oracles stand in
    ours = load_model(
        os.path.join(model_dir, f"Joseph_Lai_{version}_pca_model.pkl")
    )
    ref = load_model(shipped_path)
    assert ours.training_filenames == ref.training_filenames
    np.testing.assert_allclose(ours.eigenvalues, ref.eigenvalues, rtol=1e-6)
    # eigh sign ambiguity: fix per component, then demand 1e-5 relative.
    signs = np.sign(np.sum(ours.features * ref.features, axis=0))
    scale = np.abs(ref.features).max()
    np.testing.assert_allclose(
        ours.features * signs, ref.features, atol=2e-5 * scale
    )
    np.testing.assert_allclose(
        ours.components * signs[:, None], ref.components, atol=1e-5
    )


@pytest.mark.parametrize("version,subdir", _VERSIONS)
def test_v1_eigenface_jpegs_match_shipped(
    reference_root, retrained, version, subdir
):
    """Shipped eigenface/mean-face JPEG parity (VERDICT r4 item 10).

    Pins the min-max u8 normalization + component ordering of our dumps
    (writers ``train-v4.py:163-177``, ``useless/train.py:194-258``)
    against ``models/Joseph_Lai_{version}_{eigenface_NN,mean_face}.jpg``.
    eigh sign flips invert the min-max image (x -> 255 - x), so each
    component is compared under the better of the two polarities.  The
    tolerance absorbs JPEG codec drift (reference: opencv 4.8 encoder;
    ours: opencv 5.0) but fails on wrong ordering or normalization
    (a swapped component pair measures MAE > 30 on these assets).
    """
    import cv2

    if version not in retrained:
        pytest.skip(f"faces/{subdir} missing")
    model_dir = retrained[version]

    def read(path):
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        assert img is not None, path
        return img.astype(np.float64)

    ref_mean = os.path.join(
        reference_root, f"models/Joseph_Lai_{version}_mean_face.jpg"
    )
    assert os.path.exists(ref_mean), "shipped mean-face JPEG missing"
    ours_mean = read(
        os.path.join(model_dir, f"Joseph_Lai_{version}_mean_face.jpg")
    )
    mae = np.abs(ours_mean - read(ref_mean)).mean()
    assert mae < 2.0, f"mean-face MAE {mae:.2f}"

    for i in range(1, 11):
        ref_p = os.path.join(
            reference_root,
            f"models/Joseph_Lai_{version}_eigenface_{i:02d}.jpg",
        )
        assert os.path.exists(ref_p), ref_p
        ref_img = read(ref_p)
        our_img = read(
            os.path.join(
                model_dir, f"Joseph_Lai_{version}_eigenface_{i:02d}.jpg"
            )
        )
        mae = min(
            np.abs(our_img - ref_img).mean(),
            np.abs((255.0 - our_img) - ref_img).mean(),
        )
        assert mae < 6.0, f"eigenface {i:02d} MAE {mae:.2f}"

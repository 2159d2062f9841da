"""Golden TRAINING parity: retrain v1 on the reference's own stills and
match the shipped pickle (BASELINE north star at the training level)."""

import os

import numpy as np
import pytest

from face_detection_recognization_pca_tpu.io.artifacts import load_model
from face_detection_recognization_pca_tpu.pipeline.v1_apps import (
    train_v1_version,
)


@pytest.mark.parametrize("version,subdir", [("light", "Light_version")])
def test_v1_retraining_reproduces_shipped_model(
    reference_root, tmp_path, version, subdir
):
    shipped_path = os.path.join(
        reference_root, f"models/Joseph_Lai_{version}_pca_model.pkl"
    )
    if not os.path.exists(shipped_path):
        pytest.skip("shipped model missing")
    model_dir = str(tmp_path)
    train_v1_version(
        os.path.join(reference_root, "faces", subdir),
        "Joseph_Lai",
        model_dir,
        version,
        n_components=50,
    )
    ours = load_model(
        os.path.join(model_dir, f"Joseph_Lai_{version}_pca_model.pkl")
    )
    ref = load_model(shipped_path)

    assert ours.training_filenames == ref.training_filenames
    np.testing.assert_allclose(
        ours.eigenvalues, ref.eigenvalues, rtol=1e-6
    )
    # eigh sign ambiguity: fix per component, then demand 1e-5 relative.
    signs = np.sign(np.sum(ours.features * ref.features, axis=0))
    scale = np.abs(ref.features).max()
    np.testing.assert_allclose(
        ours.features * signs, ref.features, atol=2e-5 * scale
    )
    np.testing.assert_allclose(
        ours.components * signs[:, None],
        ref.components,
        atol=1e-5,
    )
    # Info JSON exists with the v1 metadata layout.
    import json

    meta = json.load(
        open(os.path.join(model_dir, f"Joseph_Lai_{version}_model_info.json"))
    )
    assert meta["n_components"] == 50
    assert meta["face_dimensions"] == 10000
    assert len(meta["explained_variance_ratio"]) == 10
    # Matches the shipped model-info EVR values (BASELINE.md rows).
    ref_meta_path = os.path.join(
        reference_root, f"models/Joseph_Lai_{version}_model_info.json"
    )
    if os.path.exists(ref_meta_path):
        ref_meta = json.load(open(ref_meta_path))
        np.testing.assert_allclose(
            meta["explained_variance_ratio"],
            ref_meta["explained_variance_ratio"][:10],
            rtol=1e-4,
        )

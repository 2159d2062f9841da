"""Artifact layer: sklearn-free unpickling, both schemas, roundtrips."""

import os

import numpy as np
import pytest

from face_detection_recognization_pca_tpu.io.artifacts import (
    EigenfacesArtifact,
    _shim_loads,
    load_model,
    save_model_v1,
    save_model_v2,
)
from face_detection_recognization_pca_tpu.io.sklearn_shim import (
    PCAShim,
    StandardScalerShim,
)


def test_shim_unpickler_substitutes_sklearn(reference_root):
    path = os.path.join(
        reference_root, "faces/lock_version/Joseph_Lai/face_model.pkl"
    )
    with open(path, "rb") as f:
        raw = _shim_loads(f.read())
    pca = raw.get("pca", raw.get("pca_model"))
    assert isinstance(pca, PCAShim)
    assert isinstance(raw["scaler"], StandardScalerShim)
    # Shim transform == manual math.
    x = np.random.default_rng(0).normal(0, 1, (3, 4096))
    scaled = raw["scaler"].transform(x)
    np.testing.assert_allclose(
        scaled, (x - raw["scaler"].mean_) / raw["scaler"].scale_, rtol=1e-12
    )
    np.testing.assert_allclose(
        pca.transform(scaled), (scaled - pca.mean_) @ pca.components_.T, rtol=1e-12
    )


def test_load_v1_schema(reference_root):
    art = load_model(
        os.path.join(reference_root, "models/Joseph_Lai_light_pca_model.pkl")
    )
    assert art.schema == "v1"
    assert art.components.shape == (50, 10000)
    assert art.features.shape[1] == 50
    assert art.face_shape == (100, 100)
    assert art.person_name == "Joseph_Lai"


def test_load_v2_schema_accepts_pca_model_key(reference_root):
    art = load_model(
        os.path.join(reference_root, "faces/lock_version/Joseph_Lai/face_model.pkl")
    )
    assert art.schema == "v2"
    assert art.components.shape == (76, 4096)
    assert art.scaler_mean is not None and art.scaler_scale is not None
    assert art.projection_mean is not None
    assert art.face_shape == (64, 64)
    assert "Joseph_Lai" in art.person_id_map


def _fake_artifact(schema, rng):
    k, d, n = 5, 36, 12
    comps = rng.normal(0, 1, (k, d))
    return EigenfacesArtifact(
        components=comps,
        mean_face=rng.normal(128, 10, d),
        features=rng.normal(0, 1, (n, k)),
        labels=np.zeros(n, dtype=np.int64),
        person_id_map={"tester": 0},
        face_shape=(6, 6),
        n_components=k,
        schema=schema,
        scaler_mean=rng.normal(128, 5, d) if schema == "v2" else None,
        scaler_scale=np.abs(rng.normal(30, 5, d)) + 1 if schema == "v2" else None,
        projection_mean=rng.normal(0, 1, d),
        eigenvalues=np.sort(np.abs(rng.normal(0, 1, k)))[::-1],
        explained_variance_ratio=np.full(k, 1.0 / k),
        person_name="tester",
        version="light",
    )


def test_v1_roundtrip(tmp_path, rng):
    art = _fake_artifact("v1", rng)
    p = str(tmp_path / "m.pkl")
    save_model_v1(art, p)
    back = load_model(p)
    assert back.schema == "v1"
    np.testing.assert_allclose(back.components, art.components, rtol=1e-12)
    np.testing.assert_allclose(back.features, art.features, rtol=1e-12)
    np.testing.assert_allclose(back.eigenvalues, art.eigenvalues, rtol=1e-12)


def test_v2_roundtrip(tmp_path, rng):
    art = _fake_artifact("v2", rng)
    p = str(tmp_path / "face_model.pkl")
    save_model_v2(art, p)
    back = load_model(p)
    assert back.schema == "v2"
    np.testing.assert_allclose(back.components, art.components, rtol=1e-12)
    np.testing.assert_allclose(back.scaler_scale, art.scaler_scale, rtol=1e-12)
    np.testing.assert_allclose(back.projection_mean, art.projection_mean, rtol=1e-12)
    assert back.person_id_map == art.person_id_map


def test_v2_writer_loadable_by_sklearn(tmp_path, rng):
    """Models we write must unpickle into *real* sklearn estimators so the
    reference scripts could consume them unchanged."""
    sklearn = pytest.importorskip("sklearn")
    import pickle

    art = _fake_artifact("v2", rng)
    p = str(tmp_path / "face_model.pkl")
    save_model_v2(art, p)
    with open(p, "rb") as f:
        raw = pickle.load(f)
    from sklearn.decomposition import PCA

    assert isinstance(raw["pca"], PCA)
    x = rng.normal(0, 1, (2, art.components.shape[1]))
    np.testing.assert_allclose(
        raw["pca"].transform(x),
        (x - art.projection_mean) @ art.components.T,
        rtol=1e-10,
    )

"""PCA / scaler numerics: sklearn + manual-NumPy equivalence."""

import numpy as np
import pytest

from face_detection_recognization_pca_tpu.linalg.pca import (
    project,
    scaled_pca,
    snapshot_pca,
)
from face_detection_recognization_pca_tpu.linalg.standardize import (
    scaler_fit,
    scaler_transform,
)


def _numpy_snapshot_pca(x, k):
    """Independent NumPy oracle for the v1 snapshot math
    (semantics of reference useless/train.py:56-128)."""
    mean = x.mean(axis=0)
    xc = x - mean
    n, d = x.shape
    g = xc @ xc.T / (n - 1)
    w, v = np.linalg.eigh(g)
    order = np.argsort(w)[::-1]
    w, v = w[order][:k], v[:, order][:, :k]
    u = xc.T @ v
    u /= np.linalg.norm(u, axis=0)
    return u, mean, xc @ u, w


def test_scaler_matches_sklearn(rng):
    from sklearn.preprocessing import StandardScaler

    x = rng.normal(100.0, 30.0, (40, 64))
    x[:, 0] = 7.0  # constant feature -> scale 1 guard
    ours = scaler_fit(x)
    sk = StandardScaler().fit(x)
    np.testing.assert_allclose(np.asarray(ours.mean), sk.mean_, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ours.scale), sk.scale_, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(scaler_transform(x, ours)), sk.transform(x), rtol=1e-10
    )


def test_snapshot_pca_matches_numpy_oracle(rng):
    x = rng.normal(128.0, 40.0, (30, 200))
    k = 10
    res = snapshot_pca(x, k)
    u, mean, proj, w = _numpy_snapshot_pca(x, k)
    np.testing.assert_allclose(np.asarray(res.mean), mean, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(res.eigenvalues), w, rtol=1e-8)
    # eigh signs are arbitrary per column: compare |.| and sign-fixed.
    ours = np.asarray(res.components).T  # (d, k)
    signs = np.sign(np.sum(ours * u, axis=0))
    np.testing.assert_allclose(ours * signs, u, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(res.projected) * signs, proj, atol=1e-6
    )


def test_scaled_pca_matches_sklearn_full(rng):
    from sklearn.decomposition import PCA

    x = rng.normal(0.0, 1.0, (50, 120))
    k = 20
    res = scaled_pca(x, k)
    sk = PCA(n_components=k, svd_solver="full").fit(x)
    np.testing.assert_allclose(
        np.asarray(res.components), sk.components_, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(res.eigenvalues), sk.explained_variance_, rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(res.explained_variance_ratio),
        sk.explained_variance_ratio_,
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(res.projected), sk.transform(x), atol=1e-8
    )


def test_snapshot_vs_svd_same_subspace(rng):
    """The Gram trick and the SVD span the same eigenspace: projections
    agree up to per-component sign when eigenvalues are distinct."""
    x = rng.normal(0.0, 1.0, (25, 80))
    k = 8
    snap = snapshot_pca(x, k)
    full = scaled_pca(x, k)
    a = np.asarray(snap.projected)
    b = np.asarray(full.projected)
    signs = np.sign(np.sum(a * b, axis=0))
    np.testing.assert_allclose(a * signs, b, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(snap.eigenvalues), np.asarray(full.eigenvalues), rtol=1e-8
    )


def test_project_roundtrip(rng):
    x = rng.normal(0.0, 1.0, (20, 60))
    res = snapshot_pca(x, 5)
    p = project(x, res.mean, res.components)
    np.testing.assert_allclose(p, np.asarray(res.projected), atol=1e-9)

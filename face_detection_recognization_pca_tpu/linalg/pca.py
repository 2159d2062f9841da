"""PCA engines as batched dense linear algebra on the MXU.

Two engines, matching the reference's two training generations:

* :func:`snapshot_pca` -- the v1 "manual" path (reference
  ``useless/train.py:56-128``): center, then if ``n < d`` form the
  n x n Gram matrix ``Xc Xc^T / (n-1)``, ``eigh`` it, back-project the
  eigenvectors through ``Xc^T`` and L2-normalize; otherwise ``eigh`` the
  d x d covariance.  Components are returned **column-major**
  ``(d, k)`` exactly like the v1 pickle schema (``eigenfaces (10000, 50)``).

* :func:`scaled_pca` -- sklearn ``PCA.fit`` semantics (reference
  ``train-v4.py:110-146``): center (the caller standardizes first),
  SVD, deterministic sign fix (``svd_flip``: largest-|u| row of each
  left singular vector made positive), components **row-major**
  ``(k, d)`` like ``PCA.components_``.

Both are pure jittable functions: the Gram/covariance matmuls and the
back-projection run on the MXU; ``eigh``/SVD of the small k x k / n x n
system uses XLA's eigensolver.  For multi-chip training the Gram matrix
is assembled with ``psum`` over row-shards (see
:mod:`..parallel.sharding`).

Eigenvector sign convention: ``eigh`` signs are arbitrary per column;
parity tests compare projections up to per-component sign, and the
artifact writers persist whatever basis was produced (the reference has
the same ambiguity between runs).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class PCAResult(NamedTuple):
    """Unified PCA output.

    components: ``(k, d)`` row eigenvectors (transpose of the v1 layout).
    mean: ``(d,)`` feature mean of the training matrix.
    projected: ``(n, k)`` training data in eigenspace.
    eigenvalues: ``(k,)`` descending variances along components.
    explained_variance_ratio: ``(k,)`` eigenvalue / total-variance.
    """

    components: jnp.ndarray
    mean: jnp.ndarray
    projected: jnp.ndarray
    eigenvalues: jnp.ndarray
    explained_variance_ratio: jnp.ndarray


def snapshot_pca(x: jnp.ndarray, n_components: Optional[int] = None) -> PCAResult:
    """Gram-trick (snapshot) PCA, v1-parity.

    Args:
      x: ``(n, d)`` data matrix (float32/float64).
      n_components: top-k to keep; default ``min(n - 1, d)`` like the
        reference (``useless/train.py:111-112``).  Must be static.

    Returns:
      :class:`PCAResult`.  ``components`` rows are unit-norm; eigenvalues
      are those of the (n-1)-normalized Gram matrix, matching
      ``np.linalg.eigh`` of ``Xc Xc^T/(n-1)`` sorted descending.
    """
    n, d = x.shape
    if n_components is None:
        n_components = min(n - 1, d)
    k = min(n_components, min(n, d))

    mean = jnp.mean(x, axis=0)
    xc = x - mean

    if n < d:
        gram = jnp.dot(xc, xc.T, preferred_element_type=x.dtype) / (n - 1)
        eigval, eigvec = jnp.linalg.eigh(gram)  # ascending
        # Descending order, exactly like argsort()[::-1] on eigh output.
        order = jnp.argsort(eigval)[::-1]
        eigval = eigval[order][:k]
        eigvec = eigvec[:, order][:, :k]  # (n, k)
        # Back-project: U = Xc^T V, then unit-normalize each column.
        comps = jnp.dot(xc.T, eigvec, preferred_element_type=x.dtype)  # (d, k)
        norms = jnp.linalg.norm(comps, axis=0)
        comps = comps / jnp.where(norms > 0, norms, 1.0)
        total = jnp.sum(jnp.asarray(eigval))  # reference ratio uses kept sum
        components = comps.T  # (k, d)
    else:
        cov = jnp.dot(xc.T, xc, preferred_element_type=x.dtype) / (n - 1)
        eigval, eigvec = jnp.linalg.eigh(cov)
        order = jnp.argsort(eigval)[::-1]
        eigval = eigval[order][:k]
        components = eigvec[:, order][:, :k].T  # (k, d)
        total = jnp.sum(jnp.asarray(eigval))

    projected = jnp.dot(xc, components.T, preferred_element_type=x.dtype)
    evr = eigval / total
    return PCAResult(components, mean, projected, eigval, evr)


def scaled_pca(x: jnp.ndarray, n_components: int) -> PCAResult:
    """sklearn-``PCA.fit`` parity on (already standardized) data.

    Full SVD of the centered matrix with sklearn's ``svd_flip`` sign
    convention (for each component, the entry of ``u[:, i]`` with the
    largest absolute value is made positive), eigenvalues
    ``s^2 / (n - 1)``, EVR against the *total* variance (all singular
    values), matching ``PCA.explained_variance_ratio_``.
    """
    n, d = x.shape
    k = min(n_components, min(n, d))
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    u, s, vt = jnp.linalg.svd(xc, full_matrices=False)
    # sklearn >=1.5 svd_flip(u_based_decision=False): per component row of
    # Vt, make the largest-|.| entry positive (deterministic w.r.t. data).
    max_idx = jnp.argmax(jnp.abs(vt), axis=1)
    signs = jnp.sign(vt[jnp.arange(vt.shape[0]), max_idx])
    signs = jnp.where(signs == 0, 1.0, signs)
    u = u * signs
    vt = vt * signs[:, None]

    eigval_all = (s * s) / (n - 1)
    total = jnp.sum(eigval_all)
    components = vt[:k]
    projected = u[:, :k] * s[:k]
    return PCAResult(
        components, mean, projected, eigval_all[:k], eigval_all[:k] / total
    )


def pca_fit(
    x: jnp.ndarray, n_components: Optional[int] = None, method: str = "auto"
) -> PCAResult:
    """Dispatch between engines (config knob ``TrainConfig.method``)."""
    if method == "snapshot":
        return snapshot_pca(x, n_components)
    if method == "scaled":
        assert n_components is not None
        return scaled_pca(x, n_components)
    if method == "auto":
        n, d = x.shape
        if n < d:
            return snapshot_pca(x, n_components)
        return scaled_pca(x, n_components or min(n, d))
    raise ValueError(f"unknown PCA method: {method!r}")


def project(
    x: jnp.ndarray, mean: jnp.ndarray, components: jnp.ndarray
) -> jnp.ndarray:
    """Project feature vectors into eigenspace: ``(x - mean) @ C^T``.

    Matches both sklearn ``PCA.transform`` (``components`` is (k, d))
    and the v1 manual projection ``Xc @ eigenfaces`` (pass the pickle's
    (d, k) eigenfaces transposed).
    """
    return jnp.dot(x - mean, components.T, preferred_element_type=x.dtype)

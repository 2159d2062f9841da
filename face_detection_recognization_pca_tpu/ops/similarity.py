"""Similarity ops: cosine with zero-norm guard, batched gallery scoring.

Parity targets: the reference's hand-rolled cosine
(``scripts/manual/scan-template-v2.py:233-258``: dot/(|a||b|), 0.0 if
either norm is zero) and sklearn's ``cosine_similarity`` used by the v4
scanner (``scan-template-v4.py:274``).  The gallery variant is expressed
as one (B,k)x(k,N) matmul so XLA tiles it on the MXU and fuses the
normalization; it is the inner loop of the fused projection-and-match
kernel.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Cosine similarity along the last axis with zero-norm guard -> 0."""
    dot = jnp.sum(a * b, axis=-1)
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    denom = na * nb
    return jnp.where(denom > eps, dot / jnp.where(denom > eps, denom, 1.0), 0.0)


def cosine_gallery(probes: jnp.ndarray, gallery: jnp.ndarray) -> jnp.ndarray:
    """All-pairs cosine scores.

    Args:
      probes: ``(B, k)`` feature vectors.
      gallery: ``(N, k)`` projected training features.

    Returns:
      ``(B, N)`` cosine similarity matrix; rows/cols with zero norm give 0.
    """
    dots = jnp.dot(probes, gallery.T, preferred_element_type=probes.dtype)
    np_ = jnp.linalg.norm(probes, axis=-1, keepdims=True)
    ng = jnp.linalg.norm(gallery, axis=-1, keepdims=True).T
    denom = np_ * ng
    safe = denom > 0
    return jnp.where(safe, dots / jnp.where(safe, denom, 1.0), 0.0)


def euclidean_gallery(probes: jnp.ndarray, gallery: jnp.ndarray) -> jnp.ndarray:
    """All-pairs L2 distances via the |a|^2 - 2ab + |b|^2 matmul identity."""
    p2 = jnp.sum(probes * probes, axis=-1, keepdims=True)
    g2 = jnp.sum(gallery * gallery, axis=-1, keepdims=True).T
    cross = jnp.dot(probes, gallery.T, preferred_element_type=probes.dtype)
    sq = jnp.maximum(p2 - 2.0 * cross + g2, 0.0)
    return jnp.sqrt(sq)


def best_match(
    scores: jnp.ndarray, labels: jnp.ndarray, threshold: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Argmax + threshold over gallery scores.

    Reference semantics (``scripts/manual/scan-template-v2.py:260-296``):
    the best gallery row decides the label; below-threshold matches
    return person id -1 ("unknown") but still report the similarity.

    Returns:
      ``(person_ids (B,), confidences (B,))``; first-max tie-breaking like
      ``np.argmax``.
    """
    idx = jnp.argmax(scores, axis=-1)
    conf = jnp.take_along_axis(scores, idx[..., None], axis=-1)[..., 0]
    ids = labels[idx]
    ids = jnp.where(conf >= threshold, ids, -1)
    return ids, conf

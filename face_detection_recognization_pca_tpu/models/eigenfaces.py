"""The eigenfaces model as a JAX pytree with pure train/project/recognize.

Where the reference keeps state inside ``FaceTrainer`` / ``FaceScanner``
objects and loops over gallery rows in Python
(``train-v4.py:11-146``, ``scripts/manual/scan-template-v2.py:205-296``),
here the model is a flat pytree of device arrays and every operation is
a jittable function over crop *batches*:

    crops (B,h,w) --resize/flatten--> (B,d) --scale--> --project-->
    (B,k) --cosine vs gallery (N,k)--> (B,N) --argmax/threshold--> ids

XLA fuses that chain into a couple of MXU matmuls; the same functions
vmap/pjit over streams and shard over meshes (see :mod:`..parallel`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from face_detection_recognization_pca_tpu.linalg.pca import (
    scaled_pca,
    snapshot_pca,
)
from face_detection_recognization_pca_tpu.linalg.standardize import (
    ScalerParams,
    scaler_fit,
    scaler_transform,
)
from face_detection_recognization_pca_tpu.ops.preprocess import preprocess_crops
from face_detection_recognization_pca_tpu.ops.similarity import (
    best_match,
    cosine_gallery,
)


@struct.dataclass
class EigenfacesModel:
    """Device-resident eigenfaces model (v1 or v2 pipeline).

    v1 (snapshot, center-only): ``scaler_mean/scaler_scale`` are None and
    ``projection_mean == mean_face`` (raw-pixel mean).
    v2 (scaled): scaler z-scores the flattened crop first, then the PCA
    projection subtracts ``projection_mean`` (mean of scaled data).
    """

    components: jnp.ndarray  # (k, d)
    projection_mean: jnp.ndarray  # (d,)
    mean_face: jnp.ndarray  # (d,) raw-pixel mean
    gallery: jnp.ndarray  # (N, k) projected training features
    labels: jnp.ndarray  # (N,) int32 person ids
    scaler_mean: Optional[jnp.ndarray] = None  # (d,) or None
    scaler_scale: Optional[jnp.ndarray] = None  # (d,) or None
    face_shape: Tuple[int, int] = struct.field(pytree_node=False, default=(64, 64))
    schema: str = struct.field(pytree_node=False, default="v2")

    @property
    def n_components(self) -> int:
        return self.components.shape[0]


def train_v1(
    images: jnp.ndarray, n_components: Optional[int] = 50
) -> Tuple[EigenfacesModel, dict]:
    """v1 snapshot-PCA training (reference ``useless/train.py:56-128``).

    Args:
      images: ``(n, d)`` flattened grayscale faces (no resize in v1).

    Returns:
      (model, aux) where aux carries eigenvalues/EVR for artifact dumps.
    """
    res = snapshot_pca(images, n_components)
    d = images.shape[1]
    side = int(round(d ** 0.5))
    model = EigenfacesModel(
        components=res.components,
        projection_mean=res.mean,
        mean_face=res.mean,
        gallery=res.projected,
        labels=jnp.zeros(images.shape[0], dtype=jnp.int32),
        scaler_mean=None,
        scaler_scale=None,
        face_shape=(side, side),
        schema="v1",
    )
    aux = {
        "eigenvalues": res.eigenvalues,
        "explained_variance_ratio": res.explained_variance_ratio,
    }
    return model, aux


def train_v2(
    images: jnp.ndarray,
    labels: jnp.ndarray,
    n_components: int = 50,
    face_shape: Tuple[int, int] = (64, 64),
) -> Tuple[EigenfacesModel, dict]:
    """v2 training: z-score + PCA (reference ``train-v4.py:110-146``).

    Args:
      images: ``(n, d)`` flattened crops (already resized to face_shape).
      labels: ``(n,)`` integer person ids.
    """
    scaler = scaler_fit(images)
    scaled = scaler_transform(images, scaler)
    res = scaled_pca(scaled, n_components)
    model = EigenfacesModel(
        components=res.components,
        projection_mean=res.mean,
        mean_face=jnp.mean(images, axis=0),
        gallery=res.projected,
        labels=labels.astype(jnp.int32),
        scaler_mean=scaler.mean,
        scaler_scale=scaler.scale,
        face_shape=tuple(face_shape),
        schema="v2",
    )
    aux = {
        "eigenvalues": res.eigenvalues,
        "explained_variance_ratio": res.explained_variance_ratio,
    }
    return model, aux


def extract_features(
    model: EigenfacesModel, crops: jnp.ndarray, exact: bool = False
) -> jnp.ndarray:
    """Crop batch -> eigenspace features; the reference's
    ``extract_face_features`` (``scan-template-v4.py:253-268``) fused.

    Args:
      crops: ``(B, h, w)`` grayscale or ``(B, h, w, 3)`` BGR crops.
    """
    h, w = model.face_shape
    dtype = model.components.dtype
    flat = preprocess_crops(crops, (w, h), exact=exact, dtype=dtype)
    if model.scaler_mean is not None:
        flat = scaler_transform(
            flat, ScalerParams(model.scaler_mean, model.scaler_scale)
        )
    return jnp.dot(
        flat - model.projection_mean,
        model.components.T,
        preferred_element_type=dtype,
    )


def project_vectors(model: EigenfacesModel, flat: jnp.ndarray) -> jnp.ndarray:
    """Already-flattened face vectors -> eigenspace (no resize)."""
    if model.scaler_mean is not None:
        flat = scaler_transform(
            flat, ScalerParams(model.scaler_mean, model.scaler_scale)
        )
    return jnp.dot(
        flat - model.projection_mean,
        model.components.T,
        preferred_element_type=model.components.dtype,
    )


def recognize(
    model: EigenfacesModel,
    crops: jnp.ndarray,
    threshold: float = 0.7,
    exact: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Crop batch -> (person_ids, confidences).

    Fuses feature extraction, gallery cosine, argmax and threshold --
    the whole ``recognize_face`` path of the reference
    (``scripts/manual/scan-template-v2.py:260-296``) as one XLA program.
    """
    feats = extract_features(model, crops, exact=exact)
    scores = cosine_gallery(feats, model.gallery)
    return best_match(scores, model.labels, threshold)


def from_artifact(art, dtype=jnp.float32) -> EigenfacesModel:
    """Load an :class:`..io.artifacts.EigenfacesArtifact` onto device."""
    return EigenfacesModel(
        components=jnp.asarray(art.components, dtype=dtype),
        projection_mean=jnp.asarray(
            art.projection_mean
            if art.projection_mean is not None
            else art.mean_face,
            dtype=dtype,
        ),
        mean_face=jnp.asarray(art.mean_face, dtype=dtype),
        gallery=jnp.asarray(art.features, dtype=dtype),
        labels=jnp.asarray(np.asarray(art.labels), dtype=jnp.int32),
        scaler_mean=jnp.asarray(art.scaler_mean, dtype=dtype)
        if art.scaler_mean is not None
        else None,
        scaler_scale=jnp.asarray(art.scaler_scale, dtype=dtype)
        if art.scaler_scale is not None
        else None,
        face_shape=tuple(art.face_shape),
        schema=art.schema,
    )


def to_artifact(model: EigenfacesModel, aux: Optional[dict] = None, **meta):
    """Device model -> serializable artifact (inverse of from_artifact)."""
    from face_detection_recognization_pca_tpu.io.artifacts import (
        EigenfacesArtifact,
    )

    aux = aux or {}
    return EigenfacesArtifact(
        components=np.asarray(model.components),
        mean_face=np.asarray(model.mean_face),
        features=np.asarray(model.gallery),
        labels=np.asarray(model.labels),
        person_id_map=meta.get("person_id_map", {}),
        face_shape=tuple(model.face_shape),
        n_components=model.components.shape[0],
        schema=model.schema,
        scaler_mean=np.asarray(model.scaler_mean)
        if model.scaler_mean is not None
        else None,
        scaler_scale=np.asarray(model.scaler_scale)
        if model.scaler_scale is not None
        else None,
        projection_mean=np.asarray(model.projection_mean),
        eigenvalues=np.asarray(aux["eigenvalues"])
        if "eigenvalues" in aux
        else None,
        explained_variance_ratio=np.asarray(aux["explained_variance_ratio"])
        if "explained_variance_ratio" in aux
        else None,
        person_name=meta.get("person_name"),
        version=meta.get("version"),
        training_date=meta.get("training_date"),
        face_info=meta.get("face_info"),
        training_filenames=meta.get("training_filenames"),
    )

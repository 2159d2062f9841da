"""Multi-model recognition: every person model evaluated in one fused op.

The reference loops over person models in Python, re-preprocessing the
crop per model (``scan-template-v4.py:289-319``).  Here all models are
stacked into padded device arrays once, and a crop batch is scored
against *every* model's gallery in a single jitted program:

    crops (B,h,w) -> flatten (B,d)
      -> per-model scale+project: (M,B,k)  [one batched matmul]
      -> cosine vs padded galleries (M,N,k) -> (M,B,N) masked
      -> per-model best row, then best model per crop

Padding: models may have different n_components and gallery sizes
(k=76 for the shipped Joseph_Lai model, k=n_faces for train-v5 models).
Components are zero-padded to k_max (zero rows contribute nothing to
projections) and galleries to n_max with -inf masking on the cosine.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from face_detection_recognization_pca_tpu.config import RecognizeConfig
from face_detection_recognization_pca_tpu.io.artifacts import EigenfacesArtifact
from face_detection_recognization_pca_tpu.ops.preprocess import preprocess_crops
from face_detection_recognization_pca_tpu.recognize.fusion import UNKNOWN


@dataclasses.dataclass
class ModelStack:
    """All person models stacked into padded arrays (device-ready)."""

    components: jnp.ndarray  # (M, k_max, d) zero-padded
    projection_mean: jnp.ndarray  # (M, d)
    scaler_mean: jnp.ndarray  # (M, d)
    scaler_scale: jnp.ndarray  # (M, d) -- ones when model has no scaler
    gallery: jnp.ndarray  # (M, n_max, k_max) zero-padded
    gallery_mask: jnp.ndarray  # (M, n_max) bool
    labels: jnp.ndarray  # (M, n_max) int32
    model_names: List[str]  # person/model name per stack row
    names_by_id: List[Dict[int, str]]  # per model
    face_shape: Tuple[int, int]

    @staticmethod
    def build(
        artifacts: Sequence[Tuple[str, EigenfacesArtifact]], dtype=np.float32
    ) -> "ModelStack":
        assert artifacts, "no models to stack"
        face_shape = tuple(artifacts[0][1].face_shape)
        d = artifacts[0][1].components.shape[1]
        k_max = max(a.components.shape[0] for _, a in artifacts)
        n_max = max(a.features.shape[0] for _, a in artifacts)
        m = len(artifacts)
        comps = np.zeros((m, k_max, d), dtype=dtype)
        pmean = np.zeros((m, d), dtype=dtype)
        smean = np.zeros((m, d), dtype=dtype)
        sscale = np.ones((m, d), dtype=dtype)
        gal = np.zeros((m, n_max, k_max), dtype=dtype)
        gmask = np.zeros((m, n_max), dtype=bool)
        labels = np.zeros((m, n_max), dtype=np.int32)
        names_by_id = []
        for i, (name, a) in enumerate(artifacts):
            if tuple(a.face_shape) != face_shape:
                raise ValueError("mixed face shapes in one stack")
            k = a.components.shape[0]
            n = a.features.shape[0]
            comps[i, :k] = a.components
            pmean[i] = (
                a.projection_mean if a.projection_mean is not None else a.mean_face
            )
            if a.scaler_mean is not None:
                smean[i] = a.scaler_mean
                sscale[i] = a.scaler_scale
            gal[i, :n, :k] = a.features
            gmask[i, :n] = True
            labels[i, :n] = np.asarray(a.labels)
            names_by_id.append(a.names_by_id or {0: name})
        return ModelStack(
            components=jnp.asarray(comps),
            projection_mean=jnp.asarray(pmean),
            scaler_mean=jnp.asarray(smean),
            scaler_scale=jnp.asarray(sscale),
            gallery=jnp.asarray(gal),
            gallery_mask=jnp.asarray(gmask),
            labels=jnp.asarray(labels),
            model_names=[name for name, _ in artifacts],
            names_by_id=names_by_id,
            face_shape=face_shape,
        )

    @staticmethod
    def from_lock_dir(lock_dir: str, dtype=np.float32) -> "ModelStack":
        """Reference loading rule: every ``<lock_dir>/<person>/face_model.pkl``
        (scan-template-v4.py:17-34)."""
        import glob
        import os

        from face_detection_recognization_pca_tpu.io.artifacts import load_model

        arts = []
        for pdir in sorted(glob.glob(os.path.join(lock_dir, "*"))):
            mp = os.path.join(pdir, "face_model.pkl")
            if os.path.exists(mp):
                arts.append((os.path.basename(pdir), load_model(mp)))
        return ModelStack.build(arts, dtype)


@functools.partial(jax.jit, static_argnames=("face_w", "face_h"))
def _score_all_models(
    crops: jnp.ndarray,
    components: jnp.ndarray,
    projection_mean: jnp.ndarray,
    scaler_mean: jnp.ndarray,
    scaler_scale: jnp.ndarray,
    gallery: jnp.ndarray,
    gallery_mask: jnp.ndarray,
    face_w: int,
    face_h: int,
):
    """(B crops) x (M models) -> per-model best scores and rows."""
    dtype = components.dtype
    flat = preprocess_crops(crops, (face_w, face_h), exact=False, dtype=dtype)
    # (M, B, d): per-model standardization.
    scaled = (flat[None] - scaler_mean[:, None]) / scaler_scale[:, None]
    centered = scaled - projection_mean[:, None]
    feats = jnp.einsum(
        "mbd,mkd->mbk", centered, components, preferred_element_type=dtype
    )
    # Masked cosine vs padded galleries.
    dots = jnp.einsum(
        "mbk,mnk->mbn", feats, gallery, preferred_element_type=dtype
    )
    fn = jnp.linalg.norm(feats, axis=-1)[:, :, None]
    gn = jnp.linalg.norm(gallery, axis=-1)[:, None, :]
    denom = fn * gn
    cos = jnp.where(denom > 0, dots / jnp.where(denom > 0, denom, 1.0), 0.0)
    cos = jnp.where(gallery_mask[:, None, :], cos, -jnp.inf)
    best_row = jnp.argmax(cos, axis=-1)  # (M, B)
    best = jnp.take_along_axis(cos, best_row[..., None], axis=-1)[..., 0]
    return best, best_row


class MultiModelRecognizer:
    """Reference ``recognize_face_all_models`` semantics, fused."""

    def __init__(
        self, stack: ModelStack, config: Optional[RecognizeConfig] = None
    ):
        self.stack = stack
        self.config = config or RecognizeConfig()

    def recognize_batch(
        self, crops: np.ndarray, threshold: Optional[float] = None
    ) -> List[Tuple[int, str, float]]:
        """Crop batch -> [(person_id, name, confidence)] per crop.

        Per crop: each model's best cosine; best model wins.  Matches
        per-model threshold + name resolution + cross-model max
        (scan-template-v4.py:270-318) including the fallback of using
        the model's own name when the row is sub-threshold "unknown"
        but that model still wins on confidence.
        """
        thr = self.config.cosine_threshold if threshold is None else threshold
        s = self.stack
        best, best_row = _score_all_models(
            jnp.asarray(crops),
            s.components,
            s.projection_mean,
            s.scaler_mean,
            s.scaler_scale,
            s.gallery,
            s.gallery_mask,
            s.face_shape[1],
            s.face_shape[0],
        )
        best = np.asarray(best)  # (M, B)
        best_row = np.asarray(best_row)
        labels = np.asarray(s.labels)
        out = []
        for b in range(best.shape[1]):
            m = int(np.argmax(best[:, b]))
            conf = float(best[m, b])
            if not np.isfinite(conf):
                out.append((-1, UNKNOWN, 0.0))
                continue
            if conf >= thr:
                pid = int(labels[m, best_row[m, b]])
                name = s.names_by_id[m].get(pid, UNKNOWN)
                if name == UNKNOWN:
                    name = s.model_names[m]
            else:
                # Sub-threshold: reference falls back to the winning
                # model's directory name (scan-template-v4.py:307).
                pid = -1
                name = s.model_names[m] if conf > 0 else UNKNOWN
            out.append((pid, name, conf))
        return out

    def recognize_one(
        self, crop: np.ndarray, threshold: Optional[float] = None
    ) -> Tuple[int, str, float]:
        return self.recognize_batch(crop[None], threshold)[0]

"""Enhanced multi-feature ensemble (the reference's strongest model).

Reproduces ``useless/train-enhanced.py`` / ``useless/scan-enhanced.py``:

* five feature branches, each with its own scaler + PCA:
  raw pixels at 48/64/80 px, HOG (9/8x8/2x2/L2-Hys), uniform LBP
  (P=24, R=3, 26-bin histogram);
* 7-variant augmentation at training time (x6 extra copies);
* profile-face handling: detection via the profile Haar cascade, and
  profile preprocessing (histogram equalization + sharpen) on the
  pixel branches;
* branch confidence weights {48: .15, 64: .25, 80: .20, hog: .25,
  lbp: .15} with angle-aware reweighting (profiles: hog/lbp x1.3,
  pixels x0.8);
* similarity 0.7*cosine + 0.3*(1 / (1 + euclidean));
* thresholds 0.6 frontal / 0.5 profile with a 1.2x profile boost;
* pickle schema ``model_type='enhanced'``, ``trained_models``,
  ``augmentation_factor=6`` (``train-enhanced.py:381-392``).

Branch feature extraction is batched JAX; the per-branch PCAs use the
same :func:`..linalg.pca.scaled_pca` engine as the v2 models.
"""

from __future__ import annotations

import dataclasses
import pickle
from datetime import datetime
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from face_detection_recognization_pca_tpu.linalg.pca import scaled_pca
from face_detection_recognization_pca_tpu.linalg.standardize import (
    ScalerParams,
    scaler_fit,
    scaler_transform,
)
from face_detection_recognization_pca_tpu.ops.features import (
    augment_face,
    equalize_hist_u8,
    hog_features,
    lbp_uniform_hist,
    sharpen_u8,
)
from face_detection_recognization_pca_tpu.ops.resize import (
    resize_bilinear_u8_exact,
)

BRANCHES = ("scale_48", "scale_64", "scale_80", "hog", "lbp")
BRANCH_WEIGHTS = {
    "scale_48": 0.15,
    "scale_64": 0.25,
    "scale_80": 0.20,
    "hog": 0.25,
    "lbp": 0.15,
}
PROFILE_REWEIGHT = {
    "scale_48": 0.8,
    "scale_64": 0.8,
    "scale_80": 0.8,
    "hog": 1.3,
    "lbp": 1.3,
}
FRONTAL_THRESHOLD = 0.6
PROFILE_THRESHOLD = 0.5
PROFILE_BOOST = 1.2
AUGMENTATION_FACTOR = 6


def _branch_components(n_components: int) -> Dict[str, int]:
    # train-enhanced.py:26-32.
    return {
        "scale_48": min(50, n_components // 2),
        "scale_64": n_components,
        "scale_80": min(80, n_components),
        "hog": min(100, n_components),
        "lbp": min(50, n_components // 2),
    }


def extract_branch_features(
    gray_u8: np.ndarray, profile: bool = False
) -> Dict[str, np.ndarray]:
    """One grayscale crop -> the 5 raw branch feature vectors
    (train-enhanced.py:153-191)."""
    img = jnp.asarray(np.asarray(gray_u8, dtype=np.uint8))
    out: Dict[str, np.ndarray] = {}
    for scale in (48, 64, 80):
        r = resize_bilinear_u8_exact(img, (scale, scale))
        if profile:
            r = sharpen_u8(equalize_hist_u8(r))
        out[f"scale_{scale}"] = np.asarray(r, dtype=np.float64).reshape(-1)
    img64 = resize_bilinear_u8_exact(img, (64, 64))
    out["hog"] = np.asarray(hog_features(img64), dtype=np.float64)
    out["lbp"] = np.asarray(lbp_uniform_hist(img64), dtype=np.float64)
    return out


@dataclasses.dataclass
class EnhancedBranch:
    scaler: ScalerParams
    components: np.ndarray  # (k, d)
    projection_mean: np.ndarray  # (d,)
    gallery: np.ndarray  # (n, k)


@dataclasses.dataclass
class EnhancedModel:
    branches: Dict[str, EnhancedBranch]
    labels: np.ndarray
    person_id_map: Dict[str, int]
    augmentation_factor: int = AUGMENTATION_FACTOR
    training_date: str = ""
    face_info: Optional[List[dict]] = None
    n_components: int = 100  # the trainer's requested k (train-enhanced.py:24)

    @property
    def names_by_id(self) -> Dict[int, str]:
        return {v: k for k, v in self.person_id_map.items()}


def train_enhanced(
    crops: List[np.ndarray],
    labels: List[int],
    person_id_map: Dict[str, int],
    n_components: int = 100,
    augment: bool = True,
    profile_flags: Optional[List[bool]] = None,
    face_info: Optional[List[dict]] = None,
) -> EnhancedModel:
    """Train the 5-branch ensemble from grayscale crops."""
    ks = _branch_components(n_components)
    feats: Dict[str, List[np.ndarray]] = {b: [] for b in BRANCHES}
    out_labels: List[int] = []
    for i, crop in enumerate(crops):
        profile = bool(profile_flags[i]) if profile_flags else False
        variants = (
            np.asarray(augment_face(jnp.asarray(crop.astype(np.uint8))))
            if augment
            else crop[None].astype(np.uint8)
        )
        for v in variants:
            f = extract_branch_features(v, profile)
            for b in BRANCHES:
                feats[b].append(f[b])
            out_labels.append(labels[i])

    labels_arr = np.asarray(out_labels, dtype=np.int32)
    branches = {}
    for b in BRANCHES:
        x = np.stack(feats[b])
        k = max(1, min(ks[b], x.shape[0] - 1, x.shape[1]))
        scaler = scaler_fit(jnp.asarray(x))
        xs = np.asarray(scaler_transform(jnp.asarray(x), scaler))
        res = scaled_pca(jnp.asarray(xs), k)
        branches[b] = EnhancedBranch(
            scaler=ScalerParams(
                np.asarray(scaler.mean), np.asarray(scaler.scale)
            ),
            components=np.asarray(res.components),
            projection_mean=np.asarray(res.mean),
            gallery=np.asarray(res.projected),
        )
    return EnhancedModel(
        branches=branches,
        labels=labels_arr,
        person_id_map=dict(person_id_map),
        training_date=datetime.now().isoformat(),
        face_info=face_info,
        n_components=n_components,
    )


def _branch_similarity(feat: np.ndarray, gallery: np.ndarray) -> np.ndarray:
    """0.7 cosine + 0.3 / (1 + L2), per gallery row
    (scan-enhanced.py:308-315)."""
    fn = np.linalg.norm(feat)
    gn = np.linalg.norm(gallery, axis=1)
    denom = fn * gn
    cos = np.where(denom > 0, gallery @ feat / np.where(denom > 0, denom, 1), 0.0)
    dist = np.linalg.norm(gallery - feat[None, :], axis=1)
    return 0.7 * cos + 0.3 * (1.0 / (1.0 + dist))


def recognize_enhanced(
    model: EnhancedModel,
    crop_gray: np.ndarray,
    profile: bool = False,
) -> Tuple[int, str, float]:
    """Weighted-branch recognition with angle-aware reweighting and the
    frontal/profile thresholds (scan-enhanced.py:270-365)."""
    raw = extract_branch_features(np.asarray(crop_gray), profile)
    total_w = 0.0
    combined = None
    for b in BRANCHES:
        br = model.branches[b]
        x = (raw[b] - br.scaler.mean) / br.scaler.scale
        feat = (x - br.projection_mean) @ br.components.T
        sims = _branch_similarity(feat, br.gallery)
        w = BRANCH_WEIGHTS[b] * (PROFILE_REWEIGHT[b] if profile else 1.0)
        combined = sims * w if combined is None else combined + sims * w
        total_w += w
    combined /= total_w
    if profile:
        combined = combined * PROFILE_BOOST
    idx = int(np.argmax(combined))
    conf = float(combined[idx])
    threshold = PROFILE_THRESHOLD if profile else FRONTAL_THRESHOLD
    if conf >= threshold:
        pid = int(model.labels[idx])
        return pid, model.names_by_id.get(pid, "unknown"), conf
    return -1, "unknown", conf


_PROFILE_CASCADE = "/usr/share/opencv4/haarcascades/haarcascade_profileface.xml"
_profile_detector = None


def detect_face_angle(face_gray: np.ndarray) -> str:
    """'frontal' / 'left_profile' / 'right_profile' via the profile Haar
    cascade (train-enhanced.py:48-73): a profile hit whose center lies
    left of the crop midline is a left profile, else right."""
    global _profile_detector
    import os

    if _profile_detector is None:
        if not os.path.exists(_PROFILE_CASCADE):
            _profile_detector = False
        else:
            from face_detection_recognization_pca_tpu.detect.haar import (
                HaarDetector,
                load_cascade,
            )

            try:
                _profile_detector = HaarDetector(
                    load_cascade(_PROFILE_CASCADE), top_k=256
                )
            except ValueError:
                # e.g. tilted features; angle detection degrades to frontal.
                _profile_detector = False
    if not _profile_detector:
        return "frontal"
    profiles = _profile_detector.detect_multi_scale(
        np.asarray(face_gray, np.uint8), 1.1, 4, (24, 24)
    )
    if profiles:
        h, w = face_gray.shape
        x, y, wp, hp = profiles[0]
        return "left_profile" if x + wp // 2 < w // 2 else "right_profile"
    return "frontal"


# ---------------------------------------------------------------------------
# Artifact I/O (reference pickle schema, train-enhanced.py:381-395)
# ---------------------------------------------------------------------------


def save_enhanced(model: EnhancedModel, path: str) -> None:
    """Write the REFERENCE enhanced pickle layout
    (``train-enhanced.py:381-395``): per-branch
    ``trained_models[ft] = {'features', 'pca', 'scaler'}`` with fitted
    sklearn (or shim) estimator objects, duplicated into the top-level
    ``pca_models`` / ``scalers`` maps exactly as the reference writer
    does, plus ``face_labels / face_info / person_id_map / n_components /
    training_date / model_type / augmentation_factor``."""
    from face_detection_recognization_pca_tpu.io.artifacts import (
        make_sklearn_pair,
    )

    trained_models, pca_models, scalers = {}, {}, {}
    for b, br in model.branches.items():
        pca, scaler = make_sklearn_pair(
            br.components,
            br.projection_mean,
            br.scaler.mean,
            br.scaler.scale,
            n_samples=br.gallery.shape[0],
        )
        trained_models[b] = {
            "features": np.asarray(br.gallery),
            "pca": pca,
            "scaler": scaler,
        }
        pca_models[b] = pca
        scalers[b] = scaler
    data = {
        "trained_models": trained_models,
        "pca_models": pca_models,
        "scalers": scalers,
        "face_labels": np.asarray(model.labels),
        "face_info": model.face_info or [],
        "person_id_map": dict(model.person_id_map),
        "n_components": int(model.n_components),
        "training_date": model.training_date or datetime.now().isoformat(),
        "model_type": "enhanced",
        "augmentation_factor": int(model.augmentation_factor),
    }
    with open(path, "wb") as f:
        pickle.dump(data, f)


def load_enhanced(path: str) -> EnhancedModel:
    """Load an enhanced pickle -- the reference layout (sklearn objects,
    unpickled sklearn-free via the class-substitution shim) or this
    repo's pre-r3 plain-array layout."""
    from face_detection_recognization_pca_tpu.io.artifacts import _shim_loads

    with open(path, "rb") as f:
        data = _shim_loads(f.read())
    if data.get("model_type") != "enhanced":
        raise ValueError(f"{path} is not an enhanced model pickle")
    branches = {}
    for b, d in data["trained_models"].items():
        if "pca" in d:  # reference layout (train-enhanced.py:358-361)
            pca, scaler = d["pca"], d["scaler"]
            branches[b] = EnhancedBranch(
                scaler=ScalerParams(
                    np.asarray(scaler.mean_), np.asarray(scaler.scale_)
                ),
                components=np.asarray(pca.components_),
                projection_mean=np.asarray(pca.mean_),
                gallery=np.asarray(d["features"]),
            )
        else:  # legacy plain-array layout (rounds 1-2 of this repo)
            branches[b] = EnhancedBranch(
                scaler=ScalerParams(d["scaler_mean"], d["scaler_scale"]),
                components=d["components"],
                projection_mean=d["projection_mean"],
                gallery=d["gallery"],
            )
    return EnhancedModel(
        branches=branches,
        labels=np.asarray(data["face_labels"]),
        person_id_map=dict(data["person_id_map"]),
        augmentation_factor=data.get("augmentation_factor", AUGMENTATION_FACTOR),
        training_date=data.get("training_date", ""),
        face_info=data.get("face_info"),
        n_components=int(data.get("n_components", 100)),
    )

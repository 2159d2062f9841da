"""Training stage: crops (+ detection JSON) -> PCA model artifacts.

Covers both reference trainers:

* single person (``train-v4.py``): crops listed in the detection JSON,
  gray -> 64x64 -> flatten, z-score + PCA(k=50), artifacts
  ``face_model.pkl`` + ``{person}_model_info.json`` + eigenface JPEGs in
  the person dir;
* multi person (``train-v5.py``): every person dir under the lock root
  (detection JSONs auto-backfilled when missing,
  ``train-v5.py:220-223``), integer labels via ``person_id_map``,
  a combined ``multi_person_*`` model, and per-person models with
  ``n_components = face_count`` capped at the centered-data rank
  (matching the shipped 77-faces/76-components artifact).

The PCA itself is :func:`..linalg.pca.scaled_pca` on device; image
loading/decoding stays on host.
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Dict, List, Optional, Tuple

import numpy as np

from face_detection_recognization_pca_tpu.config import PipelineConfig
from face_detection_recognization_pca_tpu.io.artifacts import (
    EigenfacesArtifact,
    save_model_v2,
    write_model_info_json,
)
from face_detection_recognization_pca_tpu.io.detection_json import (
    generate_detection_json,
    read_detection_json,
)
from face_detection_recognization_pca_tpu.io.images import save_eigenface_images
from face_detection_recognization_pca_tpu.models import eigenfaces as ef
from face_detection_recognization_pca_tpu.ops.preprocess import preprocess_crops
from face_detection_recognization_pca_tpu.utils.logging import get_logger

log = get_logger("fdrp.train")


def _load_person_vectors(
    person_dir: str,
    person_name: str,
    face_size: Tuple[int, int],
    regenerate_json: bool = True,
) -> Tuple[np.ndarray, List[dict]]:
    """Crops referenced by the person's detection JSON -> (n, d) float64
    vectors (exact cv2-parity preprocessing) + face_info records."""
    import cv2

    json_path = os.path.join(
        person_dir, f"{person_name}_faces_detection.json"
    )
    if not os.path.exists(json_path) and regenerate_json:
        log.info("backfilling detection JSON for %s", person_name)
        generate_detection_json(person_dir, person_name, output_path=json_path)
    det = read_detection_json(json_path)

    crops = []
    info = []
    for rec in det.faces:
        path = rec.image_path
        if not os.path.exists(path):
            # Windows-style or relocated paths: resolve by basename.
            path = os.path.join(
                person_dir, os.path.basename(str(rec.image_path).replace("\\", "/"))
            )
        img = cv2.imread(path)
        if img is None:
            log.warning("skipping unreadable crop %s", rec.image_path)
            continue
        crops.append(img)
        d = rec.__dict__.copy()
        info.append(d)
    if not crops:
        raise ValueError(f"no readable crops for {person_name}")
    w, h = face_size
    vecs = np.stack(
        [
            np.asarray(preprocess_crops(c[None], (w, h), exact=True))[0]
            for c in crops
        ]
    ).astype(np.float64)
    return vecs, info


def _effective_k(requested: int, n_samples: int, d: int) -> int:
    # Centered data has rank <= n-1; sklearn's full SVD likewise yields
    # n-1 useful components (the shipped 77-crop model stores 76).
    return max(1, min(requested, n_samples - 1 if n_samples > 1 else 1, d))


def train_single_person(
    person_name: str,
    lock_dir: Optional[str] = None,
    config: Optional[PipelineConfig] = None,
    save: bool = True,
) -> EigenfacesArtifact:
    """train-v4 parity: one person, labels all zero."""
    cfg = config or PipelineConfig()
    lock = lock_dir or cfg.paths.lock_dir
    person_dir = os.path.join(lock, person_name)
    face_hw = cfg.train.face_size
    vecs, info = _load_person_vectors(
        person_dir, person_name, (face_hw[1], face_hw[0])
    )
    k = _effective_k(cfg.train.n_components, vecs.shape[0], vecs.shape[1])
    labels = np.zeros(vecs.shape[0], dtype=np.int32)
    model, aux = ef.train_v2(
        vecs.astype(np.dtype(cfg.train.dtype))
        if cfg.train.dtype != "float64"
        else vecs,
        labels,
        n_components=k,
        face_shape=tuple(cfg.train.face_size),
    )
    art = ef.to_artifact(
        model,
        aux,
        person_id_map={person_name: 0},
        person_name=person_name,
        face_info=info,
        training_date=datetime.now().isoformat(),
    )
    if save:
        save_model_v2(art, os.path.join(person_dir, "face_model.pkl"))
        write_model_info_json(
            art, os.path.join(person_dir, f"{person_name}_model_info.json")
        )
        save_eigenface_images(
            art.components,
            art.mean_face,
            art.face_shape,
            person_dir,
            prefix=f"{person_name}_",
            top_k=cfg.train.eigenfaces_to_save,
        )
        log.info(
            "trained %s: %d faces, k=%d, EVR=%.3f",
            person_name,
            vecs.shape[0],
            k,
            float(np.sum(art.explained_variance_ratio)),
        )
    return art


def train_all_persons(
    lock_dir: Optional[str] = None,
    config: Optional[PipelineConfig] = None,
    per_person_components: Optional[int] = None,
    combined: bool = True,
    save: bool = True,
) -> Dict[str, EigenfacesArtifact]:
    """train-v5 parity: per-person models (k=face count) + a combined
    multi-person model over all dirs.

    ``save=False`` skips every artifact write (model pickles, info
    JSONs, eigenface JPEGs) -- used to retrain against a read-only
    gallery tree (the golden multi-person parity test runs this on
    ``/root/reference/faces/lock_version`` directly)."""
    cfg = config or PipelineConfig()
    lock = lock_dir or cfg.paths.lock_dir
    persons = sorted(
        p
        for p in os.listdir(lock)
        if os.path.isdir(os.path.join(lock, p))
    )
    out: Dict[str, EigenfacesArtifact] = {}
    all_vecs, all_labels, person_id_map, all_info = [], [], {}, []
    face_hw = cfg.train.face_size
    for pid, person in enumerate(persons):
        try:
            vecs, info = _load_person_vectors(
                os.path.join(lock, person), person, (face_hw[1], face_hw[0])
            )
        except ValueError as e:
            log.warning("skipping %s: %s", person, e)
            continue
        person_id_map[person] = pid
        all_vecs.append(vecs)
        all_labels.append(np.full(vecs.shape[0], pid, dtype=np.int32))
        all_info.extend(info)

        # Per-person model, k = face count (train-v5.py:540-545).
        k = _effective_k(
            per_person_components or vecs.shape[0], vecs.shape[0], vecs.shape[1]
        )
        model, aux = ef.train_v2(
            vecs, np.zeros(vecs.shape[0], dtype=np.int32), k,
            face_shape=tuple(cfg.train.face_size),
        )
        art = ef.to_artifact(
            model,
            aux,
            person_id_map={person: 0},
            person_name=person,
            face_info=info,
            training_date=datetime.now().isoformat(),
        )
        if save:
            save_model_v2(art, os.path.join(lock, person, "face_model.pkl"))
            write_model_info_json(
                art, os.path.join(lock, person, f"{person}_model_info.json")
            )
        out[person] = art

    if combined and all_vecs:
        x = np.concatenate(all_vecs, axis=0)
        y = np.concatenate(all_labels, axis=0)
        k = _effective_k(cfg.train.n_components * 2, x.shape[0], x.shape[1])
        model, aux = ef.train_v2(x, y, k, face_shape=tuple(cfg.train.face_size))
        art = ef.to_artifact(
            model,
            aux,
            person_id_map=person_id_map,
            person_name="multi_person",
            face_info=all_info,
            training_date=datetime.now().isoformat(),
        )
        if save:
            models_dir = cfg.paths.models_dir
            os.makedirs(models_dir, exist_ok=True)
            save_model_v2(
                art, os.path.join(models_dir, "multi_person_face_model.pkl")
            )
            write_model_info_json(
                art, os.path.join(models_dir, "multi_person_model_info.json")
            )
            save_eigenface_images(
                art.components,
                art.mean_face,
                art.face_shape,
                models_dir,
                prefix="multi_person_",
                top_k=cfg.train.eigenfaces_to_save,
            )
        out["multi_person"] = art
    return out

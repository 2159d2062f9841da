"""Native checkpoints for device models + resumable pipeline state.

The reference's only checkpoints are the model pickles themselves
(``train-v4.py:199-228``), and its only resume mechanism is re-reading
the detection JSON (``train-v5.py:220-223``) plus re-scanning existing
crop ids (``useless/detection.py:8-35``).  This module keeps those
artifact formats as the interchange layer (see :mod:`.artifacts`) and
adds TPU-native checkpoints on top:

* :func:`save_model_ckpt` / :func:`load_model_ckpt` -- an
  :class:`..models.eigenfaces.EigenfacesModel` pytree via orbax
  (async-capable, mmap-friendly) with an ``.npz`` fallback when orbax
  is unavailable;
* :class:`StageState` -- tiny JSON state for resumable batch
  processing (last processed frame / face id), generalizing the
  reference's resumable face-id numbering.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np


def _model_to_tree(model) -> dict:
    tree = {
        "components": np.asarray(model.components),
        "projection_mean": np.asarray(model.projection_mean),
        "mean_face": np.asarray(model.mean_face),
        "gallery": np.asarray(model.gallery),
        "labels": np.asarray(model.labels),
    }
    if model.scaler_mean is not None:
        tree["scaler_mean"] = np.asarray(model.scaler_mean)
        tree["scaler_scale"] = np.asarray(model.scaler_scale)
    return tree


def _tree_to_model(tree: dict, face_shape, schema: str):
    import jax.numpy as jnp

    from face_detection_recognization_pca_tpu.models.eigenfaces import (
        EigenfacesModel,
    )

    return EigenfacesModel(
        components=jnp.asarray(tree["components"]),
        projection_mean=jnp.asarray(tree["projection_mean"]),
        mean_face=jnp.asarray(tree["mean_face"]),
        gallery=jnp.asarray(tree["gallery"]),
        labels=jnp.asarray(tree["labels"]),
        scaler_mean=jnp.asarray(tree["scaler_mean"])
        if "scaler_mean" in tree
        else None,
        scaler_scale=jnp.asarray(tree["scaler_scale"])
        if "scaler_scale" in tree
        else None,
        face_shape=tuple(face_shape),
        schema=schema,
    )


def save_model_ckpt(model, path: str) -> str:
    """Checkpoint a device model; returns the written path.

    ``path`` is a directory for the orbax backend, ``path + '.npz'``
    for the fallback.  Metadata (face_shape/schema) rides in a JSON
    sidecar either way.
    """
    tree = _model_to_tree(model)
    meta = {"face_shape": list(model.face_shape), "schema": model.schema}
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, tree, force=True)
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
        return path
    except Exception:
        out = path if path.endswith(".npz") else path + ".npz"
        os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
        np.savez(out, **tree)
        with open(out + ".meta.json", "w") as f:
            json.dump(meta, f)
        return out


def load_model_ckpt(path: str):
    """Load a checkpoint written by :func:`save_model_ckpt`."""
    npz = path if path.endswith(".npz") else path + ".npz"
    if os.path.exists(npz):
        with np.load(npz) as z:
            tree = {k: z[k] for k in z.files}
        meta_path = npz + ".meta.json"
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        tree = ckptr.restore(os.path.abspath(path))
        meta_path = os.path.abspath(path) + ".meta.json"
    with open(meta_path) as f:
        meta = json.load(f)
    return _tree_to_model(tree, meta["face_shape"], meta["schema"])


@dataclasses.dataclass
class StageState:
    """Resumable per-stage progress (JSON on disk)."""

    stage: str
    last_frame: int = -1
    next_face_id: int = 0
    extra: Optional[dict] = None

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f)

    @staticmethod
    def load(path: str, default_stage: str = "") -> "StageState":
        if not os.path.exists(path):
            return StageState(stage=default_stage)
        with open(path) as f:
            d = json.load(f)
        return StageState(**d)

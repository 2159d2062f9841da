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
def crops(reference_root):
    rng = np.random.default_rng(1234)
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


def test_gallery_match_pallas_streams_tiles(rng):
    """Streaming large-gallery kernel == plain argmax over the full
    cosine matrix, including cross-tile winners, first-occurrence ties,
    sentinel (-1 norm) masking, and valid zero-norm rows scoring 0."""
    import jax.numpy as jnp

    from face_detection_recognization_pca_tpu.ops.pallas_kernels import (
        gallery_match_pallas,
    )
    from face_detection_recognization_pca_tpu.ops.similarity import (
        cosine_gallery,
    )

    b, k, n = 8, 16, 64
    feats = rng.normal(0, 1, (b, k)).astype(np.float32)
    gallery = rng.normal(0, 1, (n, k)).astype(np.float32)
    # Plant exact matches in different tiles (tile_n=16 -> 4 tiles).
    gallery[3] = feats[0]
    gallery[40] = feats[1]
    gallery[62] = feats[2]  # planted in the INVALID range: must lose
    gallery[10] = 0.0  # valid zero-norm row: scores 0, never -inf
    gnorm = np.linalg.norm(gallery, axis=1).astype(np.float32)
    gnorm[50:] = np.where(
        np.arange(n)[50:] >= 60, -1.0, gnorm[50:]
    )  # rows 60+ invalid

    ids, best = gallery_match_pallas(
        jnp.asarray(feats),
        jnp.asarray(gallery.T),
        jnp.asarray(gnorm),
        tile_b=8,
        tile_n=16,
        interpret=True,
    )
    ids, best = np.asarray(ids), np.asarray(best)

    scores = np.array(
        cosine_gallery(jnp.asarray(feats), jnp.asarray(gallery))
    )
    scores[:, 60:] = -np.inf  # the sentinel mask
    want_ids = scores.argmax(axis=1)
    want_best = scores.max(axis=1)
    np.testing.assert_array_equal(ids, want_ids)
    np.testing.assert_allclose(best, want_best, rtol=1e-5, atol=1e-6)
    assert ids[0] == 3 and ids[1] == 40
    assert ids[2] != 62  # sentinel-masked exact match must not win


def test_gallery_match_pallas_first_occurrence_ties(rng):
    import jax.numpy as jnp

    from face_detection_recognization_pca_tpu.ops.pallas_kernels import (
        gallery_match_pallas,
    )

    k = 8
    f = rng.normal(0, 1, (8, k)).astype(np.float32)
    # Duplicate best row in tiles 0 and 2: first occurrence must win.
    gallery = rng.normal(0, 1, (32, k)).astype(np.float32)
    gallery[5] = f[0] * 2.0
    gallery[21] = f[0] * 3.0  # same cosine (scaled), later tile
    gnorm = np.linalg.norm(gallery, axis=1).astype(np.float32)
    ids, _ = gallery_match_pallas(
        jnp.asarray(f),
        jnp.asarray(gallery.T),
        jnp.asarray(gnorm),
        tile_b=8,
        tile_n=8,
        interpret=True,
    )
    assert int(np.asarray(ids)[0]) == 5


def test_sharded_gallery_match_pallas_path_matches_xla(rng):
    """use_pallas=True wiring (interpret unavailable through shard_map
    on CPU -> force the flag OFF/ON comparison on the XLA backend is
    not possible; instead compare the internal pallas local matcher in
    interpret mode against the sharded XLA result)."""
    import jax
    import jax.numpy as jnp

    from face_detection_recognization_pca_tpu.parallel.mesh import make_mesh
    from face_detection_recognization_pca_tpu.parallel.sharding import (
        sharded_gallery_match,
    )

    mesh = make_mesh(data=1, model=4)
    b, k, n = 8, 16, 128
    feats = jnp.asarray(rng.normal(0, 1, (b, k)).astype(np.float32))
    gallery = rng.normal(0, 1, (n, k)).astype(np.float32)
    gallery[77] = np.asarray(feats[0])
    labels = np.arange(n, dtype=np.int32)
    ids_xla, conf_xla = sharded_gallery_match(
        mesh,
        feats,
        jnp.asarray(gallery),
        jnp.asarray(labels),
        threshold=0.0,
        use_pallas=False,
    )
    assert int(np.asarray(ids_xla)[0]) == 77
    assert float(np.asarray(conf_xla)[0]) > 0.999


def test_gather_patches_rowblock_matches_slice_form(rng):
    """The accelerator gather (row-block slices + one-hot column matmul
    at HIGHEST precision) must be bit-identical to the direct tile
    slice -- the Haar funnel's exactness contract rides on it."""
    import jax
    import jax.numpy as jnp

    from face_detection_recognization_pca_tpu.ops.pallas_kernels import (
        _gather_patches_rowblock,
        gather_patches,
    )

    L, H, W, side, k = 3, 61, 97, 25, 64
    integrals = jnp.asarray(
        np.cumsum(
            np.cumsum(rng.normal(110, 25, (L, H, W)).astype(np.float32), 1), 2
        )
    )
    lvl = jnp.asarray(rng.integers(0, L, k).astype(np.int32))
    cy = jnp.asarray(rng.integers(0, H - side + 1, k).astype(np.int32))
    cx = jnp.asarray(rng.integers(0, W - side + 1, k).astype(np.int32))
    ref = np.asarray(gather_patches(integrals, lvl, cy, cx, side))
    got = np.asarray(
        jax.jit(
            lambda *a: _gather_patches_rowblock(*a, side)
        )(integrals, lvl, cy, cx)
    )
    np.testing.assert_array_equal(ref, got)


def test_gallery_match_pallas_bf16_operands(rng):
    """operand_dtype=bf16 (the TPU speed path: XLA-default-precision
    rounding of both dot operands) picks the same winners as an oracle
    computed with the same casts, and near-identical confidences."""
    import jax.numpy as jnp

    from face_detection_recognization_pca_tpu.ops.pallas_kernels import (
        gallery_match_pallas,
    )

    b, k, n = 16, 32, 256
    feats = rng.normal(0, 1, (b, k)).astype(np.float32)
    gallery = rng.normal(0, 1, (n, k)).astype(np.float32)
    for i in range(b):  # planted exact matches, one per batch row
        gallery[i * 16] = feats[i]
    gnorm = np.linalg.norm(gallery, axis=1).astype(np.float32)

    ids, best = gallery_match_pallas(
        jnp.asarray(feats),
        jnp.asarray(gallery.T),
        jnp.asarray(gnorm),
        tile_b=16,
        tile_n=64,
        interpret=True,
        operand_dtype=jnp.bfloat16,
    )
    # Oracle with identical bf16 operand rounding, f32 accumulate.
    dots = feats.astype(jnp.bfloat16).astype(np.float32) @ (
        gallery.astype(jnp.bfloat16).astype(np.float32).T
    )
    cos = dots / (np.linalg.norm(feats, axis=1, keepdims=True) * gnorm[None, :])
    np.testing.assert_array_equal(np.asarray(ids), cos.argmax(axis=1))
    np.testing.assert_array_equal(
        np.asarray(ids), np.arange(b) * 16
    )  # planted matches win even under bf16 rounding
    np.testing.assert_allclose(
        np.asarray(best), cos.max(axis=1), rtol=2e-3, atol=2e-3
    )

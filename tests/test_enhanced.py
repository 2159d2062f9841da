"""Enhanced ensemble: feature ops parity with cv2, train/recognize flow."""

import cv2
import glob
import os

import numpy as np
import pytest

from face_detection_recognization_pca_tpu.models.enhanced import (
    AUGMENTATION_FACTOR,
    extract_branch_features,
    load_enhanced,
    recognize_enhanced,
    save_enhanced,
    train_enhanced,
)
from face_detection_recognization_pca_tpu.ops.features import (
    augment_face,
    convert_scale_abs,
    equalize_hist_u8,
    gaussian_blur3_u8,
    hog_features,
    lbp_uniform_hist,
    rotate_u8,
)


def test_equalize_hist_matches_cv2(rng):
    img = rng.integers(0, 200, (60, 80), dtype=np.uint8)
    ours = np.asarray(equalize_hist_u8(img))
    ref = cv2.equalizeHist(img)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_convert_scale_abs_matches_cv2(rng):
    img = rng.integers(0, 256, (40, 40), dtype=np.uint8)
    for a, b in [(1.2, 10.0), (0.8, -10.0)]:
        ours = np.asarray(convert_scale_abs(img, a, b))
        ref = cv2.convertScaleAbs(img, alpha=a, beta=b)
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_gaussian_blur_matches_cv2(rng):
    img = rng.integers(0, 256, (50, 50), dtype=np.uint8)
    ours = np.asarray(gaussian_blur3_u8(img))
    ref = cv2.GaussianBlur(img, (3, 3), 0)
    # Interior parity (borders differ by reflect convention <= 1 LSB).
    assert np.abs(
        ours[1:-1, 1:-1].astype(int) - ref[1:-1, 1:-1].astype(int)
    ).max() <= 1


def test_rotation_close_to_cv2(rng):
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 2)  # smooth -> interp error small
    for ang in (-5.0, 5.0):
        ours = np.asarray(rotate_u8(img, ang)).astype(int)
        M = cv2.getRotationMatrix2D((32, 32), ang, 1.0)
        ref = cv2.warpAffine(img, M, (64, 64)).astype(int)
        inner = (slice(8, -8), slice(8, -8))
        assert np.abs(ours[inner] - ref[inner]).mean() < 2.0


def test_hog_shape_and_invariances(rng):
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    f = np.asarray(hog_features(img))
    assert f.shape == (7 * 7 * 2 * 2 * 9,)  # 1764, skimage-compatible
    # L2-Hys: nonnegative, bounded by 1 (clip at 0.2 then renormalize).
    assert np.all(f >= 0) and np.all(f <= 1.0 + 1e-6)
    # Constant image -> zero gradients -> zero descriptor.
    z = np.asarray(hog_features(np.full((64, 64), 100, np.uint8)))
    assert np.abs(z).max() < 1e-6


def test_lbp_hist_properties(rng):
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    h = np.asarray(lbp_uniform_hist(img))
    assert h.shape == (26,)
    np.testing.assert_allclose(h.sum(), 1.0, rtol=1e-5)
    # Flat image: every neighbor == center -> all-ones pattern (bin 24).
    flat = np.asarray(lbp_uniform_hist(np.full((32, 32), 50, np.uint8)))
    assert flat.argmax() == 24


def test_augment_face_produces_reference_set(rng):
    img = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    aug = np.asarray(augment_face(img))
    assert aug.shape == (1 + AUGMENTATION_FACTOR, 48, 48)
    np.testing.assert_array_equal(aug[0], img)
    np.testing.assert_array_equal(aug[1], img[:, ::-1])


@pytest.fixture(scope="module")
def real_crops(reference_root):
    paths = sorted(
        glob.glob(
            os.path.join(reference_root, "faces/lock_version/Joseph_Lai/face_*.jpg")
        )
    )[:6] + sorted(
        glob.glob(
            os.path.join(reference_root, "faces/lock_version/shun/face_*.jpg")
        )
    )[:6]
    if len(paths) < 12:
        pytest.skip("need crops from two persons")
    return [cv2.imread(p, cv2.IMREAD_GRAYSCALE) for p in paths]


def test_enhanced_train_recognize_roundtrip(tmp_path, real_crops):
    labels = [0] * 6 + [1] * 6
    pid_map = {"Joseph_Lai": 0, "shun": 1}
    model = train_enhanced(
        real_crops, labels, pid_map, n_components=20, augment=False
    )
    # Training crops recognize as themselves.
    pid, name, conf = recognize_enhanced(model, real_crops[0])
    assert (pid, name) == (0, "Joseph_Lai")
    assert conf > 0.9
    pid2, name2, conf2 = recognize_enhanced(model, real_crops[7])
    assert (pid2, name2) == (1, "shun")
    # Pickle roundtrip with the reference schema.
    p = str(tmp_path / "enhanced_model.pkl")
    save_enhanced(model, p)
    back = load_enhanced(p)
    pid3, name3, conf3 = recognize_enhanced(back, real_crops[0])
    assert (pid3, name3) == (0, "Joseph_Lai")
    assert abs(conf3 - conf) < 1e-9


def test_enhanced_pickle_reference_schema(tmp_path, real_crops):
    """save_enhanced writes the exact reference layout
    (train-enhanced.py:381-395): per-branch {'features','pca','scaler'}
    dicts with fitted sklearn estimators, duplicated into top-level
    pca_models/scalers, plus the flat metadata keys."""
    import pickle

    labels = [0] * 6 + [1] * 6
    model = train_enhanced(
        real_crops,
        labels,
        {"Joseph_Lai": 0, "shun": 1},
        n_components=20,
        augment=False,
        face_info=[{"image_path": f"crop_{i}.jpg"} for i in range(12)],
    )
    p = str(tmp_path / "m.pkl")
    save_enhanced(model, p)
    with open(p, "rb") as f:
        raw = pickle.load(f)  # plain pickle: sklearn objects restore live
    assert set(raw) == {
        "trained_models",
        "pca_models",
        "scalers",
        "face_labels",
        "face_info",
        "person_id_map",
        "n_components",
        "training_date",
        "model_type",
        "augmentation_factor",
    }
    assert raw["model_type"] == "enhanced"
    assert raw["augmentation_factor"] == 6
    assert raw["n_components"] == 20
    assert len(raw["face_info"]) == 12
    from sklearn.decomposition import PCA
    from sklearn.preprocessing import StandardScaler

    for b in ("scale_48", "scale_64", "scale_80", "hog", "lbp"):
        tm = raw["trained_models"][b]
        assert set(tm) == {"features", "pca", "scaler"}
        assert isinstance(tm["pca"], PCA)
        assert isinstance(tm["scaler"], StandardScaler)
        assert raw["pca_models"][b] is tm["pca"]
        assert raw["scalers"][b] is tm["scaler"]
        # The embedded estimators transform like our branch params.
        feats = tm["pca"].transform(
            tm["scaler"].transform(
                extract_branch_features(real_crops[0])[b][None]
            )
        )
        br = model.branches[b]
        x = (extract_branch_features(real_crops[0])[b] - br.scaler.mean) / br.scaler.scale
        want = (x - br.projection_mean) @ br.components.T
        np.testing.assert_allclose(feats[0], want, rtol=1e-8, atol=1e-8)


def test_enhanced_loads_sklearn_fit_pickle(tmp_path, real_crops):
    """A pickle written the way the REFERENCE writes it -- sklearn
    fit_transform per branch (train-enhanced.py:338-361) -- loads through
    our (sklearn-free shim) loader and recognizes correctly."""
    import pickle

    from sklearn.decomposition import PCA
    from sklearn.preprocessing import StandardScaler

    labels = [0] * 6 + [1] * 6
    trained_models, pca_models, scalers = {}, {}, {}
    raw_by_branch = {}
    for b in ("scale_48", "scale_64", "scale_80", "hog", "lbp"):
        x = np.stack([extract_branch_features(c)[b] for c in real_crops])
        raw_by_branch[b] = x
        scaler = StandardScaler()
        xs = scaler.fit_transform(x)
        pca = PCA(n_components=8, random_state=42)
        feats = pca.fit_transform(xs)
        trained_models[b] = {"features": feats, "pca": pca, "scaler": scaler}
        pca_models[b] = pca
        scalers[b] = scaler
    p = str(tmp_path / "ref_layout.pkl")
    with open(p, "wb") as f:
        pickle.dump(
            {
                "trained_models": trained_models,
                "pca_models": pca_models,
                "scalers": scalers,
                "face_labels": np.asarray(labels),
                "face_info": [],
                "person_id_map": {"Joseph_Lai": 0, "shun": 1},
                "n_components": 8,
                "training_date": "2026-01-01T00:00:00",
                "model_type": "enhanced",
                "augmentation_factor": 6,
            },
            f,
        )
    model = load_enhanced(p)
    assert model.n_components == 8
    pid, name, conf = recognize_enhanced(model, real_crops[0])
    assert (pid, name) == (0, "Joseph_Lai")
    pid2, name2, _ = recognize_enhanced(model, real_crops[7])
    assert (pid2, name2) == (1, "shun")


def test_enhanced_loads_legacy_array_layout(tmp_path, real_crops):
    """The pre-r3 plain-array layout still loads (forward compat for
    models written by rounds 1-2 of this repo)."""
    import pickle

    labels = [0] * 6 + [1] * 6
    model = train_enhanced(
        real_crops, labels, {"Joseph_Lai": 0, "shun": 1},
        n_components=12, augment=False,
    )
    legacy = {
        "model_type": "enhanced",
        "trained_models": {
            b: {
                "scaler_mean": br.scaler.mean,
                "scaler_scale": br.scaler.scale,
                "components": br.components,
                "projection_mean": br.projection_mean,
                "gallery": br.gallery,
            }
            for b, br in model.branches.items()
        },
        "face_labels": model.labels,
        "person_id_map": model.person_id_map,
        "augmentation_factor": 6,
        "training_date": "",
    }
    p = str(tmp_path / "legacy.pkl")
    with open(p, "wb") as f:
        pickle.dump(legacy, f)
    back = load_enhanced(p)
    a = recognize_enhanced(model, real_crops[3])
    bres = recognize_enhanced(back, real_crops[3])
    assert a == bres

"""Model checkpoints (orbax / npz) + resumable stage state."""

import numpy as np
import pytest

from face_detection_recognization_pca_tpu.io.checkpoint import (
    StageState,
    load_model_ckpt,
    save_model_ckpt,
)
from face_detection_recognization_pca_tpu.models import eigenfaces as ef


def test_model_ckpt_roundtrip(tmp_path, rng):
    x = rng.normal(120, 30, (12, 256))
    model, _ = ef.train_v1(x, n_components=4)
    path = save_model_ckpt(model, str(tmp_path / "ckpt"))
    back = load_model_ckpt(path)
    np.testing.assert_allclose(
        np.asarray(back.components), np.asarray(model.components), rtol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(back.gallery), np.asarray(model.gallery), rtol=1e-7
    )
    assert back.face_shape == model.face_shape
    assert back.schema == model.schema
    assert back.scaler_mean is None
    # Loaded model recognizes like the original.
    probe = x[:2].reshape(2, 16, 16)
    a = ef.recognize(model, probe, 0.5)
    b = ef.recognize(back, probe, 0.5)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_stage_state_roundtrip(tmp_path):
    p = str(tmp_path / "state.json")
    s = StageState(stage="detect", last_frame=41, next_face_id=7, extra={"x": 1})
    s.save(p)
    back = StageState.load(p)
    assert back == s
    missing = StageState.load(str(tmp_path / "nope.json"), "train")
    assert missing.stage == "train" and missing.last_frame == -1

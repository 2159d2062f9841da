"""Golden multi-person combined-model parity (VERDICT r4 item 4b).

Retrains the train-v5 combined model (``train-v5.py:349-433``) directly
on the reference's shipped ``faces/lock_version`` galleries + detection
JSONs, read-only, and checks it against
``models/multi_person_model_info.json``.

Oracle caveat, verified from the shipped timestamps: the combined model
was trained 2025-08-21T03:06 on **969** faces, but every shipped
detection JSON was regenerated at 03:18 -- twelve minutes AFTER -- and
today's JSONs resolve to **1348** readable crops (178+272+308+590).
The 969-crop training set no longer exists on disk, so the summed-EVR
oracle (0.97303) cannot be matched exactly by any faithful retrain.
What IS pinned exactly: person_id_map (order and ids), k=100,
face_shape, face counts per shipped JSON; the summed EVR is asserted to
land in a tight band around the shipped value (measured 0.96886 on the
1348-crop set -- 0.4% below the 969-crop value, consistent with the
same data distribution at larger n).
"""

import json
import os

import numpy as np
import pytest

from face_detection_recognization_pca_tpu.pipeline.train_app import (
    train_all_persons,
)


def test_combined_multiperson_retrain_matches_shipped_info(reference_root):
    lock = os.path.join(reference_root, "faces", "lock_version")
    ref_info_path = os.path.join(
        reference_root, "models", "multi_person_model_info.json"
    )
    if not (os.path.isdir(lock) and os.path.exists(ref_info_path)):
        pytest.skip("reference lock_version galleries missing")
    ref_info = json.load(open(ref_info_path))

    # per_person_components=2 keeps the four per-person side models cheap
    # (their own parity is covered by test_pipeline_e2e / the shipped
    # 77->76 quirk test); the combined model is the oracle target here.
    out = train_all_persons(
        lock_dir=lock, save=False, per_person_components=2
    )
    mp = out["multi_person"]

    # Exact structural parity with the shipped info JSON.
    assert mp.person_id_map == ref_info["person_id_map"]
    assert int(mp.n_components) == ref_info["n_components"] == 100
    assert list(mp.face_shape) == ref_info["face_shape"]
    assert ref_info["total_persons"] == len(
        [k for k in out if k != "multi_person"]
    )

    # Face counts match the shipped detection JSONs (the readable set).
    per_json = {}
    for person in ref_info["person_id_map"]:
        d = json.load(
            open(os.path.join(lock, person, f"{person}_faces_detection.json"))
        )
        per_json[person] = len(d["faces"])
    assert mp.features.shape == (sum(per_json.values()), 100)

    # Summed EVR: the shipped 0.97303 came from the vanished 969-crop
    # set (see module docstring); the 1348-crop retrain must land in a
    # tight band around it.  Measured 0.96886; the band fails on wrong
    # preprocessing (no z-score ~ 0.93) or wrong k.
    evr = float(np.sum(mp.explained_variance_ratio))
    ref_evr = ref_info["explained_variance_ratio"]
    assert abs(evr - ref_evr) < 0.01, (evr, ref_evr)

"""CLI wiring: every subcommand end to end (in-process main())."""

import json
import os

import numpy as np
import pytest

from face_detection_recognization_pca_tpu.pipeline.cli import main


@pytest.fixture(scope="module")
def workdir(reference_root, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    return d


def _run(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    return json.loads(out[-1])


def test_cli_detect_train_scan_chain(workdir, reference_root, capsys, monkeypatch):
    monkeypatch.chdir(workdir)
    video = os.path.join(reference_root, "videos/test.mp4")

    out = _run(
        capsys,
        ["detect", "--video", video, "--person", "cliperson", "--max-frames", "5"],
    )
    assert out["faces"] >= 3

    out = _run(capsys, ["train", "--person", "cliperson"])
    assert out["person"] == "cliperson"
    assert out["n_faces"] == out["n_faces"]

    out = _run(
        capsys,
        [
            "scan",
            "--video",
            video,
            "--person",
            "cliperson",
            "--output",
            str(workdir / "rec.mp4"),
            "--max-frames",
            "5",
        ],
    )
    assert out["recognitions"] >= 1

    out = _run(
        capsys,
        [
            "scan",
            "--video",
            video,
            "--multi",
            "--max-frames",
            "3",
        ],
    )
    assert "recognitions" in out

    out = _run(
        capsys,
        [
            "eval",
            "--lock-dir",
            "faces/lock_version",
            "--holdout-every",
            "3",
            "--components",
            "4",
        ],
    )
    assert out["top1_accuracy"] >= 0.0 and out["persons"] == 1


def test_cli_train_all_and_enhanced(workdir, reference_root, capsys, monkeypatch):
    monkeypatch.chdir(workdir)
    if not os.path.isdir(str(workdir / "faces/lock_version/cliperson")):
        pytest.skip("depends on detect test running first")
    out = _run(capsys, ["train", "--all"])
    assert "cliperson" in out and "multi_person" in out

    out = _run(capsys, ["train", "--enhanced", "--person", "cliperson"])
    assert out["crops"] >= 3
    assert os.path.exists(out["model"])


def test_cli_config_roundtrip(workdir, capsys, monkeypatch, tmp_path):
    from face_detection_recognization_pca_tpu.config import PipelineConfig

    cfg = PipelineConfig()
    p = tmp_path / "cfg.json"
    p.write_text(cfg.to_json())
    back = PipelineConfig.from_json(p.read_text())
    assert back == cfg  # full-tree round trip, every subconfig
    assert back.detect.template_scales == cfg.detect.template_scales
    assert back.recognize.pca_gate == cfg.recognize.pca_gate


def test_cli_config_rejects_unknown_keys():
    """Misplaced keys must fail loudly, not silently use defaults."""
    from face_detection_recognization_pca_tpu.config import PipelineConfig

    with pytest.raises(ValueError, match="faces_root"):
        PipelineConfig.from_json('{"faces_root": "/x"}')  # missing "paths" nesting
    with pytest.raises(ValueError, match=r"paths\."):
        PipelineConfig.from_json('{"paths": {"face_root": "/x"}}')  # typo
    ok = PipelineConfig.from_json('{"paths": {"faces_root": "/x"}}')
    assert ok.paths.faces_root == "/x"


def test_cli_bad_args():
    with pytest.raises(SystemExit):
        main(["scan"])  # missing mode
    with pytest.raises(SystemExit):
        main(["train"])  # missing person/all


def test_cli_gen_json(tmp_path, capsys):
    """fdrp gen-json == the reference's standalone
    generate_detection_json.py main(): backfill every bare person dir,
    skip dirs that already have a JSON."""
    import cv2

    lock = tmp_path / "lock"
    for person, n in (("alice", 3), ("bob", 2)):
        d = lock / person
        d.mkdir(parents=True)
        for i in range(n):
            img = np.full((32, 24, 3), 100 + i, np.uint8)
            cv2.imwrite(str(d / f"face_{i:06d}_frame_{i * 4:06d}.jpg"), img)
    # bob already has a JSON -> skipped, like the reference (:144-146).
    pre = lock / "bob" / "bob_faces_detection.json"
    pre.write_text("{}")

    out = _run(capsys, ["gen-json", "--lock-dir", str(lock)])
    assert [g["faces"] for g in out["generated"]] == [3]
    assert out["generated"][0]["path"].endswith("alice_faces_detection.json")
    assert out["skipped"] == [str(pre)]

    data = json.loads(
        (lock / "alice" / "alice_faces_detection.json").read_text()
    )
    assert data["total_faces_detected"] == 3
    assert data["fps"] == 30.0
    recs = data["faces"]
    assert [r["frame_number"] for r in recs] == [0, 4, 8]
    assert all(r["x"] == 0 and r["y"] == 0 for r in recs)
    assert recs[0]["width"] == 24 and recs[0]["height"] == 32

    # --force regenerates the skipped one.
    out = _run(
        capsys, ["gen-json", "--lock-dir", str(lock), "--person", "bob", "--force"]
    )
    assert [g["faces"] for g in out["generated"]] == [2]

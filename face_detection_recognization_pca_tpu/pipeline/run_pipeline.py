"""End-to-end orchestrator: detect -> train -> recognize, in process.

The reference chains three scripts via ``subprocess.run`` with all
state on the filesystem (``run_pipeline.py:228-248``).  Here the stages
are library calls sharing in-memory state (artifacts still land on disk
in the reference layout), which removes the process boundaries and the
reference's latent bug of invoking a non-existent script in video mode
(``run_pipeline.py:245``).
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

from face_detection_recognization_pca_tpu.config import PipelineConfig
from face_detection_recognization_pca_tpu.pipeline.detect_app import detect_video
from face_detection_recognization_pca_tpu.pipeline.scan_app import (
    scan_multimodel,
    scan_video_guided,
)
from face_detection_recognization_pca_tpu.pipeline.train_app import (
    train_single_person,
)
from face_detection_recognization_pca_tpu.utils.logging import get_logger

log = get_logger("fdrp.pipeline")


def run_pipeline(
    person_name: str,
    video_path: Optional[str] = None,
    live: bool = False,
    config: Optional[PipelineConfig] = None,
    output_dir: Optional[str] = None,
    max_frames: Optional[int] = None,
    scan: bool = True,
    enhanced: bool = False,
) -> dict:
    """Full detect/train/recognize flow for one person.

    ``--live`` records from the webcam first (run_pipeline.py:71-137);
    otherwise ``video_path`` is required.  Returns a dict of artifact
    paths + per-stage summaries (the reference's "expected outputs"
    listing, run_pipeline.py:267-277).
    """
    cfg = config or PipelineConfig()
    out: dict = {"person": person_name}

    if live:
        from face_detection_recognization_pca_tpu.io.video import record_camera

        tmp = os.path.join(
            tempfile.gettempdir(), f"fdrp_live_{person_name}.mp4"
        )
        frames = record_camera(
            tmp,
            seconds=cfg.video.live_seconds,
            fps=cfg.video.live_fps,
            size_wh=cfg.video.live_size,
        )
        log.info("recorded %d webcam frames to %s", frames, tmp)
        video_path = tmp
        out["recorded_video"] = tmp
    if not video_path:
        raise ValueError("video_path required unless live=True")

    log.info("=== stage 1/3: detection ===")
    det = detect_video(
        video_path, person_name, config=cfg, max_frames=max_frames
    )
    out["faces_detected"] = det.total_faces_detected
    if det.total_faces_detected == 0:
        raise RuntimeError("no faces detected; aborting pipeline")

    log.info("=== stage 2/3: training ===")
    art = train_single_person(person_name, config=cfg)
    out["n_components"] = art.n_components
    person_dir = os.path.join(cfg.paths.lock_dir, person_name)
    out["model_path"] = os.path.join(person_dir, "face_model.pkl")

    if enhanced:
        # Enhanced-pipeline variant (useless/run_pipeline_enhanced.py):
        # train the multi-feature ensemble alongside the PCA model.
        import cv2

        from face_detection_recognization_pca_tpu.models.enhanced import (
            save_enhanced,
            train_enhanced,
        )

        crops = []
        for rec in art.face_info or []:
            path = rec.get("image_path", "")
            if not os.path.exists(path):
                path = os.path.join(
                    person_dir, os.path.basename(str(path).replace("\\", "/"))
                )
            img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
            if img is not None:
                crops.append(img)
        if crops:
            emodel = train_enhanced(crops, [0] * len(crops), {person_name: 0})
            epath = os.path.join(person_dir, "enhanced_model.pkl")
            save_enhanced(emodel, epath)
            out["enhanced_model_path"] = epath

    if scan:
        log.info("=== stage 3/3: recognition ===")
        output_dir = output_dir or cfg.paths.output_dir
        os.makedirs(output_dir, exist_ok=True)
        if live:
            results = scan_multimodel(
                0, config=cfg, max_frames=max_frames
            )
        else:
            rec_path = os.path.join(output_dir, "recognition_output.mp4")
            results = scan_video_guided(
                video_path,
                person_name,
                config=cfg,
                output_path=rec_path,
                max_frames=max_frames,
            )
            out["recognition_video"] = rec_path
        out["recognitions"] = len(results)
    return out

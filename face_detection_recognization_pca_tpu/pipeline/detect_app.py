"""Detection stage: video -> face crops + detection JSON.

Parity with reference ``detection-v4.py``: Haar detectMultiScale with
(1.1, 5, (30, 30)), raw BGR crops saved as
``face_{face_id:06d}_frame_{frame:06d}.jpg`` under
``faces/lock_version/<person>/``, and the detection-JSON schema of
``detection-v4.py:71-84,98-105``.  Detection runs on the configured
engine (our JAX Haar cascade; OpenCV's CascadeClassifier is absent from
cv2 5.0 wheels).
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Optional

from face_detection_recognization_pca_tpu.config import PipelineConfig
from face_detection_recognization_pca_tpu.detect.haar import HaarDetector
from face_detection_recognization_pca_tpu.io.detection_json import (
    DetectionFile,
    DetectionRecord,
    write_detection_json,
)
from face_detection_recognization_pca_tpu.io.video import VideoReader
from face_detection_recognization_pca_tpu.utils.logging import get_logger

log = get_logger("fdrp.detect")


def detect_video(
    video_path: str,
    person_name: str,
    output_root: Optional[str] = None,
    config: Optional[PipelineConfig] = None,
    detector: Optional[HaarDetector] = None,
    max_frames: Optional[int] = None,
    progress_every: int = 30,
) -> DetectionFile:
    """Run detection over a video and persist crops + JSON.

    Returns the in-memory DetectionFile (also written to
    ``<output_root>/<person>/<person>_faces_detection.json``).
    """
    import cv2

    cfg = config or PipelineConfig()
    out_dir = os.path.join(output_root or cfg.paths.lock_dir, person_name)
    os.makedirs(out_dir, exist_ok=True)
    detector = detector or HaarDetector()

    reader = VideoReader(video_path)
    meta = reader.meta
    records = []
    face_id = 0
    frame_no = 0
    for frame in reader.frames():
        if max_frames is not None and frame_no >= max_frames:
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        faces = detector.detect_multi_scale(
            gray,
            cfg.detect.scale_factor,
            cfg.detect.min_neighbors,
            cfg.detect.min_size,
        )
        for (x, y, w, h) in faces:
            crop = frame[y : y + h, x : x + w]
            if crop.size == 0:
                continue
            fname = f"face_{face_id:06d}_frame_{frame_no:06d}.jpg"
            fpath = os.path.join(out_dir, fname)
            cv2.imwrite(fpath, crop)
            records.append(
                DetectionRecord(
                    face_id=face_id,
                    frame_number=frame_no,
                    timestamp=frame_no / meta.fps,
                    x=int(x),
                    y=int(y),
                    width=int(w),
                    height=int(h),
                    center_x=int(x + w // 2),
                    center_y=int(y + h // 2),
                    area=int(w * h),
                    image_path=fpath,
                    image_filename=fname,
                )
            )
            face_id += 1
        frame_no += 1
        if progress_every and frame_no % progress_every == 0:
            log.info("processed %d frames, %d faces", frame_no, face_id)
    reader.close()

    det = DetectionFile(
        video_path=video_path,
        total_frames=frame_no,
        fps=meta.fps,
        total_faces_detected=face_id,
        processing_date=datetime.now().isoformat(),
        faces=records,
    )
    json_path = os.path.join(out_dir, f"{person_name}_faces_detection.json")
    write_detection_json(det, json_path)
    log.info("wrote %d faces to %s", face_id, json_path)
    return det

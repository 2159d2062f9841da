"""Detection stage: video -> face crops + detection JSON.

Parity with reference ``detection-v4.py``: Haar detectMultiScale with
(1.1, 5, (30, 30)), raw BGR crops saved as
``face_{face_id:06d}_frame_{frame:06d}.jpg`` under
``faces/lock_version/<person>/``, and the detection-JSON schema of
``detection-v4.py:71-84,98-105``.  Detection runs on the configured
engine (our JAX Haar cascade; OpenCV's CascadeClassifier is absent from
cv2 5.0 wheels).

:func:`detect_video_v1` reproduces the v1 generation
(``useless/detection.py``) that produced the shipped
``faces/{Light,Dark}_version`` datasets: 20 px padded boxes, crops
resized to 100x100, ``{person}_face_{id:04d}.jpg`` naming with
resumable id numbering, and a ``{video}_metadata.json`` sidecar.
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


def next_face_id(output_dir: str, person_name: str) -> int:
    """Next available v1 face id: max over existing
    ``{person}_face_{id:04d}.jpg`` files + 1, starting at 1
    (reference ``useless/detection.py:8-35``)."""
    if not os.path.isdir(output_dir):
        return 1
    max_id = 0
    prefix = f"{person_name}_face_"
    for name in os.listdir(output_dir):
        if name.startswith(prefix) and name.endswith(".jpg"):
            try:
                max_id = max(max_id, int(name[len(prefix) : -4]))
            except ValueError:
                continue
    return max_id + 1


def detect_video_v1(
    video_path: str,
    output_dir: str,
    person_name: str,
    config: Optional[PipelineConfig] = None,
    detector: Optional[HaarDetector] = None,
    max_frames: Optional[int] = None,
    padding: int = 20,
    crop_size: int = 100,
    progress_every: int = 100,
) -> dict:
    """v1-generation detection (``useless/detection.py:37-156``).

    Per frame: Haar detect, pad each box ``padding`` px clamped to the
    frame, resize the BGR crop to ``crop_size`` square, save as
    ``{person}_face_{id:04d}.jpg`` (ids resume from existing files via
    :func:`next_face_id`), and record metadata.  Writes
    ``{video_stem}_metadata.json`` next to the crops and a
    :class:`~..io.checkpoint.StageState` sidecar; returns the metadata
    dict (``video_name, person_name, detection_timestamp, faces[]`` with
    ``face_id, frame_number, filename, bbox, face_size`` per face).
    """
    import cv2

    from face_detection_recognization_pca_tpu.io.checkpoint import StageState

    cfg = config or PipelineConfig()
    os.makedirs(output_dir, exist_ok=True)
    detector = detector or HaarDetector()
    state_path = os.path.join(
        output_dir, f".{person_name}_detect_v1_state.json"
    )
    state = StageState.load(state_path, default_stage="detect_v1")
    # Resume rule: filename scan is the reference's source of truth
    # (useless/detection.py:60); the StageState only corroborates it
    # (covers externally-deleted crops without reusing ids).
    starting_face_id = max(
        next_face_id(output_dir, person_name), state.next_face_id or 1
    )

    reader = VideoReader(video_path)
    metadata = {
        "video_name": os.path.basename(video_path),
        "person_name": person_name,
        "detection_timestamp": datetime.now().isoformat(),
        "faces": [],
    }
    frame_count = 0
    face_count = 0
    for frame in reader.frames():
        if max_frames is not None and frame_count >= max_frames:
            break
        frame_count += 1  # v1 counts frames from 1 (detection.py:81)
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        faces = detector.detect_multi_scale(
            gray,
            cfg.detect.scale_factor,
            cfg.detect.min_neighbors,
            cfg.detect.min_size,
        )
        for (x, y, w, h) in faces:
            face_count += 1
            current_face_id = starting_face_id + face_count - 1
            x0 = max(0, x - padding)
            y0 = max(0, y - padding)
            x1 = min(frame.shape[1], x + w + padding)
            y1 = min(frame.shape[0], y + h + padding)
            crop = frame[y0:y1, x0:x1]
            if crop.size == 0:
                face_count -= 1
                continue
            resized = cv2.resize(crop, (crop_size, crop_size))
            fname = f"{person_name}_face_{current_face_id:04d}.jpg"
            cv2.imwrite(os.path.join(output_dir, fname), resized)
            metadata["faces"].append(
                {
                    "face_id": current_face_id,
                    "frame_number": frame_count,
                    "filename": fname,
                    "bbox": {
                        "x": int(x),
                        "y": int(y),
                        "width": int(w),
                        "height": int(h),
                    },
                    "face_size": {"width": crop_size, "height": crop_size},
                }
            )
        if progress_every and frame_count % progress_every == 0:
            log.info(
                "processed %d frames, found %d faces", frame_count, face_count
            )
    reader.close()

    state.last_frame = frame_count - 1
    state.next_face_id = starting_face_id + face_count
    state.save(state_path)

    video_stem = os.path.basename(video_path).split(".")[0]
    meta_path = os.path.join(output_dir, f"{video_stem}_metadata.json")
    import json

    with open(meta_path, "w", encoding="utf-8") as f:
        json.dump(metadata, f, indent=2, ensure_ascii=False)
    log.info(
        "v1 detection: %d frames, %d faces, metadata -> %s",
        frame_count,
        face_count,
        meta_path,
    )
    return metadata

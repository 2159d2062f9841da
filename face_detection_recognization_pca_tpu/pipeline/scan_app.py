"""Recognition stage: guided video scanner + multi-model live scanner.

Two reference entry points reproduced:

* **video mode** (``scripts/manual|auto/scan-template-v2.py``): the
  training video's detection JSON is a position prior; per frame the
  guided matcher searches a 1.5x window around each nearby prior, the
  best hit is cropped, projected, cosine-matched (threshold 0.7), the
  frame annotated, and per-frame records accumulated into
  ``recognition_results.json`` next to ``recognition_output.mp4``
  (schema of ``scan-template-v2.py:536-598``).

* **live mode** (``scan-template-v4.py``): every person model's
  templates detect by full-frame multi-scale NCC, multi-face
  arbitration picks one detection (0.5 size + 0.5 PCA), PCA verifies
  across all models, names fuse per the v4 rules.  ``--live`` uses the
  webcam; any video path exercises the same logic offline.
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import List, Optional

import numpy as np

from face_detection_recognization_pca_tpu.config import PipelineConfig
from face_detection_recognization_pca_tpu.detect.guided import GuidedMatcher
from face_detection_recognization_pca_tpu.detect.template import (
    TemplateBank,
    TemplateDetector,
)
from face_detection_recognization_pca_tpu.io.artifacts import load_model
from face_detection_recognization_pca_tpu.io.detection_json import (
    read_detection_json,
    reference_positions,
)
from face_detection_recognization_pca_tpu.io.video import VideoReader, VideoWriter
from face_detection_recognization_pca_tpu.models import eigenfaces as ef
from face_detection_recognization_pca_tpu.recognize.engine import (
    ModelStack,
    MultiModelRecognizer,
)
from face_detection_recognization_pca_tpu.recognize.fusion import (
    UNKNOWN,
    arbitration_score,
    fuse_template_pca,
)
from face_detection_recognization_pca_tpu.utils import annotate
from face_detection_recognization_pca_tpu.utils.logging import Counters, get_logger

log = get_logger("fdrp.scan")


def _load_guided_assets(person_name: str, lock: str):
    """Model + detection JSON + first-crop template for guided scans
    (reference loader ``scan-template-v2.py:90-125``)."""
    import cv2

    person_dir = os.path.join(lock, person_name)
    art = load_model(os.path.join(person_dir, "face_model.pkl"))
    model = ef.from_artifact(art, dtype=np.float32)
    det_json = read_detection_json(
        os.path.join(person_dir, f"{person_name}_faces_detection.json")
    )
    # Template = first training crop (scan-template-v2.py:115-119).
    first = next((r for r in det_json.faces if r.image_path), None)
    tpath = first.image_path if first else None
    if tpath and not os.path.exists(tpath):
        tpath = os.path.join(
            person_dir, os.path.basename(str(tpath).replace("\\", "/"))
        )
    template = cv2.imread(tpath, cv2.IMREAD_GRAYSCALE) if tpath else None
    if template is None:
        raise ValueError(f"no usable template crop for {person_name}")
    return art, model, det_json, template


def scan_video_guided(
    video_path: str,
    person_name: str,
    lock_dir: Optional[str] = None,
    output_path: Optional[str] = None,
    config: Optional[PipelineConfig] = None,
    max_frames: Optional[int] = None,
) -> List[dict]:
    """Guided video recognition (scan-template-v2 video mode)."""
    import cv2

    cfg = config or PipelineConfig()
    lock = lock_dir or cfg.paths.lock_dir
    art, model, det_json, template = _load_guided_assets(person_name, lock)
    matcher = GuidedMatcher(template, cfg.detect.search_scale_video)

    reader = VideoReader(video_path)
    meta = reader.meta
    output_path = output_path or "recognition_output.mp4"
    writer = VideoWriter(output_path, (meta.width, meta.height), meta.fps)
    results: List[dict] = []
    counters = Counters()
    frame_no = 0
    names_by_id = art.names_by_id

    for frame in reader.frames():
        if max_frames is not None and frame_no >= max_frames:
            break
        counters.inc("frames")
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        priors = reference_positions(
            det_json, frame_no, cfg.detect.frame_tolerance
        )
        hit = matcher.match_frame(gray, priors, frame_no) if priors else None
        if hit is not None:
            counters.inc("frames_with_detection")
            x, y, w, h = hit["x"], hit["y"], hit["width"], hit["height"]
            crop = frame[y : y + h, x : x + w]
            pid, conf = -1, 0.0
            if crop.size:
                ids, confs = ef.recognize(
                    model,
                    crop[None],
                    threshold=cfg.recognize.cosine_threshold,
                )
                pid, conf = int(ids[0]), float(confs[0])
            name = names_by_id.get(pid, UNKNOWN) if pid >= 0 else UNKNOWN
            if name != UNKNOWN:
                counters.inc("frames_recognized")
            results.append(
                {
                    "frame_number": int(frame_no),
                    "timestamp": float(frame_no / meta.fps if meta.fps else 0),
                    "x": int(x),
                    "y": int(y),
                    "width": int(w),
                    "height": int(h),
                    "person_id": int(pid),
                    "person_name": str(name),
                    "confidence": float(conf),
                    "template_match_confidence": float(hit["confidence"]),
                    "ref_frame_diff": int(hit.get("ref_frame_diff", 0)),
                }
            )
            annotate.draw_guided(frame, (x, y, w, h), name, conf)
        writer.write(frame)
        frame_no += 1
        if frame_no % 100 == 0:
            log.info("progress %d/%d frames", frame_no, meta.frame_count)

    reader.close()
    writer.close()
    results_path = (
        output_path.replace("recognition_output.mp4", "recognition_results.json")
        if output_path.endswith("recognition_output.mp4")
        else os.path.splitext(output_path)[0] + "_results.json"
    )
    with open(results_path, "w", encoding="utf-8") as f:
        json.dump(
            {
                "video_path": video_path,
                "total_frames": meta.frame_count,
                "fps": meta.fps,
                "total_recognitions": len(results),
                "processing_date": datetime.now().isoformat(),
                "results": results,
            },
            f,
            indent=2,
            ensure_ascii=False,
        )
    log.info("\n%s", counters.recognition_summary())
    return results


def scan_live_guided(
    person_name: str,
    lock_dir: Optional[str] = None,
    camera_index: int = 0,
    output_path: Optional[str] = None,
    config: Optional[PipelineConfig] = None,
    max_frames: Optional[int] = None,
    frame_source=None,
) -> List[dict]:
    """Guided live-camera recognition (``FaceScanner.process_live_camera``,
    reference ``scripts/manual/scan-template-v2.py:298-423``).

    Live-mode semantics: the position prior is fixed to the training
    video's **frame-0** detections with tolerance 10 (``:326``), the
    search window is ``search_scale_live`` = 2.0x (``:343``), and a
    lower ``guided_threshold_live`` = 0.3 match gate (``:393``) admits
    the hit; the crop is PCA-recognized and overlaid with the
    ``"{name} ({conf:.2f}) TM:{tm:.2f}"`` label (``:401-408``).

    ``frame_source``: optional iterable of BGR frames replacing the
    webcam (tests / offline replay).  Unlike the reference (which
    returns an always-empty list, ``:319,423``), every admitted hit is
    recorded with the guided record schema.
    """
    import cv2

    cfg = config or PipelineConfig()
    lock = lock_dir or cfg.paths.lock_dir
    art, model, det_json, template = _load_guided_assets(person_name, lock)
    matcher = GuidedMatcher(template, cfg.detect.search_scale_live)
    # Frame-0 priors, computed once: live frames have no training-video
    # frame numbers to align to (scan-template-v2.py:326).
    priors = reference_positions(det_json, 0, cfg.detect.frame_tolerance_live)
    names_by_id = art.names_by_id

    closer = None
    if frame_source is None:
        cap = cv2.VideoCapture(camera_index)
        if not cap.isOpened():
            raise IOError(f"cannot open camera {camera_index}")
        frame_source = iter(
            lambda: cap.read()[1] if cap.isOpened() else None, None
        )
        closer = cap.release

    writer = None
    results: List[dict] = []
    counters = Counters()
    frame_no = 0
    try:
        for frame in frame_source:
            if frame is None or (
                max_frames is not None and frame_no >= max_frames
            ):
                break
            counters.inc("frames")
            if writer is None and output_path:
                writer = VideoWriter(
                    output_path,
                    (frame.shape[1], frame.shape[0]),
                    cfg.video.live_fps,
                )
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            hit = (
                matcher.match_frame(gray, priors, frame_no) if priors else None
            )
            if (
                hit is not None
                and hit["confidence"] > cfg.detect.guided_threshold_live
            ):
                counters.inc("frames_with_detection")
                x, y, w, h = hit["x"], hit["y"], hit["width"], hit["height"]
                crop = frame[y : y + h, x : x + w]
                pid, conf = -1, 0.0
                if crop.size:
                    ids, confs = ef.recognize(
                        model,
                        crop[None],
                        threshold=cfg.recognize.cosine_threshold,
                    )
                    pid, conf = int(ids[0]), float(confs[0])
                name = names_by_id.get(pid, UNKNOWN) if pid >= 0 else UNKNOWN
                if name != UNKNOWN:
                    counters.inc("frames_recognized")
                annotate.draw_live_guided(
                    frame, (x, y, w, h), name, conf, hit["confidence"]
                )
                results.append(
                    {
                        "frame_number": int(frame_no),
                        "x": int(x),
                        "y": int(y),
                        "width": int(w),
                        "height": int(h),
                        "person_id": int(pid),
                        "person_name": str(name),
                        "confidence": float(conf),
                        "template_match_confidence": float(hit["confidence"]),
                    }
                )
            if writer is not None:
                writer.write(frame)
            frame_no += 1
    finally:
        if closer is not None:
            closer()
        if writer is not None:
            writer.close()
    log.info("\n%s", counters.recognition_summary())
    return results


def scan_haar_multimodel(
    source,
    lock_dir: Optional[str] = None,
    output_path: Optional[str] = None,
    config: Optional[PipelineConfig] = None,
    max_frames: Optional[int] = None,
) -> List[dict]:
    """v3-generation scanning (``useless/scan-template-v3.py``): Haar
    detection per frame, every crop verified against all person models,
    best cosine across models wins (threshold 0.7)."""
    import cv2

    from face_detection_recognization_pca_tpu.detect.haar import HaarDetector

    cfg = config or PipelineConfig()
    lock = lock_dir or cfg.paths.lock_dir
    stack = ModelStack.from_lock_dir(lock)
    recognizer = MultiModelRecognizer(stack, cfg.recognize)
    detector = HaarDetector()

    reader = VideoReader(source)
    meta = reader.meta
    writer = (
        VideoWriter(output_path, (meta.width, meta.height), meta.fps)
        if output_path
        else None
    )
    results: List[dict] = []
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
        )[: cfg.detect.max_detections]
        for (x, y, w, h) in faces:
            crop = frame[y : y + h, x : x + w]
            pid, name, conf = (
                recognizer.recognize_one(crop, cfg.recognize.cosine_threshold)
                if crop.size
                else (-1, UNKNOWN, 0.0)
            )
            if pid < 0:
                name = UNKNOWN
            annotate.draw_guided(frame, (x, y, w, h), name, conf)
            results.append(
                {
                    "frame_number": frame_no,
                    "person_id": int(pid),
                    "person_name": name,
                    "confidence": float(conf),
                    "x": int(x),
                    "y": int(y),
                    "width": int(w),
                    "height": int(h),
                }
            )
        if writer:
            writer.write(frame)
        frame_no += 1
    reader.close()
    if writer:
        writer.close()
    return results


def scan_enhanced_video(
    source,
    person_name: str,
    lock_dir: Optional[str] = None,
    output_path: Optional[str] = None,
    config: Optional[PipelineConfig] = None,
    max_frames: Optional[int] = None,
) -> List[dict]:
    """Enhanced-model scanning (``useless/scan-enhanced.py``): Haar
    detection, per-crop angle classification (profile cascade), and the
    weighted multi-branch ensemble with angle-aware reweighting."""
    import cv2

    from face_detection_recognization_pca_tpu.detect.haar import HaarDetector
    from face_detection_recognization_pca_tpu.models.enhanced import (
        detect_face_angle,
        load_enhanced,
        recognize_enhanced,
    )

    cfg = config or PipelineConfig()
    lock = lock_dir or cfg.paths.lock_dir
    model = load_enhanced(
        os.path.join(lock, person_name, "enhanced_model.pkl")
    )
    detector = HaarDetector()
    reader = VideoReader(source)
    meta = reader.meta
    writer = (
        VideoWriter(output_path, (meta.width, meta.height), meta.fps)
        if output_path
        else None
    )
    results: List[dict] = []
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
            crop = gray[y : y + h, x : x + w]
            if not crop.size:
                continue
            angle = detect_face_angle(crop)
            pid, name, conf = recognize_enhanced(
                model, crop, profile=angle != "frontal"
            )
            annotate.draw_guided(frame, (x, y, w, h), name, conf)
            results.append(
                {
                    "frame_number": frame_no,
                    "person_id": int(pid),
                    "person_name": name,
                    "confidence": float(conf),
                    "angle": angle,
                    "x": int(x),
                    "y": int(y),
                    "width": int(w),
                    "height": int(h),
                }
            )
        if writer:
            writer.write(frame)
        frame_no += 1
    reader.close()
    if writer:
        writer.close()
    return results


def scan_multimodel_batched(
    source,
    lock_dir: Optional[str] = None,
    output_path: Optional[str] = None,
    config: Optional[PipelineConfig] = None,
    max_frames: Optional[int] = None,
    batch_frames: Optional[int] = None,
) -> List[dict]:
    """Batched v4 multi-model video scan (scan-template-v4 semantics at
    batch granularity, reference ``scan-template-v4.py:321-437``).

    The per-frame path (:func:`scan_multimodel`) pays one device
    dispatch per frame per scale for detection plus one per crop for
    PCA verification.  Here a whole frame batch runs through
    :meth:`~..detect.template.TemplateDetector.detect_fused_batch`
    (one dispatch per scale for the batch) and every crop of the batch
    is verified in :meth:`~..recognize.engine.MultiModelRecognizer.
    recognize_batch` grouped by box size (the fused detector emits only
    ``len(template_scales)`` distinct sizes, so PCA verification is
    ~3 dispatches per batch regardless of frame count).  Arbitration,
    fusion, overlay, and the record schema are identical to the
    per-frame path.
    """
    import cv2

    cfg = config or PipelineConfig()
    lock = lock_dir or cfg.paths.lock_dir
    stack = ModelStack.from_lock_dir(lock)
    recognizer = MultiModelRecognizer(stack, cfg.recognize)
    # The reference only template-matches persons whose model loaded
    # (templates live in the per-model dict, scan-template-v4.py:46-74).
    bank = TemplateBank.from_person_dirs(
        lock,
        per_person=cfg.detect.templates_per_person,
        persons=set(stack.model_names),
    )
    detector = TemplateDetector(bank, cfg.detect)
    nb = batch_frames or cfg.video.batch_frames

    reader = VideoReader(source)
    meta = reader.meta
    writer = (
        VideoWriter(output_path, (meta.width, meta.height), meta.fps)
        if output_path
        else None
    )
    results: List[dict] = []
    frame_no = 0
    batch: List[np.ndarray] = []

    def flush(batch_frames_list, first_frame_no):
        nonlocal results
        grays = np.stack(
            [
                cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
                for f in batch_frames_list
            ]
        )
        dets_per_frame = detector.detect_fused_batch(grays)
        dets_per_frame = [
            d[: cfg.detect.max_detections] for d in dets_per_frame
        ]
        # Gather every crop of the batch, grouped by box size -> one
        # recognize_batch dispatch per distinct size.
        jobs = []  # (frame_idx, det)
        for bi, dets in enumerate(dets_per_frame):
            for d in dets:
                jobs.append((bi, d))
        pca: dict = {}
        by_size: dict = {}
        for ji, (bi, d) in enumerate(jobs):
            crop = batch_frames_list[bi][
                d.y : d.y + d.height, d.x : d.x + d.width
            ]
            if crop.size:
                by_size.setdefault(crop.shape, []).append((ji, crop))
            else:
                pca[ji] = (-1, UNKNOWN, 0.0)
        for shape, items in by_size.items():
            crops = np.stack([c for _, c in items])
            outs = recognizer.recognize_batch(crops, cfg.recognize.pca_gate)
            for (ji, _), o in zip(items, outs):
                pca[ji] = o
        # Per-frame arbitration + fusion (identical to the scalar path).
        job_of_frame: dict = {}
        for ji, (bi, d) in enumerate(jobs):
            job_of_frame.setdefault(bi, []).append((ji, d))
        for bi, frame in enumerate(batch_frames_list):
            frame_jobs = job_of_frame.get(bi, [])
            if len(frame_jobs) > 1:
                best_sc, best = -1.0, None
                for ji, d in frame_jobs:
                    sc = arbitration_score(
                        d.width, d.height, pca[ji][2], cfg.recognize
                    )
                    if sc > best_sc:
                        best_sc, best = sc, (ji, d)
                frame_jobs = [best] if best else []
            for ji, d in frame_jobs:
                pid, pname, pconf = pca[ji]
                final_name, final_conf = fuse_template_pca(
                    d.person_name, d.confidence, pname, pconf, cfg.recognize
                )
                annotate.draw_v4(
                    frame,
                    (d.x, d.y, d.width, d.height),
                    final_name,
                    d.confidence,
                    pconf,
                )
                results.append(
                    {
                        "frame_number": first_frame_no + bi,
                        "person_name": final_name,
                        "template_confidence": float(d.confidence),
                        "pca_confidence": float(pconf),
                        "final_confidence": float(final_conf),
                        "x": d.x,
                        "y": d.y,
                        "width": d.width,
                        "height": d.height,
                    }
                )
            if writer:
                writer.write(frame)

    for frame in reader.frames():
        if max_frames is not None and frame_no >= max_frames:
            break
        batch.append(frame)
        frame_no += 1
        if len(batch) >= nb:
            flush(batch, frame_no - len(batch))
            batch = []
    if batch:
        flush(batch, frame_no - len(batch))
    reader.close()
    if writer:
        writer.close()
    return results


def scan_multimodel(
    source,
    lock_dir: Optional[str] = None,
    output_path: Optional[str] = None,
    config: Optional[PipelineConfig] = None,
    max_frames: Optional[int] = None,
    fused_detector: bool = True,
) -> List[dict]:
    """Multi-model scanning (scan-template-v4 semantics).

    ``source``: video path, or an int camera index for live mode.
    """
    import cv2

    cfg = config or PipelineConfig()
    lock = lock_dir or cfg.paths.lock_dir
    stack = ModelStack.from_lock_dir(lock)
    recognizer = MultiModelRecognizer(stack, cfg.recognize)
    # The reference only template-matches persons whose model loaded
    # (templates live in the per-model dict, scan-template-v4.py:46-74).
    bank = TemplateBank.from_person_dirs(
        lock,
        per_person=cfg.detect.templates_per_person,
        persons=set(stack.model_names),
    )
    detector = TemplateDetector(bank, cfg.detect)
    detect = detector.detect_fused if fused_detector else detector.detect_parity

    if isinstance(source, int):
        cap = cv2.VideoCapture(source)
        if not cap.isOpened():
            raise IOError(f"cannot open camera {source}")
        meta_fps, meta_w, meta_h = 30.0, int(cap.get(3)), int(cap.get(4))
        frame_iter = iter(lambda: cap.read()[1] if cap.isOpened() else None, None)
        closer = cap.release
    else:
        reader = VideoReader(source)
        meta_fps = reader.meta.fps
        meta_w, meta_h = reader.meta.width, reader.meta.height
        frame_iter = reader.frames()
        closer = reader.close

    writer = (
        VideoWriter(output_path, (meta_w, meta_h), meta_fps)
        if output_path
        else None
    )
    results: List[dict] = []
    frame_no = 0
    for frame in frame_iter:
        if frame is None or (max_frames is not None and frame_no >= max_frames):
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        detections = detect(gray)[: cfg.detect.max_detections]

        # Multi-face arbitration (scan-template-v4.py:352-377).
        pca_cache = {}
        if len(detections) > 1:
            best_sc, best_det = -1.0, None
            for d in detections:
                crop = frame[d.y : d.y + d.height, d.x : d.x + d.width]
                pid, pname, pconf = (
                    recognizer.recognize_one(crop, cfg.recognize.pca_gate)
                    if crop.size
                    else (-1, UNKNOWN, 0.0)
                )
                pca_cache[id(d)] = (pid, pname, pconf)
                sc = arbitration_score(d.width, d.height, pconf, cfg.recognize)
                if sc > best_sc:
                    best_sc, best_det = sc, d
            detections = [best_det] if best_det else []

        for d in detections:
            if id(d) in pca_cache:
                pid, pname, pconf = pca_cache[id(d)]
            else:
                crop = frame[d.y : d.y + d.height, d.x : d.x + d.width]
                pid, pname, pconf = (
                    recognizer.recognize_one(crop, cfg.recognize.pca_gate)
                    if crop.size
                    else (-1, UNKNOWN, 0.0)
                )
            final_name, final_conf = fuse_template_pca(
                d.person_name, d.confidence, pname, pconf, cfg.recognize
            )
            annotate.draw_v4(
                frame,
                (d.x, d.y, d.width, d.height),
                final_name,
                d.confidence,
                pconf,
            )
            results.append(
                {
                    "frame_number": frame_no,
                    "person_name": final_name,
                    "template_confidence": float(d.confidence),
                    "pca_confidence": float(pconf),
                    "final_confidence": float(final_conf),
                    "x": d.x,
                    "y": d.y,
                    "width": d.width,
                    "height": d.height,
                }
            )
        if writer:
            writer.write(frame)
        frame_no += 1
    closer()
    if writer:
        writer.close()
    return results

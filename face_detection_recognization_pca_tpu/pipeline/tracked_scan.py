"""Tracked batch video scanning: the TPU-speed file-scanning path.

The reference's guided video scanner walks frames one at a time in
Python (``scripts/manual/scan-template-v2.py:460-573``).  This mode
keeps its semantics -- a training-crop template searched around a prior
box, PCA verification of the hit -- but runs the whole loop as the
vectorized tracker of :mod:`..parallel.multistream`:

* the first prior comes from the person's detection JSON (or a
  detection pass);
* frames are decoded in batches (native ring buffer when built) and the
  fused step processes a batch per dispatch, feeding the tracked box
  forward;
* results use the guided scanner's record schema, so downstream
  tooling can't tell which engine produced them.

Because the tracker processes a single stream here, CONSECUTIVE frames
fill the TIME axis of :meth:`MultiStreamRecognizer.process_window`:
one device dispatch tracks a whole batch of frames with the window
origin fed forward frame-to-frame ON DEVICE (``lax.scan``) -- the
true per-frame prior chain of the reference's loop (each frame
searches around the previous frame's box), at one host round-trip per
batch instead of per frame.
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from face_detection_recognization_pca_tpu.config import PipelineConfig
from face_detection_recognization_pca_tpu.io.artifacts import load_model
from face_detection_recognization_pca_tpu.io.detection_json import (
    read_detection_json,
)
from face_detection_recognization_pca_tpu.io.video import VideoReader
from face_detection_recognization_pca_tpu.models import eigenfaces as ef
from face_detection_recognization_pca_tpu.ops.resize import (
    resize_bilinear_u8_exact,
)
from face_detection_recognization_pca_tpu.parallel.multistream import (
    MultiStreamRecognizer,
)
from face_detection_recognization_pca_tpu.utils.logging import get_logger

log = get_logger("fdrp.tracked")


def scan_video_tracked(
    video_path: str,
    person_name: str,
    lock_dir: Optional[str] = None,
    output_json: Optional[str] = None,
    config: Optional[PipelineConfig] = None,
    batch: int = 16,
    template_side: Optional[int] = None,
    window: Optional[int] = None,
    max_frames: Optional[int] = None,
) -> List[dict]:
    """Track+recognize a whole video in frame batches.

    Returns guided-scanner-style records (no annotated video -- this is
    the throughput path; use ``scan_video_guided`` for overlays).
    """
    import cv2

    cfg = config or PipelineConfig()
    lock = lock_dir or cfg.paths.lock_dir
    person_dir = os.path.join(lock, person_name)
    art = load_model(os.path.join(person_dir, "face_model.pkl"))
    model = ef.from_artifact(art, dtype=np.float32)
    det_json = read_detection_json(
        os.path.join(person_dir, f"{person_name}_faces_detection.json")
    )
    first = next((r for r in det_json.faces if r.image_path), None)
    tpath = first.image_path if first else None
    if tpath and not os.path.exists(tpath):
        tpath = os.path.join(
            person_dir, os.path.basename(str(tpath).replace("\\", "/"))
        )
    template_full = cv2.imread(tpath, cv2.IMREAD_GRAYSCALE) if tpath else None
    if template_full is None:
        raise ValueError(f"no usable template crop for {person_name}")

    reader = VideoReader(video_path)
    meta = reader.meta

    if template_side is None:
        # Match the prior's face size (the guided scanner resizes the
        # template to the reference box -- scan-template-v2.py:502),
        # rounded to a lane-friendly multiple of 32 and frame-bounded.
        prior_side = (
            first.width if first and first.width > 0 else template_full.shape[0]
        )
        template_side = int(np.clip(round(prior_side / 32) * 32, 64, 256))
        template_side = min(
            template_side, (min(meta.height, meta.width) // 64) * 32
        )
    if window is None:
        window = min(2 * template_side, (min(meta.height, meta.width) // 32) * 32)
        window = max(window, template_side + 32)
    template = np.asarray(
        resize_bilinear_u8_exact(template_full, (template_side, template_side))
    ).astype(np.float32)
    log.info(
        "tracked scan: template %dpx, window %dpx", template_side, window
    )
    msr = MultiStreamRecognizer(model, template, window=window)

    # Prior box from the detection JSON's first record (scaled to the
    # tracker's template size), else centered.
    if first and first.width > 0:
        cx = first.center_x
        cy = first.center_y
        box = np.array(
            [[cx - template_side // 2, cy - template_side // 2, 0, 0]]
        )
        state = msr.init_state(1, (meta.height, meta.width), box)
        prior_frame = int(first.frame_number)
    else:
        state = msr.init_state(1, (meta.height, meta.width))
        prior_frame = 0

    names_by_id = art.names_by_id
    results: List[dict] = []
    frame_no = 0
    for stack, n_valid in reader.batches(batch, gray=True):
        if max_frames is not None and frame_no >= max_frames:
            break
        # (T, S=1, H, W): the batch is the TIME axis; the tracked box
        # feeds forward frame-to-frame inside the dispatch.
        out, state = msr.process_window(
            jnp.asarray(stack.astype(np.float32))[:, None], state
        )
        pid = np.asarray(out["person_id"])[:, 0]
        conf = np.asarray(out["confidence"])[:, 0]
        tm = np.asarray(out["template_confidence"])[:, 0]
        xs = np.asarray(out["x"])[:, 0]
        ys = np.asarray(out["y"])[:, 0]
        for i in range(n_valid):
            p = int(pid[i])
            c = float(conf[i])
            recognized = c >= cfg.recognize.cosine_threshold
            results.append(
                {
                    "frame_number": frame_no,
                    "timestamp": float(frame_no / meta.fps if meta.fps else 0),
                    "x": int(xs[i]),
                    "y": int(ys[i]),
                    "width": template_side,
                    "height": template_side,
                    "person_id": p if recognized else -1,
                    "person_name": str(
                        names_by_id.get(p, "unknown") if recognized else "unknown"
                    ),
                    "confidence": c,
                    "template_match_confidence": float(tm[i]),
                    # Frame distance to the prior actually used: the
                    # previous frame's tracked box (the JSON prior for
                    # the very first frame) -- the tracker's analog of
                    # the reference's best_match['ref_frame_diff']
                    # (scan-template-v2.py:549).
                    "ref_frame_diff": abs(frame_no - prior_frame),
                }
            )
            prior_frame = frame_no
            frame_no += 1
    reader.close()

    if output_json:
        with open(output_json, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "video_path": video_path,
                    "total_frames": meta.frame_count,
                    "fps": meta.fps,
                    "total_recognitions": len(results),
                    "processing_date": datetime.now().isoformat(),
                    "engine": "tracked-multistream",
                    "results": results,
                },
                f,
                indent=2,
                ensure_ascii=False,
            )
    log.info(
        "tracked scan: %d frames, %d recognized",
        len(results),
        sum(1 for r in results if r["person_name"] != "unknown"),
    )
    return results

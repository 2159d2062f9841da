"""Guided template search: training-video detections as position priors.

Reference semantics (``scripts/manual/scan-template-v2.py:463-523``):
for each reference detection near the current frame number, expand its
box by ``search_scale`` around its center (clamped to the frame),
resize the training template to the reference box size, run
TM_CCOEFF_NORMED inside the window, and keep the best hit in global
coordinates.  The final detection is the highest-confidence hit across
priors; the box keeps the reference width/height.

TPU notes: search windows and template sizes vary per prior, which
would force one XLA compile per shape.  Sizes are therefore bucketed to
multiples of ``BUCKET`` (window padded with edge clamp + score masking,
template resized exactly as the reference does -- template size comes
from the JSON prior, which is host data).  Bucketing bounds the number
of compiled variants without changing the argmax (padded area is masked
to -inf).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from face_detection_recognization_pca_tpu.io.detection_json import (
    DetectionFile,
    reference_positions,
)
from face_detection_recognization_pca_tpu.ops.match import (
    match_template_ccoeff_normed,
)
from face_detection_recognization_pca_tpu.ops.resize import (
    resize_bilinear_u8_exact,
)

BUCKET = 32


@functools.partial(jax.jit, static_argnames=("valid_h", "valid_w"))
def _window_best(window: jnp.ndarray, template: jnp.ndarray, valid_h: int, valid_w: int):
    """Best NCC hit inside a (possibly padded) search window.

    Positions whose window extends past the valid (unpadded) region are
    masked out so padding never wins the argmax.
    """
    scores = match_template_ccoeff_normed(window, template)
    oh, ow = scores.shape
    vh = valid_h - template.shape[0] + 1
    vw = valid_w - template.shape[1] + 1
    rows = jnp.arange(oh)[:, None]
    cols = jnp.arange(ow)[None, :]
    mask = (rows < vh) & (cols < vw)
    masked = jnp.where(mask, scores, -jnp.inf)
    flat = masked.reshape(-1)
    idx = jnp.argmax(flat)
    return flat[idx], idx % ow, idx // ow


class GuidedMatcher:
    """Stateless guided matcher over one training template."""

    def __init__(self, template_gray: np.ndarray, search_scale: float = 1.5):
        self.template = np.asarray(template_gray, dtype=np.uint8)
        self.search_scale = search_scale

    def match_frame(
        self,
        frame_gray: np.ndarray,
        priors: Sequence,
        frame_number: int = 0,
    ) -> Optional[dict]:
        """Best guided hit for one frame given prior detections.

        ``priors``: DetectionRecord-like objects with center_x/center_y/
        width/height (and optionally frame_number).  Returns dict(x, y,
        width, height, confidence, ref_frame_diff) or None, exactly
        mirroring the reference's ``all_matches`` + max -- including the
        frame distance of the winning prior
        (``scan-template-v2.py:382,549``).
        """
        height, width = frame_gray.shape
        best = None
        for ref in priors:
            rw, rh = int(ref.width), int(ref.height)
            if rw <= 0 or rh <= 0:
                continue
            search_w = int(rw * self.search_scale)
            search_h = int(rh * self.search_scale)
            sx = max(0, int(ref.center_x) - search_w // 2)
            sy = max(0, int(ref.center_y) - search_h // 2)
            sxe = min(width, sx + search_w)
            sye = min(height, sy + search_h)
            aw, ah = sxe - sx, sye - sy
            if aw <= 0 or ah <= 0 or ah < rh or aw < rw:
                continue
            tmpl = np.asarray(
                resize_bilinear_u8_exact(self.template, (rw, rh))
            ).astype(np.float32)
            # Bucket the window shape: pad with edge values, mask scores.
            bw = -(-aw // BUCKET) * BUCKET
            bh = -(-ah // BUCKET) * BUCKET
            window = frame_gray[sy:sye, sx:sxe].astype(np.float32)
            if bw != aw or bh != ah:
                window = np.pad(
                    window, ((0, bh - ah), (0, bw - aw)), mode="edge"
                )
            conf, lx, ly = _window_best(
                jnp.asarray(window), jnp.asarray(tmpl), ah, aw
            )
            conf = float(conf)
            hit = {
                "x": sx + int(lx),
                "y": sy + int(ly),
                "width": rw,
                "height": rh,
                "confidence": conf,
                "ref_frame_diff": abs(
                    int(getattr(ref, "frame_number", frame_number))
                    - int(frame_number)
                ),
            }
            if best is None or conf > best["confidence"]:
                best = hit
        return best

    def match_with_detection_file(
        self,
        frame_gray: np.ndarray,
        det: DetectionFile,
        frame_number: int,
        tolerance: int = 5,
    ) -> Optional[dict]:
        priors = reference_positions(det, frame_number, tolerance)
        return self.match_frame(frame_gray, priors, frame_number)

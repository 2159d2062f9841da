"""Full-frame multi-template TM_CCOEFF detection (the reference's
template-matching-as-detector generation, ``useless/scan-template.py``).

Reference semantics (``useless/scan-template.py:59-166``): load at most
10 templates per ``faces/`` subdirectory, resize the *frame* by each
scale in {0.5, 0.7, 1.0, 1.3, 1.6}, run plain (unnormalized) TM_CCOEFF
per template, take every location whose raw score clears ``threshold``,
map boxes back to original coordinates (``x/scale``, template size
``/scale``), and prune with ``cv2.dnn.NMSBoxes``-style greedy IoU NMS.
The surviving boxes feed the v1 dual-PCA recognizer
(:func:`..pipeline.v1_apps.scan_dual`).

TPU-first design: templates are grouped by shape and each
(scale, shape-group) evaluates as ONE device program -- a batched rFFT
correlation of the frame with all zero-meaned templates in the group
(TM_CCOEFF == plain correlation with the zero-mean template, see
:func:`..ops.match.match_template_ccoeff`), followed by an on-device
``top_k`` over every (template, position).  The reference's
``np.where(result >= threshold)`` yields dynamic-length candidate
lists, which XLA cannot shape; a fixed ``max_candidates`` slot count
bounds it (greedy NMS consumes candidates best-first, so the top-K set
decides identically whenever fewer than K candidates survive NMS).
"""

from __future__ import annotations

import functools
import glob
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from face_detection_recognization_pca_tpu.ops.match import (
    match_template_ccoeff,  # single-template op (kept as the spec/oracle)
)
from face_detection_recognization_pca_tpu.ops.nms import nms_boxes_cv2

DEFAULT_SCALES = (0.5, 0.7, 1.0, 1.3, 1.6)


@functools.partial(jax.jit, static_argnames=("k",))
def _ccoeff_topk(
    frame: jnp.ndarray, t0: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k raw CCOEFF scores of all templates against one frame.

    frame ``(H, W)`` f32, t0 ``(T, th, tw)`` zero-meaned templates ->
    (scores ``(k,)`` desc, flat indices ``(k,)`` into ``(T, oh, ow)``).
    One frame rFFT is shared by every template in the group.
    """
    from face_detection_recognization_pca_tpu.ops.match import _next_fast_len

    h, w = frame.shape
    th, tw = t0.shape[1], t0.shape[2]
    oh, ow = h - th + 1, w - tw + 1
    h2, w2 = _next_fast_len(h), _next_fast_len(w)
    ff = jnp.fft.rfft2(frame, (h2, w2))
    kf = jnp.conj(jnp.fft.rfft2(t0, (h2, w2)))
    maps = jnp.fft.irfft2(ff[None] * kf, (h2, w2))[:, :oh, :ow]
    flat = maps.reshape(-1)
    kk = min(k, flat.shape[0])
    vals, idx = jax.lax.top_k(flat, kk)
    return vals, idx


class CcoeffTemplateDetector:
    """Reference template-matching detector, fused per (scale, group).

    Exposes both :meth:`detect` and a Haar-protocol adapter
    :meth:`detect_multi_scale` so it drops into
    :func:`..pipeline.v1_apps.scan_dual` as the detection engine.
    """

    def __init__(
        self,
        templates: Sequence[np.ndarray],
        scales: Sequence[float] = DEFAULT_SCALES,
        threshold: float = 0.7,
        nms_threshold: float = 0.3,
        max_candidates: int = 128,
    ):
        self.scales = tuple(scales)
        self.threshold = float(threshold)
        self.nms_threshold = float(nms_threshold)
        self.max_candidates = int(max_candidates)
        # Group templates by shape so each group is one batched program.
        groups: dict = {}
        for t in templates:
            t = np.asarray(t, dtype=np.float32)
            groups.setdefault(t.shape, []).append(t - t.mean())
        self.groups = [
            (shape, jnp.asarray(np.stack(ts))) for shape, ts in groups.items()
        ]

    @staticmethod
    def from_faces_dir(
        faces_dir: str,
        per_dir: int = 10,
        scales: Sequence[float] = DEFAULT_SCALES,
        threshold: float = 0.7,
        nms_threshold: float = 0.3,
        max_candidates: int = 128,
    ) -> "CcoeffTemplateDetector":
        """Reference loading rule (``useless/scan-template.py:59-99``):
        first ``per_dir`` (default 10) ``*.jpg`` files of every
        subdirectory of ``faces_dir``, grayscale."""
        import cv2

        templates = []
        for sub in sorted(os.listdir(faces_dir)):
            sdir = os.path.join(faces_dir, sub)
            if not os.path.isdir(sdir):
                continue
            for p in sorted(glob.glob(os.path.join(sdir, "*.jpg")))[:per_dir]:
                img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
                if img is not None:
                    templates.append(img)
        if not templates:
            raise ValueError(f"no templates under {faces_dir}")
        return CcoeffTemplateDetector(
            templates, scales, threshold, nms_threshold, max_candidates
        )

    def detect(
        self, gray_frame: np.ndarray
    ) -> List[Tuple[int, int, int, int]]:
        """Detected boxes ``[(x, y, w, h)]`` in original coordinates."""
        import cv2

        fh, fw = gray_frame.shape
        cands: List[Tuple[float, int, int, int, int]] = []
        for scale in self.scales:
            if scale != 1.0:
                scaled = cv2.resize(gray_frame, None, fx=scale, fy=scale)
            else:
                scaled = gray_frame
            sh, sw = scaled.shape
            frame_j = jnp.asarray(scaled.astype(np.float32))
            for (th, tw), t0 in self.groups:
                if th > sh or tw > sw:
                    continue
                vals, idx = _ccoeff_topk(frame_j, t0, self.max_candidates)
                vals = np.asarray(vals)
                idx = np.asarray(idx)
                ow = sw - tw + 1
                oh = sh - th + 1
                keep = vals >= self.threshold
                pos = idx[keep] % (oh * ow)
                for v, p in zip(vals[keep], pos):
                    x = int((p % ow) / scale)
                    y = int((p // ow) / scale)
                    cands.append(
                        (float(v), x, y, int(tw / scale), int(th / scale))
                    )
        if not cands:
            return []
        boxes = np.array([[x, y, w, h] for _, x, y, w, h in cands], dtype=np.float64)
        scores = np.array([c[0] for c in cands])
        # cv2.dnn.NMSBoxes semantics (useless/scan-template.py:156): the
        # reference passes its candidate threshold again as NMSBoxes'
        # score_threshold, whose strict > filter re-drops candidates at
        # exactly the threshold.
        keep = np.asarray(
            nms_boxes_cv2(boxes, scores, self.threshold, self.nms_threshold)
        )
        return [
            (int(x), int(y), int(w), int(h))
            for (_, x, y, w, h), k in zip(cands, keep)
            if k
        ]

    # Haar detector protocol (scale_factor/min_neighbors/min_size are
    # Haar knobs; ignored here) so scan_dual can consume this engine.
    def detect_multi_scale(self, gray, *_args, **_kwargs):
        return self.detect(gray)

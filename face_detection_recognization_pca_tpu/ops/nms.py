"""Detection post-processing as jit-able fixed-capacity ops.

Reference semantics reproduced exactly, but over padded static-shape
detection slots (XLA needs static shapes; empty slots carry score -inf):

* IoU greedy NMS -- highest-confidence first, drop overlaps >= threshold
  (``scan-template-v4.py:199-251``);
* border / corner rejection -- drop detections touching the 5% frame
  border or centered in a 15% corner square (``scan-template-v4.py:76-127``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU for ``(N, 4)`` boxes as (x, y, w, h)."""
    x0 = boxes[:, 0]
    y0 = boxes[:, 1]
    x1 = boxes[:, 0] + boxes[:, 2]
    y1 = boxes[:, 1] + boxes[:, 3]
    ix0 = jnp.maximum(x0[:, None], x0[None, :])
    iy0 = jnp.maximum(y0[:, None], y0[None, :])
    ix1 = jnp.minimum(x1[:, None], x1[None, :])
    iy1 = jnp.minimum(y1[:, None], y1[None, :])
    iw = jnp.maximum(ix1 - ix0, 0.0)
    ih = jnp.maximum(iy1 - iy0, 0.0)
    inter = iw * ih
    area = boxes[:, 2] * boxes[:, 3]
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    overlap_threshold: float = 0.3,
) -> jnp.ndarray:
    """Greedy IoU NMS over fixed slots.

    Args:
      boxes: ``(N, 4)`` as (x, y, w, h); padding slots have score -inf.
      scores: ``(N,)`` confidences.

    Returns:
      ``(N,)`` bool keep mask; matches the reference's sort-pop-filter
      loop (strict ``<`` comparison keeps IoU == threshold out).
    """
    boxes = jnp.asarray(boxes)
    scores = jnp.asarray(scores)
    n = boxes.shape[0]
    iou = iou_matrix(boxes.astype(jnp.float32))
    order = jnp.argsort(-scores)  # descending, stable

    def body(i, state):
        keep, suppressed = state
        idx = order[i]
        valid = jnp.logical_and(
            jnp.logical_not(suppressed[idx]), scores[idx] > NEG_INF / 2
        )
        keep = keep.at[idx].set(valid)
        # Suppress everything later in order with IoU >= threshold.
        overlaps = iou[idx] >= overlap_threshold
        overlaps = overlaps.at[idx].set(False)
        suppressed = jnp.where(
            jnp.logical_and(valid, overlaps), True, suppressed
        )
        return keep, suppressed

    keep, _ = jax.lax.fori_loop(
        0,
        n,
        body,
        (jnp.zeros(n, dtype=bool), jnp.zeros(n, dtype=bool)),
    )
    return keep


def nms_boxes_cv2(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    score_threshold: float,
    nms_threshold: float,
) -> jnp.ndarray:
    """``cv2.dnn.NMSBoxes`` semantics over fixed slots (keep mask).

    Pinned empirically against cv2 5.0 (tests/test_ccoeff_detector.py)
    and matching the OpenCV implementation the reference's template
    detector calls (``useless/scan-template.py:156``):

    * boxes with ``score == score_threshold`` are DROPPED (strict ``>``
      filter) -- unlike :func:`nms`, which has no score gate;
    * suppression fires only at ``IoU > nms_threshold`` (strict; a pair
      at exactly the threshold survives) -- :func:`nms` uses ``>=``
      per the v4 scanner's Python loop;
    * equal scores keep the lowest original index.
    """
    boxes = jnp.asarray(boxes)
    scores = jnp.asarray(scores)
    n = boxes.shape[0]
    iou = iou_matrix(boxes.astype(jnp.float32))
    order = jnp.argsort(-scores)  # descending, stable (lowest index first)

    def body(i, state):
        keep, suppressed = state
        idx = order[i]
        valid = jnp.logical_and(
            jnp.logical_not(suppressed[idx]), scores[idx] > score_threshold
        )
        keep = keep.at[idx].set(valid)
        overlaps = iou[idx] > nms_threshold
        overlaps = overlaps.at[idx].set(False)
        suppressed = jnp.where(
            jnp.logical_and(valid, overlaps), True, suppressed
        )
        return keep, suppressed

    keep, _ = jax.lax.fori_loop(
        0,
        n,
        body,
        (jnp.zeros(n, dtype=bool), jnp.zeros(n, dtype=bool)),
    )
    return keep


def in_border_or_corner(
    boxes: jnp.ndarray,
    frame_width: int,
    frame_height: int,
    corner_threshold: float = 0.15,
    border_threshold: float = 0.05,
) -> jnp.ndarray:
    """Vectorized ``is_detection_in_corner`` (scan-template-v4.py:76-127).

    Returns bool ``(N,)``: True if the detection touches a border strip
    or its center lies in a corner square (int-truncated thresholds and
    ``//2`` centers, exactly like the reference).
    """
    x = boxes[:, 0]
    y = boxes[:, 1]
    w = boxes[:, 2]
    h = boxes[:, 3]
    corner_w = jnp.floor(frame_width * corner_threshold)
    corner_h = jnp.floor(frame_height * corner_threshold)
    border_w = jnp.floor(frame_width * border_threshold)
    border_h = jnp.floor(frame_height * border_threshold)
    cx = x + w // 2
    cy = y + h // 2

    on_border = (
        (x < border_w)
        | (y < border_h)
        | ((x + w) > (frame_width - border_w))
        | ((y + h) > (frame_height - border_h))
    )
    tl = (cx < corner_w) & (cy < corner_h)
    tr = (cx > (frame_width - corner_w)) & (cy < corner_h)
    bl = (cx < corner_w) & (cy > (frame_height - corner_h))
    br = (cx > (frame_width - corner_w)) & (cy > (frame_height - corner_h))
    return on_border | tl | tr | bl | br

"""Template-matching face detection (the live v4 pipeline's detector).

Reference behavior (``scan-template-v4.py:129-197``): for every person,
match each of <=5 stored training crops against the full frame at scales
{0.8, 1.0, 1.2} with TM_CCOEFF_NORMED, keep the best above 0.6 that is
not in a border/corner, then NMS across persons.

Two engines:

* **parity** -- template scaled per (template, scale) with the exact
  uint8 resize, one NCC per combination (jit-cached per shape).  Bitwise
  the same selection math as the reference; used by the compat CLIs.

* **fused** -- the TPU-first design.  All templates are resampled to one
  canonical (th, tw) at bank build; per frame scale the *frame* is
  resized once (inverse scale) and a single XLA convolution with
  ``n_templates`` output channels computes every template's score map
  simultaneously on the MXU, sharing one pair of integral images for
  the window statistics.  Positions/boxes are mapped back to original
  frame coordinates.  This turns the reference's
  ``persons x templates x scales`` Python loop into one conv + one
  reduction, and it is what the throughput benchmark runs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from face_detection_recognization_pca_tpu.config import DetectConfig
from face_detection_recognization_pca_tpu.ops.integral import (
    integral_image,
    window_sums,
)
from face_detection_recognization_pca_tpu.ops.match import (
    match_template_ccoeff_normed,
    min_max_loc,
)
from face_detection_recognization_pca_tpu.ops.nms import (
    NEG_INF,
    in_border_or_corner,
    nms,
)
from face_detection_recognization_pca_tpu.ops.resize import (
    resize_bilinear,
    resize_bilinear_u8_exact,
)


@dataclasses.dataclass
class Detection:
    x: int
    y: int
    width: int
    height: int
    confidence: float
    person_name: str
    scale: float = 1.0


class TemplateBank:
    """Per-person template store.

    Args:
      templates: list of (person_name, uint8 grayscale template) pairs.
      canonical_size: (th, tw) all templates are resampled to for the
        fused engine; None keeps native sizes (parity engine only).
    """

    def __init__(
        self,
        templates: Sequence[Tuple[str, np.ndarray]],
        canonical_size: Optional[Tuple[int, int]] = (128, 128),
    ):
        self.entries = [(name, np.asarray(t)) for name, t in templates]
        self.person_names = sorted({name for name, _ in self.entries})
        self.person_index = {n: i for i, n in enumerate(self.person_names)}
        self.canonical_size = canonical_size
        if canonical_size is not None and self.entries:
            th, tw = canonical_size
            stack = []
            ids = []
            for name, t in self.entries:
                r = np.asarray(
                    resize_bilinear_u8_exact(t.astype(np.uint8), (tw, th))
                )
                stack.append(r.astype(np.float32))
                ids.append(self.person_index[name])
            self.canonical = jnp.asarray(np.stack(stack))  # (T, th, tw)
            self.template_person = jnp.asarray(np.array(ids, dtype=np.int32))
        else:
            self.canonical = None
            self.template_person = None

    @staticmethod
    def from_person_dirs(
        lock_dir: str, per_person: int = 5, canonical_size=(128, 128)
    ) -> "TemplateBank":
        """Reference loading rule (scan-template-v4.py:17-74): first N
        ``face_*.jpg`` crops of each person dir become its templates."""
        import glob
        import os

        pairs = []
        jobs = []
        for pdir in sorted(glob.glob(os.path.join(lock_dir, "*"))):
            if not os.path.isdir(pdir):
                continue
            name = os.path.basename(pdir)
            for c in sorted(glob.glob(os.path.join(pdir, "face_*.jpg")))[
                :per_person
            ]:
                jobs.append((name, c))

        # Canonical-size banks can decode+resize in native threads
        # (identical pixels: IMREAD_GRAYSCALE + cv::resize in C++).
        from face_detection_recognization_pca_tpu.io import native

        if canonical_size is not None and jobs and native.available():
            th, tw = canonical_size
            imgs, ok = native.decode_jpegs_batch(
                [c for _, c in jobs], gray=True, size_wh=(tw, th)
            )
            pairs = [
                (name, imgs[i])
                for i, (name, _) in enumerate(jobs)
                if ok[i]
            ]
        else:
            import cv2

            for name, c in jobs:
                img = cv2.imread(c, cv2.IMREAD_GRAYSCALE)
                if img is not None:
                    pairs.append((name, img))
        return TemplateBank(pairs, canonical_size)


# ---------------------------------------------------------------------------
# Fused engine
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("th", "tw"))
def _fused_score_maps(
    frame: jnp.ndarray, t0: jnp.ndarray, t_energy: jnp.ndarray, th: int, tw: int
) -> jnp.ndarray:
    """One conv for all templates: frame (H, W) x t0 (T, th, tw) ->
    (T, H-th+1, W-tw+1) TM_CCOEFF_NORMED scores."""
    f = frame.astype(jnp.float32)
    lhs = f[None, None]
    rhs = t0[:, None]  # (T, 1, th, tw) as OIHW
    num = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )[0]
    n = th * tw
    s1 = window_sums(integral_image(f, jnp.float32), (th, tw))
    s2 = window_sums(integral_image(f * f, jnp.float32), (th, tw))
    win_var_n = jnp.maximum(s2 - s1 * s1 / n, 0.0)
    denom = jnp.sqrt(t_energy[:, None, None] * win_var_n[None])
    safe = denom > 1e-6
    return jnp.where(safe, num / jnp.where(safe, denom, 1.0), 0.0)


@functools.partial(jax.jit, static_argnames=("th", "tw"))
def _fused_best_per_template(frame, t0, t_energy, th: int, tw: int):
    scores = _fused_score_maps(frame, t0, t_energy, th, tw)
    t = scores.shape[0]
    flat = scores.reshape(t, -1)
    idx = jnp.argmax(flat, axis=1)
    best = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]
    w = scores.shape[-1]
    return best, idx % w, idx // w


class TemplateDetector:
    """Multi-person multi-scale detector with reference v4 semantics."""

    def __init__(self, bank: TemplateBank, config: Optional[DetectConfig] = None):
        self.bank = bank
        self.config = config or DetectConfig()

    # -- fused TPU engine ---------------------------------------------------

    def detect_fused(self, frame_gray: np.ndarray) -> List[Detection]:
        """All persons/templates in one conv per scale.

        The frame is resized by 1/scale (so a template of canonical size
        matches faces at ``scale x`` canonical size in the original),
        mirroring the reference's template-side scaling up to resampling
        order.
        """
        cfg = self.config
        if self.bank.canonical is None:
            raise ValueError("bank has no canonical templates")
        th, tw = self.bank.canonical_size
        fh, fw = frame_gray.shape
        t0 = self.bank.canonical - jnp.mean(
            self.bank.canonical, axis=(1, 2), keepdims=True
        )
        energy = jnp.sum(t0 * t0, axis=(1, 2))
        n_persons = len(self.bank.person_names)
        best_per_person = np.full(n_persons, -np.inf)
        best_box = np.zeros((n_persons, 4), dtype=np.int64)
        best_scale = np.ones(n_persons)

        for scale in cfg.template_scales:
            box_w = int(tw * scale)
            box_h = int(th * scale)
            if (
                box_w < cfg.min_template_side
                or box_h < cfg.min_template_side
                or box_w > fw
                or box_h > fh
            ):
                continue
            rw = max(int(round(fw / scale)), tw + 1)
            rh = max(int(round(fh / scale)), th + 1)
            resized = resize_bilinear(
                jnp.asarray(frame_gray), (rw, rh), dtype=jnp.float32
            )
            best, xs, ys = _fused_best_per_template(resized, t0, energy, th, tw)
            best = np.asarray(best)
            xs = np.asarray(xs)
            ys = np.asarray(ys)
            pid = np.asarray(self.bank.template_person)
            for t in range(best.shape[0]):
                p = pid[t]
                x = int(xs[t] * scale)
                y = int(ys[t] * scale)
                cand = np.array([[x, y, box_w, box_h]], dtype=np.float64)
                if bool(
                    np.asarray(
                        in_border_or_corner(
                            cand,
                            fw,
                            fh,
                            cfg.corner_threshold,
                            cfg.border_threshold,
                        )
                    )[0]
                ):
                    continue
                if best[t] > best_per_person[p]:
                    best_per_person[p] = best[t]
                    best_box[p] = [x, y, box_w, box_h]
                    best_scale[p] = scale

        dets = [
            Detection(
                x=int(best_box[p, 0]),
                y=int(best_box[p, 1]),
                width=int(best_box[p, 2]),
                height=int(best_box[p, 3]),
                confidence=float(best_per_person[p]),
                person_name=self.bank.person_names[p],
                scale=float(best_scale[p]),
            )
            for p in range(n_persons)
            if best_per_person[p] > cfg.template_threshold
        ]
        return self._nms(dets)

    # -- parity engine ------------------------------------------------------

    def detect_parity(self, frame_gray: np.ndarray) -> List[Detection]:
        """Exact reference loop: scale each native template, full-frame
        NCC, best-above-0.6 per person with in-loop corner rejection
        (scan-template-v4.py:152-197)."""
        cfg = self.config
        fh, fw = frame_gray.shape
        frame_j = jnp.asarray(frame_gray.astype(np.float32))
        per_person_best: dict = {}
        for name, tmpl in self.bank.entries:
            for scale in cfg.template_scales:
                nw = int(tmpl.shape[1] * scale)
                nh = int(tmpl.shape[0] * scale)
                if (
                    nw < cfg.min_template_side
                    or nh < cfg.min_template_side
                    or nw > fw
                    or nh > fh
                ):
                    continue
                scaled = np.asarray(
                    resize_bilinear_u8_exact(tmpl.astype(np.uint8), (nw, nh))
                )
                score, loc = _parity_best(frame_j, jnp.asarray(scaled))
                score = float(score)
                x, y = int(loc[0]), int(loc[1])
                prev = per_person_best.get(name)
                if prev is None or score > prev.confidence:
                    cand = np.array([[x, y, nw, nh]], dtype=np.float64)
                    rejected = bool(
                        np.asarray(
                            in_border_or_corner(
                                cand,
                                fw,
                                fh,
                                cfg.corner_threshold,
                                cfg.border_threshold,
                            )
                        )[0]
                    )
                    if not rejected:
                        per_person_best[name] = Detection(
                            x, y, nw, nh, score, name, scale
                        )
        dets = [
            d
            for d in per_person_best.values()
            if d.confidence > cfg.template_threshold
        ]
        return self._nms(dets)

    def _nms(self, dets: List[Detection]) -> List[Detection]:
        if len(dets) <= 1:
            return dets
        boxes = np.array(
            [[d.x, d.y, d.width, d.height] for d in dets], dtype=np.float64
        )
        scores = np.array([d.confidence for d in dets])
        keep = np.asarray(nms(boxes, scores, self.config.nms_overlap_threshold))
        return [d for d, k in zip(dets, keep) if k]


@functools.partial(jax.jit)
def _parity_best(frame: jnp.ndarray, template: jnp.ndarray):
    scores = match_template_ccoeff_normed(frame, template.astype(jnp.float32))
    return min_max_loc(scores)

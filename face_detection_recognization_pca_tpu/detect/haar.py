"""Viola-Jones Haar cascade as a TPU-native two-phase evaluator.

The reference detects faces with
``cv2.CascadeClassifier('haarcascade_frontalface_default.xml')
.detectMultiScale(gray, 1.1, 5, minSize=(30, 30))``
(``detection-v4.py:18,50-55``).  A data-dependent early-exit cascade is
hostile to XLA, so this engine restructures it for dense hardware:

1. **Pyramid**: like modern OpenCV, the *image* is rescaled per level
   (factor ``1.1^i``) and the 24x24 cascade always runs at base size,
   windows on a stride-2 grid (stride 1 for levels with factor > 2).
2. **Phase A (dense prefilter)**: the first few stages (default 5,
   ~136 stumps) are evaluated for *every* window simultaneously -- each
   Haar rect sum combines 4 corner reads of the level's integral image,
   taken as CONTIGUOUS slices of its stride-2 phase planes (see
   :func:`_phase_planes`), so the whole grid evaluates as a few fused
   VPU loops, no gathers and no per-corner HLO ops.
3. **Phase B (candidate matmul)**: top-K windows surviving Phase A have
   their 25x25 integral patches gathered into a ``(K, 625)`` matrix;
   *all* 2913 stump rect-sums for all candidates are then one
   ``(K, 625) @ (625, S)`` MXU matmul against a precomputed sparse
   corner-weight matrix, followed by vectorized leaf selection and
   per-stage sum/threshold tests.  The early-exit semantics are
   reproduced exactly (a window must pass every stage), just evaluated
   breadth-first.

Window normalization follows OpenCV's current convention: inner
``(1, 1, 22, 22)`` norm rect, ``nf = sqrt(area * sqsum - sum^2)``
(clamped to 1 when non-positive), stump test
``rectsum < threshold * nf``.

Grouping reproduces ``groupRectangles(minNeighbors, eps=0.2)``:
union-find partition under the SimilarRects predicate, cluster
averaging, count thresholding, and the contained-in-bigger-cluster
rejection pass.  Tilted features are not supported (the default
frontal-face cascade has none).
"""

from __future__ import annotations

import dataclasses
import functools
import xml.etree.ElementTree as ET
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from face_detection_recognization_pca_tpu.ops.resize import resize_bilinear

DEFAULT_CASCADE_PATHS = (
    "/usr/share/opencv4/haarcascades/haarcascade_frontalface_default.xml",
    "haarcascade_frontalface_default.xml",
)


@dataclasses.dataclass
class HaarCascade:
    """Parsed stump cascade in flat arrays."""

    window_size: Tuple[int, int]  # (h, w), typically (24, 24)
    stage_thresholds: np.ndarray  # (nstages,)
    stage_offsets: np.ndarray  # (nstages + 1,) stump index ranges
    stump_feature: np.ndarray  # (S,) feature index per stump
    stump_threshold: np.ndarray  # (S,)
    leaf0: np.ndarray  # (S,) value when rectsum <  t * nf
    leaf1: np.ndarray  # (S,) value when rectsum >= t * nf
    rects: np.ndarray  # (F, 3, 5) x, y, w, h, weight (0-weight padded)
    corner_matrix: np.ndarray  # (625, S) f32: patch -> rectsum matmul

    @property
    def n_stages(self) -> int:
        return len(self.stage_thresholds)

    @property
    def n_stumps(self) -> int:
        return len(self.stump_threshold)


def _parse_numbers(text: str) -> List[float]:
    return [float(t) for t in text.split()]


def load_cascade(path: Optional[str] = None) -> HaarCascade:
    """Parse an OpenCV new-format (cascade-classifier) stump XML."""
    import os

    if path is None:
        for p in DEFAULT_CASCADE_PATHS:
            if os.path.exists(p):
                path = p
                break
        else:
            raise FileNotFoundError(
                "no haarcascade_frontalface_default.xml found; pass a path"
            )
    root = ET.parse(path).getroot()
    casc = root.find("cascade")
    if casc is None:
        raise ValueError(f"{path}: not a new-format cascade XML")
    if casc.findtext("featureType", "").strip() != "HAAR":
        raise ValueError("only HAAR featureType cascades are supported")
    height = int(casc.findtext("height"))
    width = int(casc.findtext("width"))

    stage_thresholds = []
    stage_offsets = [0]
    stump_feature, stump_threshold, leaf0, leaf1 = [], [], [], []
    for stage in casc.find("stages"):
        stage_thresholds.append(float(stage.findtext("stageThreshold")))
        weaks = stage.find("weakClassifiers")
        for weak in weaks:
            nodes = _parse_numbers(weak.findtext("internalNodes"))
            leaves = _parse_numbers(weak.findtext("leafValues"))
            if len(nodes) != 4 or len(leaves) != 2:
                raise ValueError("only stump cascades are supported")
            stump_feature.append(int(nodes[2]))
            stump_threshold.append(nodes[3])
            leaf0.append(leaves[0])
            leaf1.append(leaves[1])
        stage_offsets.append(len(stump_feature))

    feats = casc.find("features")
    rects = np.zeros((len(feats), 3, 5), dtype=np.float64)
    for fi, feat in enumerate(feats):
        tilted = feat.findtext("tilted")
        if tilted is not None and int(tilted.strip()) != 0:
            raise ValueError("tilted Haar features are not supported")
        for ri, r in enumerate(feat.find("rects")):
            vals = _parse_numbers(r.text)
            rects[fi, ri, :] = vals

    S = len(stump_feature)
    stump_feature = np.asarray(stump_feature, dtype=np.int32)
    # Corner matrix: patch (25 x 25 integral window, flattened 625) ->
    # rect sums for every stump.  Rect (x, y, w, h, wt) contributes
    # +wt at (y, x) & (y+h, x+w), -wt at (y, x+w) & (y+h, x).
    side = max(height, width) + 1
    corner = np.zeros((side * side, S), dtype=np.float32)
    for s in range(S):
        for (x, y, w, h, wt) in rects[stump_feature[s]]:
            if wt == 0.0:
                continue
            x, y, w, h = int(x), int(y), int(w), int(h)
            corner[y * side + x, s] += wt
            corner[(y + h) * side + (x + w), s] += wt
            corner[y * side + (x + w), s] -= wt
            corner[(y + h) * side + x, s] -= wt

    return HaarCascade(
        window_size=(height, width),
        stage_thresholds=np.asarray(stage_thresholds, dtype=np.float32),
        stage_offsets=np.asarray(stage_offsets, dtype=np.int32),
        stump_feature=stump_feature,
        stump_threshold=np.asarray(stump_threshold, dtype=np.float32),
        leaf0=np.asarray(leaf0, dtype=np.float32),
        leaf1=np.asarray(leaf1, dtype=np.float32),
        rects=rects,
        corner_matrix=corner,
    )


# ---------------------------------------------------------------------------
# Level evaluation
# ---------------------------------------------------------------------------


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def _grid_rect_sum(integral, x, y, w, h, ny, nx, step):
    """Rect sum for every grid window via 4 strided slices."""

    def sl(dy, dx):
        return lax.slice(
            integral,
            (y + dy, x + dx),
            (y + dy + (ny - 1) * step + 1, x + dx + (nx - 1) * step + 1),
            (step, step),
        )

    return sl(h, w) - sl(h, 0) - sl(0, w) + sl(0, 0)


def _phase_planes(integral, side: int):
    """Split the integral into 4 stride-2 phase planes.

    A stride-2 strided slice on TPU becomes a STANDALONE HLO op
    (~0.1 ms op overhead each; profiler-measured 2365 slices = 237 ms
    of a 286 ms phase-A program).  After this one-time split (4 strided
    slices total), every rect-corner read for the stride-2 window grid
    is a CONTIGUOUS slice ``planes[dy&1][dx&1][dy>>1:, dx>>1:]``, which
    XLA fuses into consumers instead of materializing."""
    integ = jnp.pad(integral, ((0, side + 1), (0, side + 1)))
    return [[integ[p::2, q::2] for q in (0, 1)] for p in (0, 1)]


def _corner_grid(integral, planes, dy, dx, ny, nx, step):
    """(ny, nx) values integral[dy + step*i, dx + step*j] as a
    contiguous slice (step 2 via phase planes; step 1 directly)."""
    if step == 1:
        return lax.slice(integral, (dy, dx), (dy + ny, dx + nx))
    return lax.slice(
        planes[dy & 1][dx & 1],
        (dy >> 1, dx >> 1),
        ((dy >> 1) + ny, (dx >> 1) + nx),
    )


def _make_phase_a_fn(cascade: HaarCascade, prefilter_stages: int):
    """fn(integral, nf, ny, nx, step) -> (ny, nx) bool window survival
    over the first ``prefilter_stages`` stages.

    One form on every backend: the unrolled slice+FMA evaluation with
    all rect-corner reads through :func:`_corner_grid` (contiguous
    slices via the stride-2 phase planes).  Measured on v5e against the
    alternatives it replaced: strided-corner matmul 315 ms / strided
    unrolled 293 ms / 25x25 conv 534 ms / THIS form 0.03-2 ms for an
    8-frame 544p 5-level chunk -- the contiguous slices fuse into a few
    VPU loop fusions, and exact f32 adds keep phase A bit-identical to
    the float64 oracle's accept set (the MXU matmul's bf16x6 passes
    flipped ~0.08% of marginal windows).  Compile: ~36 s per 5-level
    chunk on the remote v5e, cached persistently thereafter.
    """
    wh, ww = cascade.window_size
    side = max(wh, ww) + 1
    n_pf = min(prefilter_stages, cascade.n_stages)
    pf_end = int(cascade.stage_offsets[n_pf])
    sf = cascade.stump_feature
    rects = cascade.rects
    st = cascade.stump_threshold
    l0, l1 = cascade.leaf0, cascade.leaf1
    soff = cascade.stage_offsets
    sthr = cascade.stage_thresholds

    def phase_a(integral, nf, ny, nx, step):
        planes = _phase_planes(integral, side) if step == 2 else None

        def rect_sum(x, y, w, h):
            return (
                _corner_grid(integral, planes, y + h, x + w, ny, nx, step)
                - _corner_grid(integral, planes, y + h, x, ny, nx, step)
                - _corner_grid(integral, planes, y, x + w, ny, nx, step)
                + _corner_grid(integral, planes, y, x, ny, nx, step)
            )

        passed = jnp.ones((ny, nx), dtype=bool)
        si = 0
        k = 0
        while k < pf_end:
            stage_sum = jnp.zeros((ny, nx), jnp.float32)
            for s in range(int(soff[si]), int(soff[si + 1])):
                val = jnp.zeros((ny, nx), jnp.float32)
                for (x, y, w, h, wt) in rects[sf[s]]:
                    if wt == 0.0:
                        continue
                    val += jnp.float32(wt) * rect_sum(
                        int(x), int(y), int(w), int(h)
                    )
                stage_sum += jnp.where(val < st[s] * nf, l0[s], l1[s])
            passed = passed & (stage_sum >= sthr[si])
            k = int(soff[si + 1])
            si += 1
        return passed

    return phase_a


def _stump_stage_test(patches, nf_c, corner_p, st_p, l0_p, l1_p, oh, thr):
    """All-stages stump test for a candidate block: rect sums as ONE
    MXU matmul against the corner-weight matrix, vectorized leaf
    selection, stage sums as a one-hot matmul (segment_sum lowers
    poorly inside big fused programs).  HIGHEST precision: bf16 MXU
    passes corrupt ~1e8 integral sums -- detections silently vanish."""
    rectsums = jnp.dot(
        patches,
        corner_p,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    vals = jnp.where(
        rectsums < st_p[None, :] * nf_c[:, None], l0_p[None, :], l1_p[None, :]
    )
    stage_sums = jnp.dot(
        vals,
        oh,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.all(stage_sums >= thr[None, :], axis=1)


def _make_stage_onehot(stage_of: np.ndarray, s0: int, s1: int, st0: int,
                       st1: int) -> jnp.ndarray:
    m = np.zeros((s1 - s0, st1 - st0), dtype=np.float32)
    for s in range(s0, s1):
        m[s - s0, stage_of[s] - st0] = 1.0
    return jnp.asarray(m)


def _make_level_fn(
    cascade: HaarCascade,
    prefilter_stages: int,
    top_k: int,
):
    """Build the jitted per-level evaluator (closed over cascade consts)."""
    wh, ww = cascade.window_size
    side = max(wh, ww) + 1
    st = cascade.stump_threshold
    l0, l1 = cascade.leaf0, cascade.leaf1
    soff = cascade.stage_offsets
    sthr = cascade.stage_thresholds
    corner = jnp.asarray(cascade.corner_matrix)  # (625, S)
    # Per-stump stage membership matrix for the matmul phase.
    S = cascade.n_stumps
    stage_of = np.zeros(S, dtype=np.int32)
    for si in range(cascade.n_stages):
        stage_of[soff[si] : soff[si + 1]] = si
    stage_of = jnp.asarray(stage_of)
    phase_a = _make_phase_a_fn(cascade, prefilter_stages)
    norm_area = (wh - 2) * (ww - 2)

    def _core(img: jnp.ndarray, ny: int, nx: int, step: int):
        f = img.astype(jnp.float32)
        pad = [(1, 0), (1, 0)]
        integral = jnp.pad(
            jnp.cumsum(jnp.cumsum(f, axis=0), axis=1), pad
        )
        sqintegral = jnp.pad(
            jnp.cumsum(jnp.cumsum(f * f, axis=0), axis=1), pad
        )

        # Window normalization over the inner (1,1,wh-2,ww-2) rect.
        s1 = _grid_rect_sum(integral, 1, 1, ww - 2, wh - 2, ny, nx, step)
        s2 = _grid_rect_sum(sqintegral, 1, 1, ww - 2, wh - 2, ny, nx, step)
        nf2 = norm_area * s2 - s1 * s1
        nf = jnp.where(nf2 > 0, jnp.sqrt(jnp.maximum(nf2, 0.0)), 1.0)

        # Phase A: all prefilter stages for every window
        # (see _make_phase_a_fn).
        passed = phase_a(integral, nf, ny, nx, step)

        # Phase B: top-K surviving windows -> patch gather -> one matmul.
        kk = min(top_k, ny * nx)
        flat_pass = passed.reshape(-1)
        _, cand = lax.top_k(flat_pass.astype(jnp.float32), kk)
        cand_ok = flat_pass[cand]
        cy = (cand // nx) * step
        cx = (cand % nx) * step
        # vmap(dynamic_slice), NOT fancy indexing: an elementwise gather
        # of (K, 25, 25) scalarizes on TPU (measured 583 ms for
        # 8x8192x625 on v5e), while the block-slice form lowers to a
        # tile-granular gather that runs at HBM bandwidth (see
        # ops/pallas_kernels.gather_patches).
        patches = jax.vmap(
            lambda y, x: lax.dynamic_slice(integral, (y, x), (side, side))
        )(cy, cx).reshape(kk, side * side)
        # HIGHEST: TPU matmuls default to bf16 passes, which destroys
        # integral-image magnitudes (~1e8) -- detections silently vanish.
        rectsums = jnp.dot(
            patches,
            corner,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (K, S)
        cand_nf = nf.reshape(-1)[cand]
        vals = jnp.where(
            rectsums < st[None, :] * cand_nf[:, None], l0[None, :], l1[None, :]
        )
        #

        stage_sums = jax.ops.segment_sum(
            vals.T, stage_of, num_segments=len(sthr)
        ).T  # (K, nstages)
        ok = jnp.all(stage_sums >= sthr[None, :], axis=1) & cand_ok
        return ok, cx, cy

    @functools.partial(jax.jit, static_argnames=("ny", "nx", "step"))
    def level_fn(img: jnp.ndarray, ny: int, nx: int, step: int):
        return _core(img, ny, nx, step)

    # Batched variant: every op in the core (strided slices, top_k,
    # patch gathers, the candidate matmul) vmaps cleanly, so a frame
    # batch evaluates each pyramid level in ONE dispatch.
    @functools.partial(jax.jit, static_argnames=("ny", "nx", "step"))
    def level_fn_batch(imgs: jnp.ndarray, ny: int, nx: int, step: int):
        return jax.vmap(lambda im: _core(im, ny, nx, step))(imgs)

    return level_fn, level_fn_batch


def _pyramid_levels(
    h: int,
    w: int,
    window: Tuple[int, int],
    scale_factor: float,
    min_size: Tuple[int, int],
    max_size: Optional[Tuple[int, int]],
) -> List[Tuple[float, int, int, int]]:
    """Static level plan [(factor, sh, sw, step)] shared by the
    per-level and single-program paths (identical window grids)."""
    wh, ww = window
    levels = []
    factor = 1.0
    while True:
        win_w = int(round(ww * factor))
        win_h = int(round(wh * factor))
        sw, sh = int(round(w / factor)), int(round(h / factor))
        if sw - ww <= 0 or sh - wh <= 0:
            break
        if max_size and (win_w > max_size[0] or win_h > max_size[1]):
            break
        if win_w >= min_size[0] and win_h >= min_size[1]:
            step = 1 if factor > 2.0 else 2
            levels.append((factor, sh, sw, step))
        factor *= scale_factor
    return levels


def _make_pyramid_fn(
    cascade: HaarCascade,
    levels: Tuple[Tuple[float, int, int, int], ...],
    prefilter_stages: int,
    k_pool_a: int = 8192,
    k_pool_b: int = 1024,
    mid_stages: int = 10,
    group: int = 1,
):
    """ONE jitted program evaluating a chunk of pyramid levels.

    The per-level path costs ~2 dispatches x ~30 levels per frame
    (resize + evaluate), each a host round-trip.  Here everything for
    the chunk lives in one XLA program with a three-tier funnel (the
    XLA answer to OpenCV's per-window early exit -- dense prefilter,
    then two rounds of top-k *compaction* + MXU matmul):

    1. Phase A: per level, resize + integral images + the first
       ``prefilter_stages`` stages evaluated densely for every window
       via strided slices (~1-2% of windows survive).
    2. Phase B1: the chunk's A-survivors are pooled (top ``k_pool_a``
       across all its levels -- integrals are padded into one stacked
       tensor so a (level, y, x) gather works), their 25x25 integral
       patches gathered once, and stages ``prefilter_stages..
       mid_stages`` evaluated as ONE (k_pool_a, 625) @ (625, S_mid)
       matmul (~0.1% survive).
    3. Phase B2: B1 survivors are compacted again (top ``k_pool_b``)
       and the remaining stages run as a second matmul.

    Exactness: survivor *counts* after A and B1 are returned; the
    caller falls back to the per-level engine whenever a pool would
    truncate, so published detections never depend on pool capacity.

    ``group`` (deep-prefilter funnel only): the dominant cost of the
    deep-prefilter program is NOT the dense stump math (~0.2 ms for an
    8-frame 338k-window chunk) but ``lax.top_k`` over the survivor
    plane (profiler-measured 61 ms of a 67 ms chunk on v5e,
    scripts_dev/probe_haar_phases.py).  With ``group=G`` the expensive
    top_k runs over per-G-block ANY flags (n_pool/G entries); a second
    CHEAP top_k over the selected blocks' ``k_pool_a * G`` individual
    pass bits then compacts to ``k_pool_b`` window slots, so the
    gather/tail-matmul stage sees the same slot count as the ungrouped
    form.  Survivor sets are unchanged whenever neither pool truncates:
    ``count_a`` is survivor BLOCKS (cap ``k_pool_a``), ``count_b1`` is
    survivor windows inside the selected blocks (cap ``k_pool_b``) --
    the caller's overflow-retry contract covers both.

    Returns (ok, cx, cy, level_id, count_a, count_b1) with ``k_pool_b``
    candidate slots in level-local coordinates.
    """
    wh, ww = cascade.window_size
    side = max(wh, ww) + 1
    n_pf = min(prefilter_stages, cascade.n_stages)
    pf_end = int(cascade.stage_offsets[n_pf])
    mid_stages = max(mid_stages, prefilter_stages)
    mid_end = int(
        cascade.stage_offsets[min(mid_stages, cascade.n_stages)]
    )
    st = cascade.stump_threshold
    l0, l1 = cascade.leaf0, cascade.leaf1
    soff = cascade.stage_offsets
    S = cascade.n_stumps
    stage_of = np.zeros(S, dtype=np.int32)
    for si in range(cascade.n_stages):
        stage_of[soff[si] : soff[si + 1]] = si
    norm_area = (wh - 2) * (ww - 2)

    # Static pooled-index maps: pooled window i -> (level, cy, cx).
    lvl_np, cy_np, cx_np = [], [], []
    grid = []
    for li, (_, sh, sw, step) in enumerate(levels):
        ny = (sh - wh) // step + 1
        nx = (sw - ww) // step + 1
        grid.append((ny, nx, step))
        iy, ix = np.mgrid[0:ny, 0:nx]
        lvl_np.append(np.full(ny * nx, li, dtype=np.int32))
        cy_np.append((iy * step).reshape(-1).astype(np.int32))
        cx_np.append((ix * step).reshape(-1).astype(np.int32))
    lvl_all = np.concatenate(lvl_np)
    cy_all = np.concatenate(cy_np)
    cx_all = np.concatenate(cx_np)
    max_h = max(sh for (_, sh, _, _) in levels)
    max_w = max(sw for (_, _, sw, _) in levels)
    # Stacked-integral pad targets are f32 tile-aligned (8, 128): the
    # row-block gather dynamic-slices (1, side, W) rows at
    # data-dependent (level, y) starts, and tile-aligned rows keep
    # every such slice lane-aligned (VMEM-friendlier; gathered values
    # are unchanged -- the pad region is zeros beyond every window's
    # read range).  NOTE: alignment alone did NOT fix the r3 level-4
    # B=16 device fault (see max_device_batch); it is kept for layout
    # hygiene, not as the fault dodge it was first hoped to be.
    pad_h = -(-(max_h + 1) // 8) * 8
    pad_w = -(-(max_w + 1) // 128) * 128

    # Stage-membership (one-hot) matrices for the matmul phases:
    # (n_stumps_in_phase, n_stages_in_phase) so stage sums are matmuls
    # too (segment_sum lowers poorly inside big fused programs).
    n_mid_stages = min(mid_stages, cascade.n_stages) - prefilter_stages
    oh_mid = _make_stage_onehot(stage_of, pf_end, mid_end, prefilter_stages,
                                prefilter_stages + n_mid_stages)
    oh_tail = (
        _make_stage_onehot(stage_of, mid_end, S,
                           min(mid_stages, cascade.n_stages),
                           cascade.n_stages)
        if mid_end < S
        else None
    )
    phase_a = _make_phase_a_fn(cascade, prefilter_stages)
    corner_mid = jnp.asarray(cascade.corner_matrix[:, pf_end:mid_end])
    corner_tail = (
        jnp.asarray(cascade.corner_matrix[:, mid_end:])
        if mid_end < S
        else None
    )
    sthr_mid = jnp.asarray(
        cascade.stage_thresholds[
            prefilter_stages : prefilter_stages + n_mid_stages
        ]
    )
    sthr_tail = jnp.asarray(
        cascade.stage_thresholds[min(mid_stages, cascade.n_stages) :]
    )

    def _phase_a_level(img, sh, sw, step, ny, nx):
        scaled = (
            img
            if (sh, sw) == img.shape
            else resize_bilinear(img, (sw, sh), jnp.float32)
        )
        f = scaled.astype(jnp.float32)
        pad = [(1, 0), (1, 0)]
        integral = jnp.pad(jnp.cumsum(jnp.cumsum(f, axis=0), axis=1), pad)
        sqintegral = jnp.pad(
            jnp.cumsum(jnp.cumsum(f * f, axis=0), axis=1), pad
        )
        s1 = _grid_rect_sum(integral, 1, 1, ww - 2, wh - 2, ny, nx, step)
        s2 = _grid_rect_sum(sqintegral, 1, 1, ww - 2, wh - 2, ny, nx, step)
        nf2 = norm_area * s2 - s1 * s1
        nf = jnp.where(nf2 > 0, jnp.sqrt(jnp.maximum(nf2, 0.0)), 1.0)

        # Phase A: all prefilter stages for every window
        # (see _make_phase_a_fn).
        passed = phase_a(integral, nf, ny, nx, step)
        # Pad the integral to the stacked (max_h+1, max_w+1) shape so
        # pooled (level, y, x) gathers work across the chunk.
        integral = jnp.pad(
            integral,
            ((0, pad_h - integral.shape[0]), (0, pad_w - integral.shape[1])),
        )
        return passed.reshape(-1), nf.reshape(-1), integral

    st_mid = jnp.asarray(st[pf_end:mid_end])
    l0_mid = jnp.asarray(l0[pf_end:mid_end])
    l1_mid = jnp.asarray(l1[pf_end:mid_end])
    st_tail = jnp.asarray(st[mid_end:])
    l0_tail = jnp.asarray(l0[mid_end:])
    l1_tail = jnp.asarray(l1[mid_end:])
    n_pool = int(lvl_all.shape[0])
    if group > 1 and pf_end < mid_end:
        raise ValueError("group pooling applies to the single-pool funnel only")
    n_blk = -(-n_pool // group)
    pad_n = n_blk * group - n_pool
    if pad_n:
        # Padded slots never pass (their mask bits are padded False);
        # index maps get safe in-range targets.
        lvl_all = np.pad(lvl_all, (0, pad_n))
        cy_all = np.pad(cy_all, (0, pad_n))
        cx_all = np.pad(cx_all, (0, pad_n))
    lvl_all_j = jnp.asarray(lvl_all)
    cy_all_j = jnp.asarray(cy_all)
    cx_all_j = jnp.asarray(cx_all)
    if group == 1:
        kk_a = min(k_pool_a, n_pool)
        kk_b = min(k_pool_b, kk_a)
    else:
        kk_a = min(k_pool_a, n_blk)  # block pool
        kk_b = min(k_pool_b, kk_a * group)  # window slots

    def _phase_a_all(img):
        pass_l, nf_l, int_l = [], [], []
        for li, (_, sh, sw, step) in enumerate(levels):
            ny, nx, _ = grid[li]
            p, nf, integ = _phase_a_level(img, sh, sw, step, ny, nx)
            pass_l.append(p)
            nf_l.append(nf)
            int_l.append(integ)
        return (
            jnp.concatenate(pass_l),  # (n_pool,)
            jnp.concatenate(nf_l),
            jnp.stack(int_l),  # (L, max_h+1, max_w+1)
        )

    def _batch_core(imgs):
        """Phase A is vmapped per frame; the compaction pools run at
        BATCH level.  Every candidate-indexed dynamic slice lowers to
        one iteration of a sequential Mosaic while loop at ~1-3 us
        regardless of slice size (profiler-measured), so the funnel's
        job is to make the pools SMALL: with the dense prefilter
        extended through the mid stages (default 10), one ~512-slot
        pool feeds the tail matmul directly and the old 8192-slot mid
        pool (whose gather alone cost ~440 ms per 8-frame batch)
        disappears.  The gather itself uses the row-block + one-hot
        form on accelerators (ops/pallas_kernels.gather_patches)."""
        from face_detection_recognization_pca_tpu.ops.pallas_kernels import (
            gather_patches_batch,
        )

        bsz = imgs.shape[0]
        passed, nf_all, integrals = jax.vmap(_phase_a_all)(imgs)

        if pf_end >= mid_end:
            # Dense prefilter covers the mid phase: ONE pool straight
            # into the tail matmul (count_b1 := count_a for the
            # caller's overflow-retry contract).
            if group > 1:
                # Block-pooled compaction: the EXPENSIVE top_k runs
                # over per-block ANY flags (n_pool/G entries -- over
                # the raw survivor plane it was ~90% of the chunk
                # program); a second cheap top_k over the selected
                # blocks' kk_a*G pass bits compacts back to kk_b
                # window slots so the gather/tail stage is unchanged.
                if pad_n:
                    passed = jnp.pad(passed, ((0, 0), (0, pad_n)))
                    nf_all = jnp.pad(
                        nf_all, ((0, 0), (0, pad_n)), constant_values=1.0
                    )
                blk_any = jnp.any(
                    passed.reshape(bsz, n_blk, group), axis=2
                )
                count_a = jnp.sum(blk_any, axis=1)  # survivor blocks
                _, bcand = lax.top_k(blk_any.astype(jnp.float32), kk_a)
                cand_w = (
                    bcand[:, :, None] * group
                    + jnp.arange(group, dtype=bcand.dtype)[None, None, :]
                ).reshape(bsz, kk_a * group)
                ok_w = jnp.take_along_axis(passed, cand_w, axis=1)
                count_b1 = jnp.sum(ok_w, axis=1)  # survivor windows
                if kk_b < kk_a * group:
                    _, sub = lax.top_k(ok_w.astype(jnp.float32), kk_b)
                    cand = jnp.take_along_axis(cand_w, sub, axis=1)
                    ok_a = jnp.take_along_axis(ok_w, sub, axis=1)
                else:
                    cand, ok_a = cand_w, ok_w
            else:
                count_a = jnp.sum(passed, axis=1)
                _, cand = lax.top_k(passed.astype(jnp.float32), kk_b)
                ok_a = jnp.take_along_axis(passed, cand, axis=1)
                count_b1 = count_a
            n_slots = int(cand.shape[1])
            lvl_c = jnp.take(lvl_all_j, cand)
            cy_c = jnp.take(cy_all_j, cand)
            cx_c = jnp.take(cx_all_j, cand)
            if corner_tail is None:
                return ok_a, cx_c, cy_c, lvl_c, count_a, count_b1
            nf_c = jnp.take_along_axis(nf_all, cand, axis=1)
            patches = gather_patches_batch(
                integrals, lvl_c, cy_c, cx_c, side
            ).reshape(bsz * n_slots, side * side)
            ok = (
                _stump_stage_test(
                    patches, nf_c.reshape(-1), corner_tail, st_tail,
                    l0_tail, l1_tail, oh_tail, sthr_tail,
                ).reshape(bsz, n_slots)
                & ok_a
            )
            return ok, cx_c, cy_c, lvl_c, count_a, count_b1
        count_a = jnp.sum(passed, axis=1)

        # Pool 1: chunk-wide compaction of phase-A survivors.
        _, cand = lax.top_k(passed.astype(jnp.float32), kk_a)  # (B, kk_a)
        ok_a = jnp.take_along_axis(passed, cand, axis=1)
        lvl_c = jnp.take(lvl_all_j, cand)
        cy_c = jnp.take(cy_all_j, cand)
        cx_c = jnp.take(cx_all_j, cand)
        nf_c = jnp.take_along_axis(nf_all, cand, axis=1)
        patches = gather_patches_batch(
            integrals, lvl_c, cy_c, cx_c, side
        ).reshape(bsz * kk_a, side * side)
        ok_b1 = (
            _stump_stage_test(
                patches, nf_c.reshape(-1), corner_mid, st_mid, l0_mid,
                l1_mid, oh_mid, sthr_mid,
            ).reshape(bsz, kk_a)
            & ok_a
        )
        count_b1 = jnp.sum(ok_b1, axis=1)

        if corner_tail is None:
            return ok_b1, cx_c, cy_c, lvl_c, count_a, count_b1

        # Pool 2: compact B1 survivors, run the remaining stages.  The
        # (small) patch set is re-gathered from the integrals -- a
        # tile-granular gather is cheaper than an elementwise
        # take_along_axis over the pool-1 patches.
        _, cand2 = lax.top_k(ok_b1.astype(jnp.float32), kk_b)  # (B, kk_b)
        ok_b1_c = jnp.take_along_axis(ok_b1, cand2, axis=1)
        lvl2 = jnp.take_along_axis(lvl_c, cand2, axis=1)
        cy2 = jnp.take_along_axis(cy_c, cand2, axis=1)
        cx2 = jnp.take_along_axis(cx_c, cand2, axis=1)
        nf2 = jnp.take_along_axis(nf_c, cand2, axis=1)
        patches2 = gather_patches_batch(
            integrals, lvl2, cy2, cx2, side
        ).reshape(bsz * kk_b, side * side)
        ok = (
            _stump_stage_test(
                patches2, nf2.reshape(-1), corner_tail, st_tail, l0_tail,
                l1_tail, oh_tail, sthr_tail,
            ).reshape(bsz, kk_b)
            & ok_b1_c
        )
        return ok, cx2, cy2, lvl2, count_a, count_b1

    pyramid_fn_batch = jax.jit(_batch_core)
    # Single-frame variant keeps the batch dim (B=1): stripping it on
    # the host would cost 6 extra tiny device ops per chunk call.
    pyramid_fn = jax.jit(lambda img: _batch_core(img[None]))
    return pyramid_fn, pyramid_fn_batch


class HaarDetector:
    """``detectMultiScale`` with reference parameter semantics."""

    def __init__(
        self,
        cascade: Optional[HaarCascade] = None,
        prefilter_stages: Optional[int] = None,
        top_k: int = 512,
        fused_pyramid: bool = True,
        k_per_level: int = 512,
        pyramid_chunk: Optional[int] = None,
        max_device_batch: Optional[int] = None,
    ):
        # Default prefilter depth is a per-backend TUNING choice (the
        # math is identical either way, and the funnel is exact via
        # overflow-counts): on accelerators 10 dense stages (436
        # stumps) -- dense evaluation through the phase planes is
        # nearly free (DESIGN.md section 7) while every pooled
        # candidate costs ~1.8 us of sequential patch-gather, so
        # prefilter deep (~0.1% survivors) and pool ONCE into a
        # ~512-slot tail matmul.  On CPU 5 stages: the dense FLOPs and
        # the 3x bigger XLA compiles are real wall time there, and the
        # two-tier pool keeps the single-core test suite fast.
        if prefilter_stages is None:
            try:
                on_cpu = jax.default_backend() == "cpu"
            except Exception:
                on_cpu = False
            prefilter_stages = 5 if on_cpu else 10
        self.cascade = cascade or load_cascade()
        self._level_fn, self._level_fn_batch = _make_level_fn(
            self.cascade, prefilter_stages, top_k
        )
        self.fused_pyramid = fused_pyramid
        self._prefilter_stages = prefilter_stages
        self._mid_stages = 10  # _make_pyramid_fn's B1/tail boundary
        # Deep prefilter covers the mid phase -> single tail pool.
        self._single_pool = prefilter_stages >= self._mid_stages
        # Block-pooled compaction (single-pool only): top_k over
        # per-8-window ANY flags instead of the raw survivor plane --
        # the raw top_k was ~90% of a big chunk program (see
        # _make_pyramid_fn).  Pool capacities are then in block units.
        self._pool_group = 8 if self._single_pool else 1
        self._k_pool_a = k_per_level * 16  # chunk-wide pool capacities
        self._k_pool_b = k_per_level * 2
        # Levels fused per program: phase A unrolls ~4k HLO ops per
        # level, and XLA compile time grows superlinearly -- a whole
        # 30-level 960x544 pyramid in one program compiles for >15 min.
        # Per-backend default: 5-level chunks on CPU (fewer, smaller
        # compiles for the single-core test suite), 24 on TPU -- i.e.
        # the WHOLE pyramid as one program for any frame size up to
        # ~24 levels (544p has ~20).  The r5 same-day ladder (544p real
        # footage, B=8 device sub-batches, identical detections at
        # every rung, no runtime fault):
        # 2-level 36.5/37.2 fps -> 4-level 44.6/49.2 -> 6-level
        # ~50-54/53-57 -> 8-level 54.6/58.7 -> 12-level 64-67/74 ->
        # whole-pyramid 65.8/77.0 (blocking/pipelined).  Fewer
        # dispatches amortize the per-dispatch overhead until the
        # device wall dominates (12-level and whole-pyramid are within
        # noise; whole-pyramid wins the pipelined/streaming number and
        # halves host dispatch work).  The r3 fault that once forced
        # 2-level chunks was the 5-level x B=16 combination (340 MB of
        # generated code; compile ok, execute crashed the worker --
        # DESIGN.md section 11); every rung here was validated at the
        # B=8 ceiling.
        if pyramid_chunk is None:
            try:
                on_cpu_c = jax.default_backend() == "cpu"
            except Exception:
                on_cpu_c = False
            pyramid_chunk = 5 if on_cpu_c else 24
        self.pyramid_chunk = pyramid_chunk
        self._pyramid_cache: dict = {}
        # Learned pool-capacity floors per level chunk: when a call's
        # survivor counts overflow the right-sized pools, detect_finish
        # retries with doubled capacity AND records it here, so every
        # later call on footage like it runs the big program directly
        # (one dispatch/chunk) instead of paying the retry each time --
        # without this, a batch whose frames exceed the static sizing
        # re-ran its chunks on EVERY call (measured: B=32 collapsed to
        # 13 fps vs 59 at B=16 on test.mp4).
        self._cap_floor: dict = {}
        # Batch ceiling per device dispatch.  B=16 measured best on the
        # r2 v5e runtime (59/69 fps; B=32 collapsed to 13 fps --
        # capacity retries fire every call and the 2x chunk programs
        # degrade), but the CURRENT runtime deterministically faults
        # executing the 544p level-4 chunk at B=16 on real frames
        # (passes on zeros; passes at B=8; r3 bisect,
        # /tmp/haar_bisect.log -- neither tile-aligned pads nor a
        # fully-dense gather changed it, so it is batch-size-triggered,
        # not an indexing miscompile we can dodge).  B=8 is the
        # measured-safe ceiling.  Wider caller batches split into
        # pipelined sub-batches (all device halves issue before any
        # finish), so B>=16 throughput still pipelines over the cached
        # B=8 programs.  0 disables splitting (CPU default: the test
        # suite drives small batches and per-shape compiles are the
        # scarce resource there).
        if max_device_batch is None:
            try:
                on_cpu_b = jax.default_backend() == "cpu"
            except Exception:
                on_cpu_b = False
            max_device_batch = 0 if on_cpu_b else 8
        self.max_device_batch = int(max_device_batch)
        # In-flight chunk-program bound: each 544p B=16 chunk program
        # needs ~1.2 GB of device temp (compiled.memory_analysis();
        # ~half that at B=8), and enqueueing all pyramid chunks
        # back-to-back crashes the current v5e worker (measured r3:
        # every chunk executes fine sequentially, the async burst
        # faults the device).  Blocking on every Nth chunk's output
        # bounds concurrent temp reservations.
        self.max_inflight_chunks = 4
        self.last_dispatches = 0  # device calls in the last detect call

    def _chunk_caps(self, part) -> Tuple[int, int, int]:
        """Candidate-pool sizing (cap, ka, kb) for one pyramid chunk.

        Right-sizes the pools by the chunk's window count.  With the
        deep (10-stage) dense prefilter, survivors on real footage are
        ~0.1% (pool at ~0.2%); the legacy shallow prefilter keeps the
        two-tier capacities.  Exact counts come back with the results,
        so an undersized pool costs one doubled retry -- never a wrong
        detection.  Shared by :meth:`detect_device` and the standalone
        B=16 fault repro (``scripts_dev/repro_haar_b16_fault.py``) so
        the repro builds byte-identical programs."""
        wh, ww = self.cascade.window_size
        n_pool = sum(
            (((sh - wh) // st + 1) * ((sw - ww) // st + 1))
            for (_, sh, sw, st) in part
        )
        if self._single_pool:
            # Grouped two-pool sizing: ka = block pool (survivor blocks
            # <= survivor windows, so the old window floor is safe),
            # kb = window slots (same sizing as the old single pool --
            # gather/tail cost unchanged).
            cap = -(-n_pool // self._pool_group)
            ka = min(
                self._k_pool_a,
                cap,
                max(256, _next_pow2(n_pool // 1024)),
            )
            kb = min(
                self._k_pool_b,
                ka * self._pool_group,
                max(256, _next_pow2(n_pool // 512)),
            )
        else:
            cap = n_pool
            ka = min(
                self._k_pool_a, n_pool, max(256, _next_pow2(n_pool // 16))
            )
            kb = min(
                self._k_pool_b, ka, max(128, _next_pow2(n_pool // 256))
            )
        floor = self._cap_floor.get(tuple(part))
        if floor is not None:
            ka = min(max(ka, floor[0]), cap)
            kb = min(max(kb, floor[1]), ka * self._pool_group)
        return cap, ka, kb

    def _get_pyramid_fn(self, levels, ka, kb):
        key = (tuple(levels), ka, kb, self._pool_group)
        if key not in self._pyramid_cache:
            self._pyramid_cache[key] = _make_pyramid_fn(
                self.cascade,
                tuple(levels),
                self._prefilter_stages,
                k_pool_a=ka,
                k_pool_b=kb,
                group=self._pool_group,
            )
        return self._pyramid_cache[key]

    def _get_pack_fn(self, c0s: Tuple[int, ...]):
        """Jitted packer: all chunk outputs -> ONE (B, sum_K + n_chunks,
        4) f32 array (candidate slots, then per-chunk [count_a,
        count_b1, 0, 0] rows), so a detect call downloads one array."""
        key = ("pack", c0s)
        if key not in self._pyramid_cache:

            # Donation evaluated and rejected here (SURVEY §5 aliasing
            # item): the chunk outputs are consumed only by this pack,
            # but every one is bool/int32 while the packed array is
            # f32 -- XLA cannot alias across the dtype cast ("Some
            # donated buffers were not usable" for all of them), so a
            # donate_argnums here buys nothing and adds a warning.  The
            # steady-state donation win lives in the tracker state loop
            # (parallel/multistream.py).
            @jax.jit
            def pack(chunks):
                parts = [
                    jnp.stack(
                        [
                            o.astype(jnp.float32),
                            x_.astype(jnp.float32),
                            y_.astype(jnp.float32),
                            (l_ + c0).astype(jnp.float32),
                        ],
                        axis=-1,
                    )
                    for c0, (o, x_, y_, l_, _, _) in zip(c0s, chunks)
                ]
                cnts = jnp.stack(
                    [
                        jnp.stack([na, nb1], axis=-1).astype(jnp.float32)
                        for (_, _, _, _, na, nb1) in chunks
                    ],
                    axis=1,
                )  # (B, n_chunks, 2)
                pad = jnp.zeros(cnts.shape[:2] + (2,), jnp.float32)
                return jnp.concatenate(
                    parts + [jnp.concatenate([cnts, pad], axis=-1)], axis=1
                )

            self._pyramid_cache[key] = pack
        return self._pyramid_cache[key]

    def detect_multi_scale(
        self,
        gray: np.ndarray,
        scale_factor: float = 1.1,
        min_neighbors: int = 5,
        min_size: Tuple[int, int] = (30, 30),
        max_size: Optional[Tuple[int, int]] = None,
    ) -> List[Tuple[int, int, int, int]]:
        """Faces as (x, y, w, h), grouped like the reference's call
        (detection-v4.py:50-55).

        Default engine: the single-program pyramid (one device dispatch
        per frame).  Falls back to the per-level path -- identical math
        -- when a level's phase-A survivors exceed the fused program's
        per-level candidate slots (counts are returned exactly, so the
        fallback triggers only when truncation would occur).
        """
        return self.detect_multi_scale_batch(
            np.asarray(gray)[None],
            scale_factor,
            min_neighbors,
            min_size,
            max_size,
        )[0]

    def detect_multi_scale_batch(
        self,
        grays: np.ndarray,
        scale_factor: float = 1.1,
        min_neighbors: int = 5,
        min_size: Tuple[int, int] = (30, 30),
        max_size: Optional[Tuple[int, int]] = None,
    ) -> List[List[Tuple[int, int, int, int]]]:
        """Batched detectMultiScale: ``(B, H, W)`` frames, ONE device
        dispatch for the whole batch across all pyramid levels (same
        detections as the per-level path; grouping still per frame).

        ``grays`` may be a jax array already resident on device (no
        host->device copy happens then -- the bench path pre-stages
        frames in HBM because the tunnel moves ~13 MB/s)."""
        handle = self.detect_device(
            grays, scale_factor, min_neighbors, min_size, max_size
        )
        return self.detect_finish(handle)

    def detect_device(
        self,
        grays: np.ndarray,
        scale_factor: float = 1.1,
        min_neighbors: int = 5,
        min_size: Tuple[int, int] = (30, 30),
        max_size: Optional[Tuple[int, int]] = None,
    ) -> dict:
        """Device half of :meth:`detect_multi_scale_batch`: issues the
        chunk programs + the pack program and returns WITHOUT blocking
        on the download.  A streaming caller issues the next batch's
        device half before calling :meth:`detect_finish` on this one,
        overlapping the packed download + host grouping with device
        compute (the same split as ``TemplateDetector
        .detect_fused_device`` -- through the remote tunnel a blocking
        download costs ~30-80 ms per batch).

        Returns an opaque handle dict for :meth:`detect_finish`."""
        if not isinstance(grays, jnp.ndarray):
            grays = np.asarray(grays)
        nb, h, w = grays.shape
        mdb = self.max_device_batch
        if mdb and nb > mdb:
            # Split into pipelined sub-batches at the measured-best
            # device batch: every sub-batch's device half is issued
            # before any finish, so downloads overlap compute exactly
            # like a streaming caller's.
            subs = []
            for s0 in range(0, nb, mdb):
                part = grays[s0 : s0 + mdb]
                valid = part.shape[0]
                if valid < mdb:  # pad the tail: same cached programs
                    if isinstance(part, jnp.ndarray):
                        part = jnp.concatenate(
                            [
                                part.astype(jnp.float32),
                                jnp.zeros((mdb - valid, h, w), jnp.float32),
                            ]
                        )
                    else:
                        part = np.concatenate(
                            [
                                part.astype(np.float32),
                                np.zeros((mdb - valid, h, w), np.float32),
                            ]
                        )
                subs.append(
                    (
                        self.detect_device(
                            part, scale_factor, min_neighbors,
                            min_size, max_size,
                        ),
                        valid,
                    )
                )
            return {"sub": subs}
        wh, ww = self.cascade.window_size
        levels = _pyramid_levels(
            h, w, (wh, ww), scale_factor, min_size, max_size
        )
        if not levels:
            return {"empty": nb, "min_neighbors": min_neighbors}
        if not self.fused_pyramid:
            return {
                "per_level": (grays, levels, min_neighbors),
                "min_neighbors": min_neighbors,
            }

        frames_j = (
            grays.astype(jnp.float32)
            if isinstance(grays, jnp.ndarray)
            else jnp.asarray(grays.astype(np.float32))
        )
        chunk = max(1, self.pyramid_chunk)
        dispatches = 0
        # Phase 1 (device): run every chunk, results stay on device --
        # the remote tunnel costs ~30-80 ms per transfer, so one packed
        # download for the whole pyramid beats 5 arrays x 6 chunks.
        chunk_meta = []  # (c0, pool cap, kk_a, kk_b, slot width)
        device_out = []  # per chunk: (ok, cx, cy, lid, count_a, count_b1)
        for c0 in range(0, len(levels), chunk):
            part = levels[c0 : c0 + chunk]
            cap, ka, kb = self._chunk_caps(part)
            fn_one, fn_batch = self._get_pyramid_fn(part, ka, kb)
            outs = fn_one(frames_j[0]) if nb == 1 else fn_batch(frames_j)
            dispatches += 1
            chunk_meta.append((c0, cap, ka, kb, int(outs[0].shape[1])))
            device_out.append(outs)
            if len(device_out) % self.max_inflight_chunks == 0:
                # Device executes in order: blocking here caps the
                # concurrently-reserved chunk temps (see __init__).
                jax.block_until_ready(outs[0])

        # Phase 2: ONE jitted pack program for all chunk outputs (the
        # download itself happens in detect_finish).  Per-call
        # jnp.stack/concatenate on the host side would each be a
        # separate tiny dispatch -- at ~10-30 ms tunnel round-trip
        # each, the packing dominated the detector.
        pack_fn = self._get_pack_fn(tuple(m[0] for m in chunk_meta))
        dispatches += 1
        packed_d = pack_fn(tuple(device_out))
        # Start the device->host copy NOW (non-blocking): by the time
        # detect_finish blocks in np.asarray the bytes are already in
        # flight, so a pipelined caller's download overlaps the next
        # batch's compute instead of queueing behind it.
        try:
            packed_d.copy_to_host_async()
        except AttributeError:
            pass
        return {
            "packed_d": packed_d,
            "chunk_meta": chunk_meta,
            "levels": levels,
            "frames_j": frames_j,
            "nb": nb,
            "chunk": chunk,
            "min_neighbors": min_neighbors,
            "dispatches": dispatches,
        }

    def detect_finish(
        self, handle: dict
    ) -> List[List[Tuple[int, int, int, int]]]:
        """Host half: download the packed candidates, re-run any chunk
        whose pools truncated (exactness contract), unpack and group."""
        if "sub" in handle:
            out: List[List[Tuple[int, int, int, int]]] = []
            total = 0
            for sub_handle, valid in handle["sub"]:
                out.extend(self.detect_finish(sub_handle)[:valid])
                total += self.last_dispatches
            self.last_dispatches = total
            return out
        if "empty" in handle:
            return [[] for _ in range(handle["empty"])]
        if "per_level" in handle:
            grays, levels, min_neighbors = handle["per_level"]
            return self._detect_batch_per_level(grays, levels, min_neighbors)
        chunk_meta = handle["chunk_meta"]
        levels = handle["levels"]
        frames_j = handle["frames_j"]
        nb = handle["nb"]
        chunk = handle["chunk"]
        min_neighbors = handle["min_neighbors"]
        dispatches = handle["dispatches"]
        wh, ww = self.cascade.window_size
        raw: List[List[Tuple[int, int, int, int]]] = [[] for _ in range(nb)]
        n_chunks = len(chunk_meta)
        arr = np.asarray(handle["packed_d"])
        packed = arr[:, :-n_chunks]  # (B, sum_K, 4)
        counts = arr[:, -n_chunks:, :2]  # (B, n_chunks, 2)

        # Exactness check: re-run any chunk whose pools truncated with
        # doubled capacity (new program, cached) until exact.  ``cap``
        # and the counts are in block units for the single-pool funnel
        # (window units otherwise) -- same contract either way.
        g = self._pool_group
        for ci, (c0, cap, ka, kb, width) in enumerate(chunk_meta):
            ka0, kb0 = ka, kb
            trunc_a = ka < cap and np.any(counts[:, ci, 0] > ka)
            trunc_b = kb < ka * g and np.any(counts[:, ci, 1] > kb)
            while trunc_a or trunc_b:
                ka = min(ka * 2, cap)
                kb = min(kb * 2, ka * g)
                part = levels[c0 : c0 + chunk]
                fn_one, fn_batch = self._get_pyramid_fn(part, ka, kb)
                outs = fn_one(frames_j[0]) if nb == 1 else fn_batch(frames_j)
                dispatches += 1
                o, x_, y_, l_ = outs[:4]
                packed_redo = np.asarray(
                    jnp.concatenate(
                        [
                            jnp.stack(
                                [
                                    o.astype(jnp.float32),
                                    x_.astype(jnp.float32),
                                    y_.astype(jnp.float32),
                                    (l_ + c0).astype(jnp.float32),
                                ],
                                axis=-1,
                            ).reshape(o.shape[0], -1),
                            jnp.stack([outs[4], outs[5]], axis=-1).astype(
                                jnp.float32
                            ),
                        ],
                        axis=1,
                    )
                )
                redo = packed_redo[:, :-2].reshape(o.shape[0], -1, 4)
                na = packed_redo[:, -2]
                nb1 = packed_redo[:, -1]
                # Replace this chunk's slice in the packed candidates.
                start = sum(m[4] for m in chunk_meta[:ci])
                old_k = chunk_meta[ci][4]
                packed = np.concatenate(
                    [
                        packed[:, :start],
                        redo,
                        packed[:, start + old_k :],
                    ],
                    axis=1,
                )
                chunk_meta[ci] = (c0, cap, ka, kb, redo.shape[1])
                trunc_a = ka < cap and np.any(na > ka)
                trunc_b = kb < ka * g and np.any(nb1 > kb)
            if (ka, kb) != (ka0, kb0):
                part_key = tuple(levels[c0 : c0 + chunk])
                old = self._cap_floor.get(part_key, (0, 0))
                self._cap_floor[part_key] = (
                    max(old[0], ka), max(old[1], kb)
                )

        # Vectorized unpack (same rounding as round(): np.rint is
        # half-even too); the per-box Python loop cost ~1 us x raw
        # count x batch on the finish path.
        factors = np.array([lv[0] for lv in levels], dtype=np.float64)
        for b in range(nb):
            sel = packed[b]
            keep = sel[:, 0] > 0.5
            if not keep.any():
                continue
            f = factors[sel[keep, 3].astype(np.int64)]
            xs = np.rint(sel[keep, 1].astype(np.float64) * f).astype(int)
            ys = np.rint(sel[keep, 2].astype(np.float64) * f).astype(int)
            ws = np.rint(ww * f).astype(int)
            hs = np.rint(wh * f).astype(int)
            raw[b] = list(
                zip(xs.tolist(), ys.tolist(), ws.tolist(), hs.tolist())
            )
        self.last_dispatches = dispatches
        return [group_rectangles(r, min_neighbors, eps=0.2) for r in raw]

    def _detect_batch_per_level(
        self,
        grays: np.ndarray,
        levels: Sequence[Tuple[float, int, int, int]],
        min_neighbors: int,
    ) -> List[List[Tuple[int, int, int, int]]]:
        """Per-level engine (one dispatch per level; exact top_k=512)."""
        nb, h, w = grays.shape
        wh, ww = self.cascade.window_size
        raw: List[List[Tuple[int, int, int, int]]] = [[] for _ in range(nb)]
        frames_j = (
            grays.astype(jnp.float32)
            if isinstance(grays, jnp.ndarray)
            else jnp.asarray(grays.astype(np.float32))
        )
        dispatches = 0
        for (factor, sh, sw, step) in levels:
            win_w = int(round(ww * factor))
            win_h = int(round(wh * factor))
            scaled = (
                frames_j
                if (sw, sh) == (w, h)
                else resize_bilinear(frames_j, (sw, sh), jnp.float32)
            )
            ny = (sh - wh) // step + 1
            nx = (sw - ww) // step + 1
            ok, cx, cy = self._level_fn_batch(scaled, ny, nx, step)
            dispatches += 1
            ok = np.asarray(ok)
            cx = np.asarray(cx)
            cy = np.asarray(cy)
            for b in range(nb):
                keep = ok[b]
                if not keep.any():
                    continue
                xs = np.rint(cx[b, keep].astype(np.float64) * factor)
                ys = np.rint(cy[b, keep].astype(np.float64) * factor)
                raw[b].extend(
                    (int(x), int(y), win_w, win_h)
                    for x, y in zip(xs.tolist(), ys.tolist())
                )
        self.last_dispatches = dispatches
        return [group_rectangles(r, min_neighbors, eps=0.2) for r in raw]


# ---------------------------------------------------------------------------
# groupRectangles
# ---------------------------------------------------------------------------


def group_rectangles(
    rects: Sequence[Tuple[int, int, int, int]],
    group_threshold: int,
    eps: float = 0.2,
) -> List[Tuple[int, int, int, int]]:
    """OpenCV ``groupRectangles`` semantics: union-find under the
    SimilarRects predicate, average each cluster, keep clusters with
    more than ``group_threshold`` members minus the contained-rect
    rejection pass.

    Dispatches to the native C++ implementation when built (the O(n^2)
    pair loop costs ~35 ms/frame in Python at 150 raw windows --
    measured -- and dominates the detect host half); the Python form
    below is the fallback and the parity oracle (tests/test_native.py
    pins them element-exact)."""
    n = len(rects)
    if n == 0:
        return []
    if group_threshold <= 0:
        return list(rects)
    from face_detection_recognization_pca_tpu.io.native import (
        group_rectangles_native,
    )

    native = group_rectangles_native(rects, group_threshold, eps)
    if native is not None:
        return native
    return _group_rectangles_py(rects, group_threshold, eps)


def _group_rectangles_py(
    rects: Sequence[Tuple[int, int, int, int]],
    group_threshold: int,
    eps: float = 0.2,
) -> List[Tuple[int, int, int, int]]:
    """Pure-Python ``group_rectangles`` (fallback + native-parity oracle)."""
    n = len(rects)
    if n == 0:
        return []
    if group_threshold <= 0:
        return list(rects)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    arr = np.asarray(rects, dtype=np.float64)
    for i in range(n):
        for j in range(i + 1, n):
            delta = eps * 0.5 * (
                min(arr[i, 2], arr[j, 2]) + min(arr[i, 3], arr[j, 3])
            )
            if (
                abs(arr[i, 0] - arr[j, 0]) <= delta
                and abs(arr[i, 1] - arr[j, 1]) <= delta
                and abs(arr[i, 0] + arr[i, 2] - arr[j, 0] - arr[j, 2]) <= delta
                and abs(arr[i, 1] + arr[i, 3] - arr[j, 1] - arr[j, 3]) <= delta
            ):
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[rb] = ra

    clusters: dict = {}
    for i in range(n):
        clusters.setdefault(find(i), []).append(i)

    merged = []
    for members in clusters.values():
        cnt = len(members)
        if cnt <= group_threshold:
            continue
        m = arr[members].mean(axis=0)
        merged.append(
            (
                int(round(m[0])),
                int(round(m[1])),
                int(round(m[2])),
                int(round(m[3])),
                cnt,
            )
        )

    out = []
    for i, r1 in enumerate(merged):
        keep = True
        for j, r2 in enumerate(merged):
            if i == j:
                continue
            dx = int(round(r2[2] * eps))
            dy = int(round(r2[3] * eps))
            inside = (
                r1[0] >= r2[0] - dx
                and r1[1] >= r2[1] - dy
                and r1[0] + r1[2] <= r2[0] + r2[2] + dx
                and r1[1] + r1[3] <= r2[1] + r2[3] + dy
            )
            if inside and (r2[4] > max(3, r1[4]) or r1[4] < 3):
                keep = False
                break
        if keep:
            out.append((r1[0], r1[1], r1[2], r1[3]))
    return out

"""Haar engine oracles.

The reference's shipped detection JSONs carry no real box geometry
(every record has x=y=0: they were backfilled from crop filenames by
``generate_detection_json.py``, and their source videos are not
shipped), and this deployment's cv2 5.0 wheel has no CascadeClassifier.
So the box-level oracle is built the same way as the HOG/LBP oracles:
an independent NumPy float64 implementation of the full 25-stage stump
cascade, written in this test from the OpenCV algorithm (window
normalization ``nf = sqrt(area*sqsum - sum^2)``, stump test
``rectsum < t * nf``, per-stage sum thresholds), evaluated densely on
real video pixels and compared window-for-window with the fused TPU
program.  A second test pins fused-vs-per-level engine equality and
the dispatch-count contract on a real frame.
"""

import os

import numpy as np
import pytest


def numpy_cascade_accepts(gray, cascade, step=2):
    """All windows of one pyramid level through every stage, float64."""
    f = np.asarray(gray, dtype=np.float64)
    h, w = f.shape
    wh, ww = cascade.window_size
    integral = np.zeros((h + 1, w + 1))
    integral[1:, 1:] = f.cumsum(0).cumsum(1)
    sqintegral = np.zeros((h + 1, w + 1))
    sqintegral[1:, 1:] = (f * f).cumsum(0).cumsum(1)
    ny = (h - wh) // step + 1
    nx = (w - ww) // step + 1

    def rect_sum(ii, x, y, rw, rh):
        ys = np.arange(ny) * step
        xs = np.arange(nx) * step
        Y, X = np.meshgrid(ys, xs, indexing="ij")
        return (
            ii[Y + y + rh, X + x + rw]
            - ii[Y + y + rh, X + x]
            - ii[Y + y, X + x + rw]
            + ii[Y + y, X + x]
        )

    area = (wh - 2) * (ww - 2)
    s1 = rect_sum(integral, 1, 1, ww - 2, wh - 2)
    s2 = rect_sum(sqintegral, 1, 1, ww - 2, wh - 2)
    nf2 = area * s2 - s1 * s1
    nf = np.where(nf2 > 0, np.sqrt(np.maximum(nf2, 0)), 1.0)

    passed = np.ones((ny, nx), dtype=bool)
    for si in range(cascade.n_stages):
        stage_sum = np.zeros((ny, nx))
        for s in range(
            cascade.stage_offsets[si], cascade.stage_offsets[si + 1]
        ):
            val = np.zeros((ny, nx))
            for (x, y, rw, rh, wt) in cascade.rects[cascade.stump_feature[s]]:
                if wt == 0.0:
                    continue
                val += wt * rect_sum(
                    integral, int(x), int(y), int(rw), int(rh)
                )
            stage_sum += np.where(
                val < cascade.stump_threshold[s] * nf,
                cascade.leaf0[s],
                cascade.leaf1[s],
            )
        passed &= stage_sum >= cascade.stage_thresholds[si]
    ys, xs = np.nonzero(passed)
    return {(int(x) * step, int(y) * step) for y, x in zip(ys, xs)}


@pytest.fixture(scope="module")
def face_region(reference_root):
    """Real pixels: test.mp4 frame 0 downscaled 0.11x so the ~219 px
    face lands at ~24 px -- the cascade base size, where the full
    25-stage cascade accepts windows at this level (verified: one
    accept at (40, 22))."""
    import cv2

    from face_detection_recognization_pca_tpu.io.video import VideoReader

    r = VideoReader(os.path.join(reference_root, "videos/test.mp4"))
    frame = next(iter(r.frames()))
    r.close()
    gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    return cv2.resize(gray, None, fx=0.11, fy=0.11)


def test_fused_program_matches_numpy_cascade(face_region):
    """Window-for-window full-cascade parity of the fused single-level
    program against the independent float64 NumPy implementation."""
    import jax.numpy as jnp

    from face_detection_recognization_pca_tpu.detect import haar

    cascade = haar.load_cascade()
    h, w = face_region.shape
    levels = ((1.0, h, w, 2),)
    fn_one, _ = haar._make_pyramid_fn(cascade, levels, prefilter_stages=5)
    ok, cx, cy, lid, na, nb1 = fn_one(
        jnp.asarray(face_region.astype(np.float32))
    )
    ok = np.asarray(ok)[0]  # fn_one keeps the B=1 batch dim
    got = {
        (int(x), int(y))
        for x, y, o in zip(np.asarray(cx)[0], np.asarray(cy)[0], ok)
        if o
    }
    want = numpy_cascade_accepts(face_region, cascade, step=2)
    assert want, "oracle found no accepts -- fixture region is wrong"
    assert got == want


def test_deep_funnel_equals_shallow(face_region):
    """The deep single-pool funnel (10 dense prefilter stages, the
    accelerator default) and the shallow two-pool funnel (5 stages,
    the CPU default) must produce identical detections -- the funnel
    depth is a tuning knob, never a semantics knob."""
    import cv2

    from face_detection_recognization_pca_tpu.detect.haar import HaarDetector

    big = cv2.resize(face_region, (256, 192))
    shallow = HaarDetector(prefilter_stages=5)
    deep = HaarDetector(prefilter_stages=10)
    out_s = shallow.detect_multi_scale(big, min_size=(24, 24))
    out_d = deep.detect_multi_scale(big, min_size=(24, 24))
    assert out_s == out_d
    assert out_s, "no detections on the real face region"


def test_phase_planes_equal_direct_grid(face_region):
    """The stride-2 phase-plane corner reads (the fusible form every
    backend now uses) must reproduce the direct strided-grid reads
    bit-for-bit on a real integral image."""
    import jax
    import jax.numpy as jnp

    from face_detection_recognization_pca_tpu.detect import haar

    f = face_region.astype(np.float32)
    integral = jnp.pad(
        jnp.cumsum(jnp.cumsum(jnp.asarray(f), 0), 1), [(1, 0), (1, 0)]
    )
    h, w = f.shape
    ny, nx = (h - 24) // 2 + 1, (w - 24) // 2 + 1

    @jax.jit
    def both(integ):
        planes = haar._phase_planes(integ, 25)
        outs = []
        # Max real corner offset is 24 (window is 24x24, y+h <= 24).
        for (dy, dx) in ((0, 0), (1, 1), (24, 24), (13, 7), (23, 2)):
            outs.append(
                (
                    haar._corner_grid(integ, planes, dy, dx, ny, nx, 2),
                    jax.lax.slice(
                        integ,
                        (dy, dx),
                        (dy + 2 * (ny - 1) + 1, dx + 2 * (nx - 1) + 1),
                        (2, 2),
                    ),
                )
            )
        return outs

    for got, want in both(integral):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_engine_equals_per_level_engine(face_region):
    """Same final detections from the 1-dispatch-per-chunk fused path
    and the per-level path, on real pixels, with the dispatch-count
    contract (>=5x fewer device round-trips)."""
    import cv2

    from face_detection_recognization_pca_tpu.detect.haar import HaarDetector

    big = cv2.resize(face_region, (256, 192))  # multi-level pyramid
    det = HaarDetector()
    fused = det.detect_multi_scale(big, min_size=(24, 24))
    fused_dispatches = det.last_dispatches
    det.fused_pyramid = False
    legacy = det.detect_multi_scale(big, min_size=(24, 24))
    legacy_dispatches = det.last_dispatches
    assert fused == legacy
    assert fused, "no detections on the real face region"
    assert fused_dispatches * 5 <= legacy_dispatches + 30
    # The per-level engine pays ~2 round-trips per level (resize +
    # eval); the fused one pays 1 per ~5-level chunk plus ONE packed
    # download program for the whole pyramid.
    assert fused_dispatches <= (legacy_dispatches + 4) // 5 + 1

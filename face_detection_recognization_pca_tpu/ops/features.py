"""Feature extractors for the enhanced ensemble: HOG, uniform LBP,
histogram equalization, sharpening, augmentations.

The reference's enhanced generation (``useless/train-enhanced.py``)
uses skimage's ``hog`` (9 orientations, 8x8 cells, 2x2 blocks, L2-Hys)
and ``local_binary_pattern`` (P=24, R=3, uniform) plus cv2 augmentation
(flip, +-5 deg rotation, brightness alpha/beta, 3x3 Gaussian blur) and
profile preprocessing (equalizeHist + sharpen kernel).  skimage does
not exist in this deployment, so these are ground-up JAX
implementations of the same standard descriptors -- vectorized over
pixels (VPU) with gathers replaced by bilinear ``map_coordinates``.
All are batched-friendly via vmap and jittable.
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# HOG
# ---------------------------------------------------------------------------


def hog_features(
    img: jnp.ndarray,
    orientations: int = 9,
    cell: int = 8,
    block: int = 2,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """HOG descriptor (unsigned gradients, hard binning, L2-Hys blocks).

    For a 64x64 input with default params: 8x8 cells -> 7x7 blocks of
    2x2x9 = (1764,) features, the same length skimage produces for the
    reference's call (``train-enhanced.py:86-93``).
    """
    x = img.astype(jnp.float32)
    h, w = x.shape
    # Central-difference gradients with zero edges (skimage convention).
    gy = jnp.zeros_like(x).at[1:-1, :].set(x[2:, :] - x[:-2, :])
    gx = jnp.zeros_like(x).at[:, 1:-1].set(x[:, 2:] - x[:, :-2])
    mag = jnp.sqrt(gx * gx + gy * gy)
    # Unsigned orientation in [0, 180).
    ang = jnp.degrees(jnp.arctan2(gy, gx)) % 180.0
    bin_width = 180.0 / orientations
    bin_idx = jnp.clip((ang // bin_width).astype(jnp.int32), 0, orientations - 1)

    ch, cw = h // cell, w // cell
    # Per-pixel one-hot into orientation bins, weighted by magnitude.
    onehot = jax.nn.one_hot(bin_idx, orientations, dtype=jnp.float32)
    weighted = onehot * mag[..., None]  # (h, w, o)
    cells = weighted[: ch * cell, : cw * cell].reshape(
        ch, cell, cw, cell, orientations
    ).sum(axis=(1, 3)) / (cell * cell)  # (ch, cw, o), mean like skimage

    # Blocks with L2-Hys normalization.
    bh, bw = ch - block + 1, cw - block + 1
    out = []
    for by in range(block):
        for bx in range(block):
            out.append(cells[by : by + bh, bx : bx + bw])
    blocks = jnp.stack(out, axis=2)  # (bh, bw, block*block, o)
    blocks = blocks.reshape(bh, bw, -1)
    norm = jnp.sqrt(jnp.sum(blocks * blocks, axis=-1, keepdims=True) + eps**2)
    blocks = blocks / norm
    blocks = jnp.minimum(blocks, 0.2)
    norm2 = jnp.sqrt(jnp.sum(blocks * blocks, axis=-1, keepdims=True) + eps**2)
    blocks = blocks / norm2
    return blocks.reshape(-1)


# ---------------------------------------------------------------------------
# Uniform LBP
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _lbp_offsets(n_points: int, radius: float):
    ang = 2.0 * np.pi * np.arange(n_points) / n_points
    # skimage convention: (row, col) = (-R sin, R cos)? It uses
    # (R * sin, R * cos) with rows increasing downward.
    ry = radius * np.sin(ang)
    rx = radius * np.cos(ang)
    return np.stack([ry, rx], axis=0).astype(np.float32)


def lbp_uniform_hist(
    img: jnp.ndarray, n_points: int = 24, radius: float = 3.0
) -> jnp.ndarray:
    """Uniform LBP histogram, ``n_points + 2`` bins, density-normalized
    (reference ``train-enhanced.py:96-115``).

    Uniform coding: patterns with <= 2 circular 0/1 transitions map to
    their popcount (0..P); all others to bin P+1.
    """
    x = img.astype(jnp.float32)
    h, w = x.shape
    offs = _lbp_offsets(n_points, radius)
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]

    bits = []
    for p in range(n_points):
        ry, rx = float(offs[0, p]), float(offs[1, p])
        sampled = jax.scipy.ndimage.map_coordinates(
            x, [rows + ry + jnp.zeros((h, w)), cols + rx + jnp.zeros((h, w))],
            order=1, mode="constant", cval=0.0,
        )
        bits.append((sampled >= x).astype(jnp.int32))
    bits = jnp.stack(bits, axis=-1)  # (h, w, P)

    transitions = jnp.sum(
        jnp.abs(bits - jnp.roll(bits, 1, axis=-1)), axis=-1
    )
    popcount = jnp.sum(bits, axis=-1)
    code = jnp.where(transitions <= 2, popcount, n_points + 1)

    nbins = n_points + 2
    hist = jnp.sum(
        jax.nn.one_hot(code.reshape(-1), nbins, dtype=jnp.float32), axis=0
    )
    return hist / (h * w)


# ---------------------------------------------------------------------------
# Preprocessing / augmentation (cv2 semantics)
# ---------------------------------------------------------------------------


def equalize_hist_u8(img: jnp.ndarray) -> jnp.ndarray:
    """cv2.equalizeHist parity for uint8 images: LUT from the cumulative
    histogram excluding leading zeros, round-half-up scaling."""
    x = img.astype(jnp.int32)
    hist = jnp.sum(
        jax.nn.one_hot(x.reshape(-1), 256, dtype=jnp.float32), axis=0
    )
    cdf = jnp.cumsum(hist)
    total = cdf[-1]
    # First nonzero histogram value's cdf (cv2 skips it in scaling).
    nz_mask = hist > 0
    cdf_min = jnp.min(jnp.where(nz_mask, cdf, jnp.inf))
    denom = jnp.maximum(total - cdf_min, 1.0)
    lut = jnp.clip(
        jnp.round((cdf - cdf_min) / denom * 255.0), 0, 255
    ).astype(jnp.uint8)
    return lut[x]


def sharpen_u8(img: jnp.ndarray) -> jnp.ndarray:
    """3x3 sharpen kernel [[-1..],[−1,9,−1],..] with saturation, matching
    ``cv2.filter2D`` + clip of the reference (border: reflect101)."""
    x = img.astype(jnp.float32)
    p = jnp.pad(x, 1, mode="reflect")
    out = 9.0 * x
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            out = out - p[1 + dy : 1 + dy + x.shape[0], 1 + dx : 1 + dx + x.shape[1]]
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def convert_scale_abs(img: jnp.ndarray, alpha: float, beta: float) -> jnp.ndarray:
    """cv2.convertScaleAbs: |alpha*x + beta| saturated to uint8."""
    out = jnp.abs(img.astype(jnp.float32) * alpha + beta)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def gaussian_blur3_u8(img: jnp.ndarray) -> jnp.ndarray:
    """cv2.GaussianBlur(img, (3,3), 0): separable [1,2,1]/4 kernel."""
    x = img.astype(jnp.float32)
    p = jnp.pad(x, 1, mode="reflect")
    hsum = 0.25 * (p[1:-1, :-2] + 2 * p[1:-1, 1:-1] + p[1:-1, 2:])
    p2 = jnp.pad(hsum, ((1, 1), (0, 0)), mode="reflect")
    out = 0.25 * (p2[:-2] + 2 * p2[1:-1] + p2[2:])
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def rotate_u8(img: jnp.ndarray, degrees: float) -> jnp.ndarray:
    """cv2.warpAffine with getRotationMatrix2D(center, angle, 1.0):
    bilinear, zero border."""
    h, w = img.shape
    cy, cx = (h - 1) * 0.0 + h // 2, w // 2  # cv2 integer-center convention
    rad = math.radians(degrees)
    ca, sa = math.cos(rad), math.sin(rad)
    rows = jnp.arange(h, dtype=jnp.float32)[:, None] + jnp.zeros((h, w))
    cols = jnp.arange(w, dtype=jnp.float32)[None, :] + jnp.zeros((h, w))
    # Inverse map: source = R^-1 (dst - c) + c ; R(angle) in cv2 rotates
    # counter-clockwise for positive angle in image coords.
    sx = ca * (cols - cx) - sa * (rows - cy) + cx
    sy = sa * (cols - cx) + ca * (rows - cy) + cy
    out = jax.scipy.ndimage.map_coordinates(
        img.astype(jnp.float32), [sy, sx], order=1, mode="constant", cval=0.0
    )
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def augment_face(img: jnp.ndarray) -> jnp.ndarray:
    """The reference's 7-variant augmentation set
    (``train-enhanced.py:117-151``): original, horizontal flip,
    +-5 degree rotations, brightness up/down, 3x3 Gaussian blur.

    Returns ``(7, h, w)`` uint8.
    """
    img = img.astype(jnp.uint8)
    return jnp.stack(
        [
            img,
            img[:, ::-1],
            rotate_u8(img, -5.0),
            rotate_u8(img, 5.0),
            convert_scale_abs(img, 1.2, 10.0),
            convert_scale_abs(img, 0.8, -10.0),
            gaussian_blur3_u8(img),
        ]
    )

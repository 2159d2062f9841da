"""Normalized cross-correlation: ``cv2.matchTemplate`` TM_CCOEFF_NORMED
as fused XLA ops.

This is the hot detection kernel of the reference's live pipeline
(``scan-template-v4.py:172``) and guided video scanner
(``scripts/manual/scan-template-v2.py:507``).  OpenCV computes it with
an FFT + integral-image correction in C++; here the same math compiles
to TPU primitives:

    R(x,y) = sum_T' . I_win  /  sqrt(sum T'^2 * (sum I_win^2 - (sum I_win)^2/n))

with T' = T - mean(T).  Because sum(T') == 0, the numerator is just the
cross-correlation of the frame with the zero-meaned template -- one XLA
convolution that lands on the MXU -- and the window statistics come from
two integral images (:mod:`.integral`).  A direct-conv path handles the
search-window sizes of the guided scanner; an rFFT path covers
full-frame matching with big templates where conv FLOPs explode.

``minMaxLoc`` parity: OpenCV scans row-major and keeps the first
maximum; ``argmax`` over the flattened result does the same.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from face_detection_recognization_pca_tpu.ops.integral import (
    integral_image,
    window_sums,
)


def _xcorr_direct(frame: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Valid cross-correlation via conv_general_dilated (MXU)."""
    lhs = frame[None, None, :, :]
    rhs = kernel[None, None, :, :]
    out = lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=frame.dtype,
    )
    return out[0, 0]


def _next_fast_len(n: int) -> int:
    """Smallest 5-smooth number >= n (good FFT sizes)."""
    best = 1 << (n - 1).bit_length()
    f5 = 1
    while f5 < best:
        f35 = f5
        while f35 < best:
            x = f35
            while x < n:
                x *= 2
            best = min(best, x)
            f35 *= 3
        f5 *= 5
    return best


def _xcorr_fft(frame: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Valid cross-correlation via rFFT (for large templates)."""
    fh, fw = frame.shape
    kh, kw = kernel.shape
    sh, sw = _next_fast_len(fh), _next_fast_len(fw)
    f = jnp.fft.rfft2(frame.astype(jnp.float32), (sh, sw))
    # Correlation = conv with flipped kernel => conjugate in Fourier.
    k = jnp.fft.rfft2(kernel.astype(jnp.float32), (sh, sw))
    out = jnp.fft.irfft2(f * jnp.conj(k), (sh, sw))
    return out[: fh - kh + 1, : fw - kw + 1].astype(frame.dtype)


def match_template_ccoeff_normed(
    frame: jnp.ndarray,
    template: jnp.ndarray,
    method: str = "auto",
    eps: float = 1e-7,
) -> jnp.ndarray:
    """TM_CCOEFF_NORMED score map over all valid positions.

    Args:
      frame: ``(H, W)`` grayscale image (float recommended).
      template: ``(h, w)`` grayscale template, ``h <= H``, ``w <= W``.
      method: 'direct' (conv), 'fft', or 'auto' (FLOP-based choice).

    Returns:
      ``(H - h + 1, W - w + 1)`` scores in [-1, 1]; flat windows give 0
      (matching OpenCV's behavior on zero-variance denominators).
    """
    dtype = jnp.promote_types(frame.dtype, jnp.float32)
    f = frame.astype(dtype)
    # Global-mean centering: invariant for TM_CCOEFF_NORMED (the
    # zero-mean template kills the constant in the numerator, and the
    # window variance is shift-invariant) but avoids catastrophic f32
    # cancellation in s2 - s1^2/n on accelerator paths.
    f = f - jnp.mean(f)
    t = template.astype(dtype)
    th, tw = t.shape
    n = th * tw

    t0 = t - jnp.mean(t)
    t_energy = jnp.sum(t0 * t0)

    if method == "auto":
        # Measured on TPU v5e: XLA's direct conv with large kernels runs
        # ~50x off MXU peak (92 ms for 512x 192^2 windows with a 96^2
        # kernel vs 13 ms via rFFT).  Prefer FFT whenever the kernel is
        # nontrivial; direct conv only wins for small templates where
        # FFT padding overhead dominates.
        method = "direct" if n <= 32 * 32 else "fft"
    num = (_xcorr_direct if method == "direct" else _xcorr_fft)(f, t0)

    s1 = window_sums(integral_image(f, dtype), (th, tw))
    s2 = window_sums(integral_image(f * f, dtype), (th, tw))
    win_var_n = jnp.maximum(s2 - s1 * s1 / n, 0.0)  # n * window variance
    # Guard flat windows: below ~eps-level per-pixel variance the score
    # is pure floating-point noise (OpenCV zeroes these too).  In f32 /
    # FFT mode the threshold must be meaningfully above rounding error.
    var_floor = n * (eps if f.dtype == jnp.float64 else 1e-2)
    safe = win_var_n > var_floor
    denom = jnp.sqrt(t_energy * win_var_n)
    scores = jnp.where(safe, num / jnp.where(safe, denom, 1.0), 0.0)
    return jnp.clip(scores, -1.0, 1.0)


def match_template_ccoeff(
    frame: jnp.ndarray, template: jnp.ndarray, method: str = "auto"
) -> jnp.ndarray:
    """Plain TM_CCOEFF (unnormalized correlation coefficient), the mode
    of the reference's template-detector generation
    (``useless/scan-template.py:101-147``): cross-correlation of the
    window-mean-removed frame with the zero-mean template.

    R(x,y) = sum (T - mean T) . (I_win - mean I_win)
           = corr(I, T0) - sum(I_win) * mean(T0) = corr(I, T0)
    since T0 is zero-mean; identical numerator to the normed variant,
    just without the variance normalization.
    """
    dtype = jnp.promote_types(frame.dtype, jnp.float32)
    f = frame.astype(dtype)
    t = template.astype(dtype)
    t0 = t - jnp.mean(t)
    n = t.shape[0] * t.shape[1]
    if method == "auto":
        method = "direct" if n <= 32 * 32 else "fft"
    return (_xcorr_direct if method == "direct" else _xcorr_fft)(f, t0)


def min_max_loc(scores: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``cv2.minMaxLoc`` max side: (max_val, (x, y)) with row-major
    first-occurrence tie-breaking."""
    flat = scores.reshape(-1)
    idx = jnp.argmax(flat)
    w = scores.shape[-1]
    return flat[idx], jnp.stack([idx % w, idx // w])


def match_best(
    frame: jnp.ndarray, template: jnp.ndarray, method: str = "auto"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best-match shortcut: (score, (x, y)) like the reference's
    ``minMaxLoc(matchTemplate(...))`` pairs."""
    return min_max_loc(match_template_ccoeff_normed(frame, template, method))

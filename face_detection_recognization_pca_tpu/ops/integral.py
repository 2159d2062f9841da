"""Integral images and windowed moments.

The workhorse behind normalized template matching and the Haar cascade:
window sums in O(1) per window from a 2-D prefix sum, instead of the
O(hw) sliding sums OpenCV does in C.  On TPU the cumulative sums map to
XLA's scan-based cumsum (log-depth) and the window gathers are cheap
VPU slices with static offsets.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def integral_image(img: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Zero-padded integral image: ``S[i, j] = sum(img[:i, :j])``.

    Output is ``(H + 1, W + 1)`` so window sums need no edge cases
    (OpenCV's ``cv2.integral`` layout).  Batched over leading dims.
    """
    dtype = dtype or jnp.promote_types(img.dtype, jnp.float32)
    x = img.astype(dtype)
    s = jnp.cumsum(jnp.cumsum(x, axis=-2), axis=-1)
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 0), (1, 0)]
    return jnp.pad(s, pad)


def window_sums(
    integral: jnp.ndarray, window: Tuple[int, int]
) -> jnp.ndarray:
    """Sum of every (wh, ww) window (valid positions) from an integral.

    Args:
      integral: ``(..., H + 1, W + 1)`` from :func:`integral_image`.
      window: ``(wh, ww)`` static window size.

    Returns:
      ``(..., H - wh + 1, W - ww + 1)`` window sums.
    """
    wh, ww = window
    a = integral[..., wh:, ww:]
    b = integral[..., wh:, :-ww]
    c = integral[..., :-wh, ww:]
    d = integral[..., :-wh, :-ww]
    return a - b - c + d


def window_mean_var(
    img: jnp.ndarray, window: Tuple[int, int], dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-window mean and (population) variance via two integrals."""
    wh, ww = window
    n = wh * ww
    s1 = window_sums(integral_image(img, dtype), window)
    s2 = window_sums(integral_image(img.astype(dtype) ** 2, dtype), window)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    return mean, var

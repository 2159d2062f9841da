"""Bilinear resize with OpenCV numeric parity.

The reference resizes every crop with ``cv2.resize(gray, (64, 64))``
(INTER_LINEAR default -- reference ``train-v4.py:66``,
``scan-template-v4.py:262``) and rescales templates the same way
(``scan-template-v4.py:169``).  OpenCV's 8-bit bilinear is fixed point
(coefficients rounded to 1/2048, accumulated in int32, final shift by 22
with round-half-up), so a float resize can differ by 1 LSB.  Two paths:

* :func:`resize_bilinear_u8_exact` -- bit-exact emulation of the OpenCV
  uint8 path (int32 VPU math; used by the parity harness and the
  artifact-compatible CLIs);
* :func:`resize_bilinear` -- float resize expressed as two interpolation
  matmuls, which XLA maps straight onto the MXU and fuses with the
  downstream flatten/standardize/projection (the TPU throughput path).

Both use half-pixel centers with edge clamping, matching cv2 geometry.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_COEF_BITS = 11
_COEF_SCALE = 1 << _COEF_BITS  # 2048


def _fixed_point_coeffs(
    src: int, dst: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-output-index source index pair + fixed-point weights, cv2-style.

    Border semantics (verified against OpenCV 5.0 pixel-for-pixel): the
    fractional weight is NOT zeroed at clamped borders.  cv2 keeps the
    split pair ``(2048-r, r)`` computed from the unclamped fraction and
    clamps both source indices onto the border row, so the extrapolated
    value is ``(w0+w1)*p`` -- same real value, but in the vertical
    uint8 path each term truncates separately at ``>>16``, which loses
    1 LSB on ~0.1% of border pixels relative to a single 2048-weight
    term.  Returns ``(s0, s1, w0, w1)`` with both indices pre-clamped.
    """
    scale = src / dst  # double, like cv2
    d = np.arange(dst, dtype=np.float64)
    f = ((d + 0.5) * scale - 0.5).astype(np.float32)
    s = np.floor(f).astype(np.int64)
    f = f - s
    s0 = np.clip(s, 0, src - 1).astype(np.int32)
    s1 = np.clip(s + 1, 0, src - 1).astype(np.int32)
    # cvRound == round-half-to-even on the float32 product; cv2 rounds
    # the two coefficients independently.
    w1 = np.rint((f * _COEF_SCALE).astype(np.float32)).astype(np.int32)
    w0 = np.rint(((1.0 - f) * _COEF_SCALE).astype(np.float32)).astype(np.int32)
    return s0, s1, w0, w1


@functools.partial(jnp.vectorize, excluded=(1,), signature="(h,w)->(p,q)")
def _resize_u8_exact_2d(img: jnp.ndarray, dsize: Tuple[int, int]) -> jnp.ndarray:
    dw, dh = dsize
    sh, sw = img.shape
    sx, sx1, ax0, ax1 = _fixed_point_coeffs(sw, dw)
    sy, sy1, by0, by1 = _fixed_point_coeffs(sh, dh)

    x = img.astype(jnp.int32)
    # Horizontal pass: int32 rows of a0*p0 + a1*p1 (<= 2049*255, fits easily).
    rows = x[:, sx] * ax0[None, :] + x[:, sx1] * ax1[None, :]
    if dh == sh:
        # Pure-horizontal resize: OpenCV casts rows with full 11-bit rounding.
        acc = (rows + (1 << (_COEF_BITS - 1))) >> _COEF_BITS
    else:
        # Vertical pass, emulating OpenCV's int16-mulhi SIMD semantics:
        # rows are pre-shifted by 4, each b*r product truncates at >>16,
        # and the final 2 bits round half-up (+2 >> 2).
        r0 = rows[sy, :] >> 4
        r1 = rows[sy1, :] >> 4
        m = ((by0[:, None] * r0) >> 16) + ((by1[:, None] * r1) >> 16)
        acc = (m + 2) >> 2
    return jnp.clip(acc, 0, 255).astype(jnp.uint8)


def resize_bilinear_u8_exact(img: jnp.ndarray, dsize: Tuple[int, int]) -> jnp.ndarray:
    """``cv2.resize(img, dsize)`` (INTER_LINEAR) for uint8 grayscale images.

    Bit-exact against OpenCV 5.0 in both directions (validated over
    randomized up/down/mixed sweeps -- these cover every parity path in
    the pipeline: crop->64x64, crop->100x100, template 0.8x, and
    upscaled small crops).  The subtle part is border extrapolation:
    cv2 keeps SPLIT fractional weights at clamped rows, and the
    vertical pass's two separate ``>>16`` truncations occasionally land
    1 LSB below a single 2048-weight term -- emulated exactly here.

    Args:
      img: uint8 array ``(..., H, W)``.
      dsize: ``(width, height)`` in OpenCV argument order.

    Returns:
      uint8 array ``(..., dsize[1], dsize[0])``.
    """
    return _resize_u8_exact_2d(img, tuple(dsize))


def _interp_matrix(src: int, dst: int, dtype) -> np.ndarray:
    """Dense (dst, src) bilinear interpolation matrix, half-pixel centers."""
    scale = src / dst
    d = np.arange(dst, dtype=np.float64)
    f = (d + 0.5) * scale - 0.5
    s = np.floor(f).astype(np.int64)
    f = f - s
    f = np.where(s < 0, 0.0, f)
    s = np.maximum(s, 0)
    f = np.where(s >= src - 1, 0.0, f)
    s = np.minimum(s, src - 1)
    s1 = np.minimum(s + 1, src - 1)
    m = np.zeros((dst, src), dtype=np.float64)
    m[np.arange(dst), s] += 1.0 - f
    m[np.arange(dst), s1] += f
    return m.astype(dtype)


@functools.lru_cache(maxsize=256)
def _interp_matrices(sh: int, sw: int, dh: int, dw: int, dtype_name: str):
    # Cache host (NumPy) arrays only: jnp constants created while
    # tracing are tracers, and caching one poisons every later call
    # (jax UnexpectedTracerError).  Conversion happens per call site.
    dtype = np.dtype(dtype_name)
    return (
        _interp_matrix(sh, dh, dtype),
        np.ascontiguousarray(_interp_matrix(sw, dw, dtype).T),
    )


def resize_bilinear(img: jnp.ndarray, dsize: Tuple[int, int], dtype=jnp.float32) -> jnp.ndarray:
    """Float bilinear resize as two MXU matmuls: ``Wy @ img @ Wx^T``.

    Matches OpenCV INTER_LINEAR geometry (half-pixel centers, clamped
    edges); values agree with the uint8 fixed-point path to <= 1 LSB.
    Batched over leading dims; ``dsize`` is ``(width, height)``.
    """
    dw, dh = int(dsize[0]), int(dsize[1])
    sh, sw = img.shape[-2], img.shape[-1]
    dtype = jnp.dtype(dtype)
    wy, wxt = _interp_matrices(sh, sw, dh, dw, dtype.name)
    wy, wxt = jnp.asarray(wy), jnp.asarray(wxt)
    x = img.astype(dtype)
    # HIGHEST precision: bf16 MXU passes (the TPU default) perturb
    # resized pixels by ~0.4% -- enough to flip Haar stump comparisons
    # against the CPU-f32 oracle.
    out = jnp.einsum(
        "ps,...sw,wq->...pq",
        wy,
        x,
        wxt,
        preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out

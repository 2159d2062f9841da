"""Fused face-crop preprocessing: gray -> resize -> flatten -> standardize.

This is the chain every reference stage runs per crop
(``train-v4.py:65-68``, ``scan-template-v4.py:253-268``).  Here it is a
pure function over batches with static shapes, so XLA fuses the resize
matmuls, the flatten, and the z-score into the downstream eigenspace
projection -- one HBM round-trip per crop batch instead of five
Python/OpenCV hops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from face_detection_recognization_pca_tpu.ops.color import bgr_to_gray, bgr_to_gray_exact
from face_detection_recognization_pca_tpu.ops.resize import (
    resize_bilinear,
    resize_bilinear_u8_exact,
)


def preprocess_crop(
    crop: jnp.ndarray,
    face_size: Tuple[int, int] = (64, 64),
    exact: bool = False,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """One crop -> flattened face vector.

    Args:
      crop: ``(H, W)`` grayscale or ``(H, W, 3)`` BGR uint8 crop.
      face_size: ``(width, height)`` target, cv2 argument order.
      exact: use the bit-exact OpenCV uint8 path (parity harness / CLIs);
        otherwise the float MXU path.
      dtype: output dtype.

    Returns:
      ``(face_size[0] * face_size[1],)`` vector, row-major flatten like
      ``np.ndarray.flatten`` on the resized image.
    """
    return preprocess_crops(crop[None], face_size, exact=exact, dtype=dtype)[0]


def preprocess_crops(
    crops: jnp.ndarray,
    face_size: Tuple[int, int] = (64, 64),
    exact: bool = False,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Batched crops ``(B, H, W[, 3])`` -> face vectors ``(B, d)``."""
    if crops.ndim == 4:
        gray = bgr_to_gray_exact(crops) if exact else bgr_to_gray(crops, dtype)
    else:
        gray = crops
    if exact:
        resized = resize_bilinear_u8_exact(gray.astype(jnp.uint8), face_size)
    else:
        resized = resize_bilinear(gray, face_size, dtype=dtype)
    b = resized.shape[0]
    return resized.reshape(b, -1).astype(dtype)


def apply_scaler(
    x: jnp.ndarray, mean: jnp.ndarray, scale: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """StandardScaler.transform parity: ``(x - mean) / scale``.

    ``scale`` entries of zero were already replaced by 1 at fit time
    (reference ``scripts/manual/scan-template-v2.py:63-66``); pass
    ``None`` for the v1 center-only path (``useless/train.py:74``).
    """
    if scale is None:
        return x - mean
    return (x - mean) / scale


def crop_resize_dynamic(
    frame: jnp.ndarray,
    box: jnp.ndarray,
    out_size: Tuple[int, int],
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Crop a runtime-variable box from a frame and resize, all under jit.

    XLA needs static shapes, so variable face boxes are handled with
    ``jax.image.scale_and_translate``: the (x, y, w, h) box is mapped to
    a scale/translation of the bilinear kernel over the *whole* frame,
    which compiles to two dense gathers -- no host round trip per box.

    Geometry matches a cv2 crop-then-resize with half-pixel centers.

    Args:
      frame: ``(H, W)`` grayscale frame (any float/int dtype).
      box: ``(4,)`` int/float array ``[x, y, w, h]`` (traced OK).
      out_size: static ``(width, height)``.
    """
    ow, oh = int(out_size[0]), int(out_size[1])
    x, y, w, h = [box[i].astype(dtype) for i in range(4)]
    scale = jnp.stack([oh / jnp.maximum(h, 1.0), ow / jnp.maximum(w, 1.0)])
    # Output center c_out maps to input center: t satisfies
    # out_coord = in_coord * scale + t with half-pixel convention.
    t = jnp.stack(
        [
            (0.5 * oh) - (y + 0.5 * h) * scale[0],
            (0.5 * ow) - (x + 0.5 * w) * scale[1],
        ]
    )
    return jax.image.scale_and_translate(
        frame.astype(dtype),
        shape=(oh, ow),
        spatial_dims=(0, 1),
        scale=scale,
        translation=t,
        method="linear",
        antialias=False,
    )

"""StandardScaler semantics as pure JAX functions.

Parity targets: sklearn ``StandardScaler`` as used at reference
``train-v4.py:131`` and the hand-rolled ``ManualStandardScaler``
(``scripts/manual/scan-template-v2.py:53-72``): per-feature mean and
population std (ddof=0), with exact-zero stds replaced by 1.  Both
reference variants agree on this math; sklearn additionally computes
the mean in float64 even for float32 inputs, which we match by doing
the moment accumulation in the widest available dtype.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ScalerParams(NamedTuple):
    mean: jnp.ndarray  # (d,)
    scale: jnp.ndarray  # (d,) -- std with zero -> 1 guard


def scaler_fit(x: jnp.ndarray, dtype=None) -> ScalerParams:
    """Fit mean/scale over axis 0. ``x``: (n, d)."""
    dtype = dtype or x.dtype
    xw = x.astype(jnp.promote_types(dtype, jnp.float32))
    mean = jnp.mean(xw, axis=0)
    # Two-pass variance: stable in float32 (E[x^2]-E[x]^2 loses ~3 digits
    # at pixel scale) and exactly ddof=0 like sklearn/np.std.
    centered = xw - mean
    var = jnp.mean(centered * centered, axis=0)
    std = jnp.sqrt(var)
    scale = jnp.where(std == 0.0, 1.0, std)
    return ScalerParams(mean.astype(dtype), scale.astype(dtype))


def scaler_transform(x: jnp.ndarray, params: ScalerParams) -> jnp.ndarray:
    return (x - params.mean) / params.scale

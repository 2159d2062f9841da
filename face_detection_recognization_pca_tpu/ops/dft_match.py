"""Circular correlation as dense DFT matmuls (fixed small sizes).

For the guided-window geometry (N = 192, output 97x97) the bench showed
``jnp.fft`` consuming ~13 of the 13.4 ms fused step -- TPU FFT butterflies
are VPU-bound.  At these sizes the DFT is better spent on the MXU as
dense cos/sin matrix products:

    F   = D W D^T          (D = C - iS, real W -> 6 real matmuls)
    Y   = F . conj(Kf)     (elementwise complex, precomputed kernel DFT)
    out = Re(E Y E^T)/N^2  (E = C + iS, truncated to the valid 97 rows/
                            cols -> 6 more matmuls)

~90 GFLOP per 512-frame batch, all MXU -- measured ~5x faster than the
FFT path and numerically tighter (long-dot accumulation instead of
butterfly rounding).  General/odd sizes should keep using the rFFT path
in :mod:`.match`.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _dft_mats(n: int, out: int):
    k = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, k) / n
    c = np.cos(ang).astype(np.float32)
    s = np.sin(ang).astype(np.float32)
    return (
        jnp.asarray(c),
        jnp.asarray(s),
        jnp.asarray(c[:out]),
        jnp.asarray(s[:out]),
    )


def make_circular_correlator(
    kernel: np.ndarray, n: int, out: int
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build ``fn(W (B, n, n)) -> (B, out, out)`` computing the valid
    circular correlation of each slice with ``kernel`` (h, w <= n).

    Equivalent to ``irfft2(rfft2(W) * conj(rfft2(kernel, (n, n))))``
    truncated to ``out`` rows/cols; exact when ``kernel_side + out - 1
    <= n`` (alias-free), which the guided geometry satisfies.
    """
    kh, kw = kernel.shape
    if kh + out - 1 > n or kw + out - 1 > n:
        raise ValueError("alias-free condition violated: kernel + out > n")
    kpad = np.zeros((n, n), np.float64)
    kpad[:kh, :kw] = np.asarray(kernel, np.float64)
    kf = np.fft.fft2(kpad)
    kr = jnp.asarray(np.real(kf).astype(np.float32))
    ki = jnp.asarray(np.imag(kf).astype(np.float32))
    c, s, c_out, s_out = _dft_mats(n, out)
    inv_n2 = 1.0 / (n * n)

    def corr(w: jnp.ndarray) -> jnp.ndarray:
        w = w.astype(jnp.float32)
        # Forward: F = (C - iS) W (C - iS)^T.
        p = jnp.einsum("kn,bnm->bkm", c, w, preferred_element_type=jnp.float32)
        q = jnp.einsum("kn,bnm->bkm", s, w, preferred_element_type=jnp.float32)
        fr = (
            jnp.einsum("bkm,lm->bkl", p, c, preferred_element_type=jnp.float32)
            - jnp.einsum("bkm,lm->bkl", q, s, preferred_element_type=jnp.float32)
        )
        fi = -(
            jnp.einsum("bkm,lm->bkl", p, s, preferred_element_type=jnp.float32)
            + jnp.einsum("bkm,lm->bkl", q, c, preferred_element_type=jnp.float32)
        )
        # Multiply by conj(Kf):  (fr + i fi)(kr - i ki).
        yr = fr * kr + fi * ki
        yi = fi * kr - fr * ki
        # Inverse (truncated): Re((C + iS) Y (C + iS)^T) / n^2.
        lr = (
            jnp.einsum("kn,bnm->bkm", c_out, yr, preferred_element_type=jnp.float32)
            - jnp.einsum("kn,bnm->bkm", s_out, yi, preferred_element_type=jnp.float32)
        )
        li = (
            jnp.einsum("kn,bnm->bkm", c_out, yi, preferred_element_type=jnp.float32)
            + jnp.einsum("kn,bnm->bkm", s_out, yr, preferred_element_type=jnp.float32)
        )
        out_re = (
            jnp.einsum("bkm,lm->bkl", lr, c_out, preferred_element_type=jnp.float32)
            - jnp.einsum("bkm,lm->bkl", li, s_out, preferred_element_type=jnp.float32)
        )
        return out_re * inv_n2

    return corr

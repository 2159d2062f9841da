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
def _dft_mats_np(n: int, out: int):
    # Host arrays only -- caching jnp constants created under a trace
    # poisons the cache with tracers (see ops/resize.py).
    k = np.arange(n)
    ang = 2.0 * np.pi * np.outer(k, k) / n
    c = np.cos(ang).astype(np.float32)
    s = np.sin(ang).astype(np.float32)
    return c, s, np.ascontiguousarray(c[:out]), np.ascontiguousarray(s[:out])


def _dft_mats(n: int, out: int):
    c, s, co, so = _dft_mats_np(n, out)
    return jnp.asarray(c), jnp.asarray(s), jnp.asarray(co), jnp.asarray(so)


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


def dft_correlate_valid(
    frames: jnp.ndarray,  # (B, H, W) real
    kernels: jnp.ndarray,  # (T, th, tw) real, th <= H, tw <= W
    out_h: int,
    out_w: int,
) -> jnp.ndarray:
    """Valid 2-D cross-correlation of a frame batch with T kernels as
    dense MXU-DFT matmuls: ``(B, T, out_h, out_w)``.

    Circular correlation at the frame's own size is alias-free for all
    valid shifts (``out_h = H - th + 1`` rows never see wraparound), so
    no padding is needed.  This is the full-frame generalization of
    :func:`make_circular_correlator`: TPU ``jnp.fft`` butterflies are
    VPU-bound and measured ~100x slower than the equivalent dense
    cos/sin matmuls at 544p (the same finding that shaped the guided
    bench kernel -- see module docstring).  The kernel spectra are
    computed on device with the same matrices (they change per call:
    template banks are data, not constants).
    """
    f = frames.astype(jnp.float32)
    b, h, w = f.shape
    t, th, tw = kernels.shape
    assert out_h <= h - th + 1 and out_w <= w - tw + 1
    ch, sh, ch_o, sh_o = _dft_mats(h, out_h)
    cw, sw, cw_o, sw_o = _dft_mats(w, out_w)
    kpad = jnp.zeros((t, h, w), jnp.float32).at[:, :th, :tw].set(
        kernels.astype(jnp.float32)
    )

    def fwd(x):  # real (N, h, w) -> (Fr, Fi) under D = C - iS per axis
        p = jnp.einsum("kn,bnm->bkm", ch, x, preferred_element_type=jnp.float32)
        q = jnp.einsum("kn,bnm->bkm", sh, x, preferred_element_type=jnp.float32)
        fr = (
            jnp.einsum("bkm,lm->bkl", p, cw, preferred_element_type=jnp.float32)
            - jnp.einsum("bkm,lm->bkl", q, sw, preferred_element_type=jnp.float32)
        )
        fi = -(
            jnp.einsum("bkm,lm->bkl", p, sw, preferred_element_type=jnp.float32)
            + jnp.einsum("bkm,lm->bkl", q, cw, preferred_element_type=jnp.float32)
        )
        return fr, fi

    fr, fi = fwd(f)  # (B, h, w)
    kr, ki = fwd(kpad)  # (T, h, w)
    # Y = F . conj(K) over the (B, T) outer product.
    yr = fr[:, None] * kr[None] + fi[:, None] * ki[None]
    yi = fi[:, None] * kr[None] - fr[:, None] * ki[None]
    yr = yr.reshape(b * t, h, w)
    yi = yi.reshape(b * t, h, w)
    # Inverse truncated to the valid rows/cols: Re((C + iS) Y (C + iS)^T) / (h w).
    lr = (
        jnp.einsum("kn,bnm->bkm", ch_o, yr, preferred_element_type=jnp.float32)
        - jnp.einsum("kn,bnm->bkm", sh_o, yi, preferred_element_type=jnp.float32)
    )
    li = (
        jnp.einsum("kn,bnm->bkm", ch_o, yi, preferred_element_type=jnp.float32)
        + jnp.einsum("kn,bnm->bkm", sh_o, yr, preferred_element_type=jnp.float32)
    )
    out = (
        jnp.einsum("bkm,lm->bkl", lr, cw_o, preferred_element_type=jnp.float32)
        - jnp.einsum("bkm,lm->bkl", li, sw_o, preferred_element_type=jnp.float32)
    )
    return out.reshape(b, t, out_h, out_w) / (h * w)

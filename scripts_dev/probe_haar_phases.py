"""Probe: where does a big Haar pyramid chunk spend its time?

Builds three truncated variants of the chunk@5 program (the most
expensive: 5 step-1 levels, ~338k windows/frame) and times each:

  a) phase A only (resize + integrals + dense 10-stage prefilter + counts)
  b) a + top_k pool + index/nf takes (no patch gather, no tail matmul)
  c) the full production program (gather + tail matmul + pack)

c-b isolates the gather+matmul; b-a isolates the pool.  One client per
invocation; inputs varied per call so tunnel dedup can't fake timings.
"""

import sys
import time

import jax

from face_detection_recognization_pca_tpu.bench import cache_dir

jax.config.update("jax_compilation_cache_dir", cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402


def main(batch: int = 8, chunk_at: int = 5) -> None:
    import cv2

    from face_detection_recognization_pca_tpu.detect.haar import (
        HaarDetector,
        _grid_rect_sum,
        _make_phase_a_fn,
        _next_pow2,
        _pyramid_levels,
    )
    from face_detection_recognization_pca_tpu.io.video import VideoReader
    from face_detection_recognization_pca_tpu.ops.resize import resize_bilinear

    h, w = 544, 960
    det = HaarDetector()
    casc = det.cascade
    r = VideoReader("/root/reference/videos/test.mp4")
    fs = []
    for i, f in enumerate(r.frames()):
        if i >= batch:
            break
        g = cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
        fs.append(cv2.resize(g, (w, h)).astype(np.float32))
    r.close()
    frames = jnp.asarray(np.stack(fs))
    jax.block_until_ready(frames)

    wh, ww = casc.window_size
    side = max(wh, ww) + 1
    levels = _pyramid_levels(h, w, (wh, ww), 1.1, (30, 30), None)
    part = levels[chunk_at : chunk_at + det.pyramid_chunk]
    n_pool = sum(
        (((sh - wh) // st + 1) * ((sw - ww) // st + 1))
        for (_, sh, sw, st) in part
    )
    kb = min(det._k_pool_b, n_pool, max(256, _next_pow2(n_pool // 512)))
    print(f"chunk@{chunk_at}: n_pool={n_pool} kb={kb}", flush=True)

    phase_a = _make_phase_a_fn(casc, det._prefilter_stages)
    norm_area = (wh - 2) * (ww - 2)
    grid = []
    lvl_np, cy_np, cx_np = [], [], []
    for li, (_, sh, sw, step) in enumerate(part):
        ny = (sh - wh) // step + 1
        nx = (sw - ww) // step + 1
        grid.append((ny, nx, step))
        iy, ix = np.mgrid[0:ny, 0:nx]
        lvl_np.append(np.full(ny * nx, li, dtype=np.int32))
        cy_np.append((iy * step).reshape(-1).astype(np.int32))
        cx_np.append((ix * step).reshape(-1).astype(np.int32))
    lvl_all = jnp.asarray(np.concatenate(lvl_np))
    cy_all = jnp.asarray(np.concatenate(cy_np))
    cx_all = jnp.asarray(np.concatenate(cx_np))
    max_h = max(sh for (_, sh, _, _) in part)
    max_w = max(sw for (_, _, sw, _) in part)

    def _phase_a_level(img, sh, sw, step, ny, nx):
        scaled = (
            img
            if (sh, sw) == img.shape
            else resize_bilinear(img, (sw, sh), jnp.float32)
        )
        f = scaled.astype(jnp.float32)
        pad = [(1, 0), (1, 0)]
        integral = jnp.pad(jnp.cumsum(jnp.cumsum(f, axis=0), axis=1), pad)
        sqintegral = jnp.pad(
            jnp.cumsum(jnp.cumsum(f * f, axis=0), axis=1), pad
        )
        s1 = _grid_rect_sum(integral, 1, 1, ww - 2, wh - 2, ny, nx, step)
        s2 = _grid_rect_sum(sqintegral, 1, 1, ww - 2, wh - 2, ny, nx, step)
        nf2 = norm_area * s2 - s1 * s1
        nf = jnp.where(nf2 > 0, jnp.sqrt(jnp.maximum(nf2, 0.0)), 1.0)
        passed = phase_a(integral, nf, ny, nx, step)
        integral = jnp.pad(
            integral,
            (
                (0, max_h + 1 - integral.shape[0]),
                (0, max_w + 1 - integral.shape[1]),
            ),
        )
        return passed.reshape(-1), nf.reshape(-1), integral

    def _phase_a_all(img):
        pass_l, nf_l, int_l = [], [], []
        for li, (_, sh, sw, step) in enumerate(part):
            ny, nx, _ = grid[li]
            p, nf, integ = _phase_a_level(img, sh, sw, step, ny, nx)
            pass_l.append(p)
            nf_l.append(nf)
            int_l.append(integ)
        return (
            jnp.concatenate(pass_l),
            jnp.concatenate(nf_l),
            jnp.stack(int_l),
        )

    @jax.jit
    def variant_a(imgs):
        passed, nf_all, integrals = jax.vmap(_phase_a_all)(imgs)
        # Reduce everything so nothing dead-codes; integrals reduced to
        # one scalar per frame (cheap vs materializing them).
        return (
            jnp.sum(passed, axis=1),
            jnp.sum(nf_all, axis=1),
            jnp.sum(integrals[:, :, -1, -1], axis=1),
        )

    @jax.jit
    def variant_b(imgs):
        passed, nf_all, integrals = jax.vmap(_phase_a_all)(imgs)
        count_a = jnp.sum(passed, axis=1)
        _, cand = lax.top_k(passed.astype(jnp.float32), kb)
        ok_a = jnp.take_along_axis(passed, cand, axis=1)
        lvl_c = jnp.take(lvl_all, cand)
        cy_c = jnp.take(cy_all, cand)
        cx_c = jnp.take(cx_all, cand)
        nf_c = jnp.take_along_axis(nf_all, cand, axis=1)
        return (
            count_a,
            jnp.sum(ok_a, axis=1),
            jnp.sum(lvl_c + cy_c + cx_c, axis=1),
            jnp.sum(nf_c, axis=1),
            jnp.sum(integrals[:, :, -1, -1], axis=1),
        )

    fn_one, fn_full = det._get_pyramid_fn(tuple(part), kb, kb)

    def timeit(name, fn):
        t0 = time.perf_counter()
        out = fn(frames)
        jax.block_until_ready(out)
        warm = time.perf_counter() - t0
        dt = float("inf")
        for i in range(5):
            t0 = time.perf_counter()
            out = fn(frames + 1e-3 * (i + 1))
            jax.block_until_ready(out)
            dt = min(dt, time.perf_counter() - t0)
        print(f"{name}: warm={warm:.1f}s best={dt*1e3:.1f}ms", flush=True)
        return dt

    ta = timeit("a (phase A dense only)", variant_a)
    tb = timeit("b (A + top_k pool)", variant_b)
    tc = timeit("c (full chunk program)", fn_full)
    print(
        f"pool cost (b-a): {(tb-ta)*1e3:.1f}ms; "
        f"gather+matmul (c-b): {(tc-tb)*1e3:.1f}ms",
        flush=True,
    )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 8,
        int(sys.argv[2]) if len(sys.argv) > 2 else 5,
    )

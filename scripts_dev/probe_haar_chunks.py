"""Probe: per-chunk device cost of the fused Haar pyramid at B=8.

Times each 5-level chunk program separately (chained calls, varied
input) to locate the dominant chunk, plus the pack program. One client
per invocation.
"""

import time

import jax

from face_detection_recognization_pca_tpu.bench import cache_dir

jax.config.update("jax_compilation_cache_dir", cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(batch: int = 8) -> None:
    import cv2

    from face_detection_recognization_pca_tpu.detect.haar import (
        HaarDetector,
        _pyramid_levels,
        _next_pow2,
    )
    from face_detection_recognization_pca_tpu.io.video import VideoReader

    h, w = 544, 960
    det = HaarDetector()
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

    wh, ww = det.cascade.window_size
    levels = _pyramid_levels(h, w, (wh, ww), 1.1, (30, 30), None)
    chunk = det.pyramid_chunk
    total = 0.0
    for c0 in range(0, len(levels), chunk):
        part = levels[c0 : c0 + chunk]
        n_pool = sum(
            (((sh - wh) // st + 1) * ((sw - ww) // st + 1))
            for (_, sh, sw, st) in part
        )
        cap = -(-n_pool // det._pool_group)
        ka = min(det._k_pool_a, cap, max(256, _next_pow2(n_pool // 1024)))
        kb = min(det._k_pool_b, ka * det._pool_group,
                 max(256, _next_pow2(n_pool // 512)))
        fn_one, fn_batch = det._get_pyramid_fn(tuple(part), ka, kb)
        t0 = time.perf_counter()
        out = fn_batch(frames)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        dt = float("inf")
        for i in range(5):
            t0 = time.perf_counter()
            out = fn_batch(frames + 1e-3 * (i + 1))
            jax.block_until_ready(out)
            dt = min(dt, time.perf_counter() - t0)
        total += dt
        print(
            f"chunk@{c0} levels={[(round(f_,2), sh, sw, st) for (f_, sh, sw, st) in part]} "
            f"n_pool={n_pool} kb={kb} warm={compile_s:.1f}s best={dt*1e3:.1f}ms",
            flush=True,
        )
    print(f"sum of chunk bests: {total*1e3:.1f} ms for B={batch} "
          f"({batch/total:.1f} fps if chunk-bound)", flush=True)


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)

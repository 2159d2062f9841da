"""Probe: device-compute vs packed-download vs host-finish split of the
production Haar path at the bench shape (16-frame caller batch, B=8
device sub-batches, 544p test.mp4 frames).

bench_haar r4 measured 41 fps against r3's 65 fps with identical
programs (warm cache); the suspect is tunnel throughput on the ONE
packed download per sub-batch, not device compute.  This prints the
split so regressions can be attributed:

  device_s : detect_device dispatch + block_until_ready(packed_d)
  dl_s     : np.asarray on the ready packed array (pure transfer)
  finish_s : detect_finish host work on pre-downloaded bytes (approx:
             full finish minus dl)

Run: python scripts_dev/probe_haar_breakdown.py [batch=16] [iters=3]
"""

import sys
import time

import jax

from face_detection_recognization_pca_tpu.bench import cache_dir

jax.config.update("jax_compilation_cache_dir", cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(batch: int = 16, iters: int = 3) -> None:
    import cv2

    from face_detection_recognization_pca_tpu.detect.haar import HaarDetector
    from face_detection_recognization_pca_tpu.io.video import VideoReader

    det = HaarDetector()
    r = VideoReader("/root/reference/videos/test.mp4")
    fs = []
    for i, f in enumerate(r.frames()):
        if i >= batch:
            break
        g = cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
        fs.append(cv2.resize(g, (960, 544)).astype(np.float32))
    r.close()
    frames = jnp.asarray(np.stack(fs))
    jax.block_until_ready(frames)

    det.detect_multi_scale_batch(frames)  # warm / learn cap floors

    for it in range(iters):
        fr = frames + np.float32(1e-3 * (it + 1))
        t0 = time.perf_counter()
        handle = det.detect_device(fr)
        subs = handle["sub"] if "sub" in handle else [(handle, batch)]
        for sub, _ in subs:
            jax.block_until_ready(sub["packed_d"])
        t1 = time.perf_counter()
        arrs = [np.asarray(sub["packed_d"]) for sub, _ in subs]
        t2 = time.perf_counter()
        out = det.detect_finish(handle)
        t3 = time.perf_counter()
        n_bytes = sum(a.nbytes for a in arrs)
        print(
            f"iter{it}: device={t1 - t0:.3f}s dl={t2 - t1:.3f}s "
            f"(packed {n_bytes / 1e6:.2f} MB, {n_bytes / max(t2 - t1, 1e-9) / 1e6:.1f} MB/s) "
            f"finish={t3 - t2:.3f}s total={t3 - t0:.3f}s "
            f"-> {batch / (t3 - t0):.1f} fps, detected={sum(1 for d in out if d)}",
            flush=True,
        )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 16,
        int(sys.argv[2]) if len(sys.argv) > 2 else 3,
    )

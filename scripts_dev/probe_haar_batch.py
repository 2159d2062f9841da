"""Probe: Haar detectMultiScale throughput vs frame-batch size.

Runs ONE batch size per process invocation (two live clients degrade
each other on the remote chip): ``python probe_haar_batch.py <B>``.
Real test.mp4 pixels, same as bench_haar; blocking + pipelined (depth 6)
timings, input varied per call so tunnel repeat-call dedup can't fake
results.
"""

import sys
import time

import jax

from face_detection_recognization_pca_tpu.bench import cache_dir

jax.config.update("jax_compilation_cache_dir", cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(batch: int, chunk: int = 5) -> None:
    import cv2

    from face_detection_recognization_pca_tpu.detect.haar import HaarDetector
    from face_detection_recognization_pca_tpu.io.video import VideoReader

    h, w = 544, 960
    det = HaarDetector(pyramid_chunk=chunk)
    r = VideoReader("/root/reference/videos/test.mp4")
    fs = []
    for i, f in enumerate(r.frames()):
        if i >= batch:
            break
        g = cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
        fs.append(cv2.resize(g, (w, h)).astype(np.float32))
    r.close()
    while len(fs) < batch:  # wrap if video shorter than batch
        fs.append(fs[len(fs) % 184])
    frames = jnp.asarray(np.stack(fs))
    jax.block_until_ready(frames)

    t0 = time.perf_counter()
    out = det.detect_multi_scale_batch(frames)  # compile
    print(f"B={batch} first-call (compile) {time.perf_counter()-t0:.1f}s "
          f"dispatches={det.last_dispatches} detected={sum(1 for d in out if d)}",
          flush=True)

    dt = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        det.detect_multi_scale_batch(frames + 1e-3 * (i + 1))
        dt = min(dt, time.perf_counter() - t0)
    print(f"B={batch} blocking {batch/dt:.1f} fps ({dt*1e3/batch:.2f} ms/frame)",
          flush=True)

    depth = 6
    t0 = time.perf_counter()
    handles = [det.detect_device(frames + 1e-2)]
    for i in range(1, depth):
        handles.append(det.detect_device(frames + 1e-2 * (i + 1)))
        det.detect_finish(handles[i - 1])
    det.detect_finish(handles[-1])
    dt_pipe = (time.perf_counter() - t0) / depth
    print(f"B={batch} pipelined {batch/dt_pipe:.1f} fps "
          f"({dt_pipe*1e3/batch:.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 16,
        int(sys.argv[2]) if len(sys.argv) > 2 else 5,
    )

"""Minimal repro: the level-4 Haar chunk program faults at device B=16.

docs/DESIGN.md section 11 ("Level-4 B=16 execute fault"): on the remote
v5e runtime, the fused pyramid chunk containing the (279, 493, stride-2)
level executes fine at batch 8 and on zero frames at batch 16, but
faults the device worker at batch 16 on REAL video frames.  The program
is oracle-exact on CPU at every batch size, and bisects ruled out the
indexing/gather suspects (tile-aligned pads, fully-dense one-hot
gathers, shallower prefilter) — so `HaarDetector` caps
`max_device_batch` at 8.  This script is the evidence artifact a
runtime owner can act on: it builds EXACTLY the production chunk
program (same `_chunk_caps` sizing path as `detect_device`), saves its
HLO before executing, runs the safe cases first, then the faulting one.

Usage (run with NOTHING else on the chip; the fault wedges the remote
worker for ~10 minutes):

    python scripts_dev/repro_haar_b16_fault.py [B=16] [hlo_out_dir=/tmp]

Expected output on the affected runtime (recorded in DESIGN section 11):
ZEROS-OK and B=8-OK lines, then `FAULT at B=16: <XlaRuntimeError ...>`.
On a fixed runtime every line reads OK — then delete the
`max_device_batch` cap in detect/haar.py and re-measure bench_haar.
"""

import gzip
import os
import sys
import time

import jax

from face_detection_recognization_pca_tpu.bench import cache_dir

jax.config.update("jax_compilation_cache_dir", cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(batch: int = 16, hlo_dir: str = "/tmp") -> int:
    import cv2

    from face_detection_recognization_pca_tpu.detect.haar import (
        HaarDetector,
        _pyramid_levels,
    )
    from face_detection_recognization_pca_tpu.io.video import VideoReader

    dev = jax.devices()[0]
    print(f"jax {jax.__version__}, device {dev!r}, "
          f"platform {dev.platform}/{getattr(dev, 'device_kind', '?')}",
          flush=True)
    try:
        print("platform_version:", dev.client.platform_version, flush=True)
    except Exception:
        pass

    h, w = 544, 960
    det = HaarDetector()  # production defaults (pyramid_chunk=2 on TPU)
    wh, ww = det.cascade.window_size
    levels = _pyramid_levels(h, w, (wh, ww), 1.1, (30, 30), None)
    chunk = max(1, det.pyramid_chunk)
    part = None
    for c0 in range(0, len(levels), chunk):
        p = levels[c0 : c0 + chunk]
        if any((sh, sw, st) == (279, 493, 2) for (_, sh, sw, st) in p):
            part = p
            break
    if part is None:  # level table changed: fall back to the last chunk
        part = levels[(len(levels) - 1) // chunk * chunk :]
    print("chunk levels:", [(sh, sw, st) for (_, sh, sw, st) in part],
          flush=True)

    cap, ka, kb = det._chunk_caps(part)
    print(f"pool sizing: cap={cap} ka={ka} kb={kb}", flush=True)
    _, fn_batch = det._get_pyramid_fn(part, ka, kb)

    # Real frames: same source as bench_haar (pure noise has
    # pathological survivor counts; the fault needs real footage).
    r = VideoReader("/root/reference/videos/test.mp4")
    fs = []
    for i, f in enumerate(r.frames()):
        if i >= batch:
            break
        g = cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
        fs.append(cv2.resize(g, (w, h)).astype(np.float32))
    r.close()
    while len(fs) < batch:
        fs.append(fs[len(fs) % max(len(fs), 1)])
    frames = np.stack(fs)

    # Save the program BEFORE executing it (the fault kills the worker).
    lowered = fn_batch.lower(jnp.zeros((batch, h, w), jnp.float32))
    hlo_path = os.path.join(hlo_dir, f"repro_haar_b16_fault_B{batch}.hlo.gz")
    with gzip.open(hlo_path, "wt") as fo:
        fo.write(lowered.as_text())
    compiled = lowered.compile()
    print("HLO saved:", hlo_path, flush=True)
    try:
        mem = compiled.memory_analysis()
        print(f"memory_analysis: temp={mem.temp_size_in_bytes/2**30:.2f} GiB "
              f"output={mem.output_size_in_bytes/2**20:.1f} MiB "
              f"args={mem.argument_size_in_bytes/2**20:.1f} MiB", flush=True)
    except Exception as e:
        print("memory_analysis unavailable:", e, flush=True)

    def run(tag, fn, x):
        t0 = time.perf_counter()
        out = fn(jnp.asarray(x))
        jax.block_until_ready(out)
        print(f"{tag}-OK count_a={np.asarray(out[4]).max()} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)

    # Safe cases first; any fault here is NEW evidence (report + stop,
    # the worker is wedged from that point on).
    try:
        # The production B=8 program on real frames (what the shipped
        # max_device_batch=8 path runs; same jitted fn, (8,h,w) shape).
        run("REAL-B=8-prog", fn_batch, frames[:8])
        # Zeros through the B-sized program: shape alone doesn't fault.
        run(f"ZEROS-B={batch}", fn_batch, np.zeros((batch, h, w), np.float32))
        if batch > 8:
            # 8 real + rest zero through the SAME B-sized program:
            # isolates batch-content interaction from program shape.
            half = np.concatenate(
                [frames[:8], np.zeros((batch - 8, h, w), np.float32)]
            )
            run(f"REAL-8of{batch}", fn_batch, half)
    except Exception as e:
        print(f"FAULT-EARLY: {type(e).__name__}: {str(e)[:500]}", flush=True)
        print("A supposedly-safe case faulted — new runtime behavior; "
              "record this output in DESIGN section 11.", flush=True)
        return 2

    # The faulting case last: all-real frames at B.
    try:
        run(f"REAL-B={batch}", fn_batch, frames)
        print("NO FAULT: runtime fixed? Re-measure with the "
              "max_device_batch cap removed (detect/haar.py).", flush=True)
        return 0
    except Exception as e:
        print(f"FAULT at B={batch}: {type(e).__name__}: {str(e)[:500]}",
              flush=True)
        print("Worker is now wedged ~10 min (bench._wait_for_worker "
              "drains it).", flush=True)
        return 1


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    d = sys.argv[2] if len(sys.argv) > 2 else "/tmp"
    sys.exit(main(b, d))

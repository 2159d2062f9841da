"""Probe: headline fused guided detect+recognize fps vs stream count.

Runs ONE stream count per process invocation (two live clients degrade
each other on the remote chip): ``python probe_headline_scale.py <S>``.
Same path as bench_headline; HBM footprint is streams x 32 frames x
1080p f32 (~0.26 GB per 1024-frame dispatch at S=4... ~8.5 GB at S=32),
so large S can regress via allocator pressure before dispatch
amortization wins.

Measured on v5e this round: S=16 -> 128.1k fps, S=24 -> 139.4k,
S=32 -> 132.5k; bench.py defaults to 24.
"""

import json
import sys

import jax

from face_detection_recognization_pca_tpu.bench import bench_headline, cache_dir

jax.config.update("jax_compilation_cache_dir", cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


if __name__ == "__main__":
    streams = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    out = bench_headline(streams=streams)
    print(json.dumps(out), flush=True)

#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line.

Metric: recognized 1080p frames/sec/chip for the fused multi-stream
guided detect+recognize step (BASELINE.json config 5), vs the 5,000
fps/chip north-star (BASELINE.md).  Runs on whatever jax.devices()[0]
is -- the real TPU chip under the driver.
"""

import json
import sys


def main() -> int:
    # Persistent compile cache: the Haar pyramid chunk programs are
    # large; caching them makes every bench run after the first cheap.
    import jax

    from face_detection_recognization_pca_tpu.bench import cache_dir, run_bench

    jax.config.update("jax_compilation_cache_dir", cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    # streams=24 measured best on v5e: 139.4k fps vs 128.1k at 16 and
    # 132.5k at 32 (scripts_dev/probe_headline_scale.py, this round).
    streams = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    out = run_bench(streams=streams)
    detail = out.pop("detail", None)
    if detail:
        print(json.dumps({"detail": detail}), file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

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
    from face_detection_recognization_pca_tpu.bench import run_bench

    streams = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    out = run_bench(streams=streams)
    detail = out.pop("detail", None)
    if detail:
        print(json.dumps({"detail": detail}), file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

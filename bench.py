#!/usr/bin/env python
"""Driver benchmark entry: prints the metric JSON line on stdout.

Metric: recognized 1080p frames/sec/chip for the fused multi-stream
guided detect+recognize step (BASELINE.json config 5), vs the 5,000
fps/chip north-star (BASELINE.md).  Runs on whatever jax.devices()[0]
is -- the real TPU chip under the driver.

Deadline-proofing (VERDICT r3: the round-3 driver bench was killed at
rc=124 with EMPTY output, losing every number of the round):

- run_bench enforces an internal wall-clock deadline
  (FDRP_BENCH_DEADLINE_S, default 2700 s) and reports whatever phases
  fit; the headline phase runs first.
- The headline line is printed to stdout the moment it exists, so even
  an external kill mid-extras leaves a parseable line in the output.
  The final (enriched) line is printed last and wins a last-line parse.
- SIGTERM (what `timeout` sends) and a SIGALRM backstop both kill the
  active child subprocess, print the best-known line, and exit 0.
"""

import json
import os
import signal
import sys


def main() -> int:
    # Persistent compile cache: the Haar pyramid chunk programs are
    # large; caching them makes every bench run after the first cheap.
    import jax

    from face_detection_recognization_pca_tpu.bench import (
        cache_dir,
        kill_active_child,
        run_bench,
    )

    jax.config.update("jax_compilation_cache_dir", cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    # streams=24 measured best on v5e: 139.4k fps vs 128.1k at 16 and
    # 132.5k at 32 (scripts_dev/probe_headline_scale.py, round 2).
    streams = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    # Default 2250 s: rounds 3 and 4 both drew rc=124 from the external
    # driver `timeout` with 2700 s, so the real budget is <= 2700; this
    # leaves ~450 s of margin for the exit path (VERDICT r4 next #1).
    deadline_s = float(os.environ.get("FDRP_BENCH_DEADLINE_S", "2250"))

    best = {
        "metric": "recognized 1080p frames/sec/chip "
                  f"(fused guided detect+project+match, {streams} streams)",
        "value": 0.0,
        "unit": "frames/s/chip",
        "vs_baseline": 0.0,
    }
    best_detail: dict = {}
    printed_early = [False]

    def on_update(snap: dict) -> None:
        best_detail.update(snap.pop("detail", {}))
        best.update(snap)
        if best["value"] > 0 and not printed_early[0]:
            # Surface the headline the moment it exists: if anything
            # later hangs or the driver kills us, this line is already
            # in the captured output.
            print(json.dumps(best), flush=True)
            printed_early[0] = True

    def finale() -> None:
        if best_detail:
            print(json.dumps({"detail": best_detail}), file=sys.stderr,
                  flush=True)
        print(json.dumps(best), flush=True)

    def bail(signum, frame) -> None:
        kill_active_child()
        finale()
        os._exit(0)

    signal.signal(signal.SIGTERM, bail)
    signal.signal(signal.SIGALRM, bail)
    # Last-resort backstop just past the internal deadline: if the
    # budgeting logic itself ever wedges, print what we have and leave 0.
    signal.alarm(int(deadline_s) + 60)

    out = run_bench(streams=streams, deadline_s=deadline_s,
                    on_update=on_update)
    signal.alarm(0)
    best_detail.update(out.pop("detail", {}))
    best.update(out)
    finale()
    return 0


if __name__ == "__main__":
    sys.exit(main())

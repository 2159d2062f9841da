"""Probe: tile-pair patch gather vs the shipped row-block gather.

The production Haar phase-B gather (`ops/pallas_kernels.gather_patches`)
does one ``vmap(dynamic_slice)`` of (1, side, W) row blocks -- each
candidate-indexed dynamic slice lowers to one iteration of a sequential
Mosaic ``while`` loop at ~1-3 us regardless of slice size -- then picks
the column window with an exact one-hot matmul.

This probe implements the ZERO-data-dependent-memory-op alternative
sketched in docs/NEXT.md: pre-slice the (L, H, W) integral stack into
overlapping (2*side, W) y-tile pairs at stride `side` (a static
reshape, no gathers), then select per candidate with THREE exact
one-hot matmuls:

  1. tile select:  (K, L*T) one-hot  @ (L*T, 2*side*W) tile stack
  2. row  select:  (K, side, 2*side) one-hot  batched against tiles
  3. col  select:  (K, W, side) one-hot  (same as the shipped form)

Any window [cy, cy+side) lies inside tile t = cy // side because the
in-tile offset r = cy % side satisfies r + side <= 2*side.  Every
matmul multiplies by exactly 1.0 or 0.0 at HIGHEST precision, so the
result is bit-exact vs the direct slice on every backend.

Costs at the production 544p chunk shape (L=5, H<=545, W<=961,
side=25, K=512, B=8): one-hot FLOPs ~7 GF/frame (~0.2 ms of v5e f32
MXU) + a 20 MB/frame static tile stack -- vs 4.7 ms measured for the
row-block form's 2x512 sequential Mosaic loop iterations per frame
(see gather_patches docstring).  The earlier fully-dense variant was
rejected for its (K*side, L*H) ~200 MB one-hot; the tile pair splits
that into (K, L*T) + (K, side, 2*side), both tiny.

Run CPU-exact check:   JAX_PLATFORM_NAME=cpu python scripts_dev/probe_gather_tilepair.py
Time on the real chip: python scripts_dev/probe_gather_tilepair.py

CAUTION (docs/NEXT.md): integrating this into gather_patches changes
every Haar chunk program's HLO -> full persistent-cache re-warm
(~25 min through the tunnel) before any driver bench.
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

from face_detection_recognization_pca_tpu.ops.pallas_kernels import (  # noqa: E402
    _gather_patches_rowblock,
    gather_patches_tilepair,
)


def main(batch: int = 8, k: int = 512) -> None:
    # Production 544p chunk@5 envelope: 5 levels padded to the largest.
    ll, h, w, side = 5, 545, 961, 25
    rng = np.random.default_rng(0)
    integrals = rng.standard_normal((batch, ll, h, w)).astype(np.float32)
    lvl = rng.integers(0, ll, (batch, k)).astype(np.int32)
    cy = rng.integers(0, h - side + 1, (batch, k)).astype(np.int32)
    cx = rng.integers(0, w - side + 1, (batch, k)).astype(np.int32)

    def batched(fn):
        return jax.jit(
            jax.vmap(lambda ig, l_, y_, x_: fn(ig, l_, y_, x_, side))
        )

    f_row = batched(_gather_patches_rowblock)
    f_tile = batched(gather_patches_tilepair)

    args = tuple(jnp.asarray(a) for a in (integrals, lvl, cy, cx))
    jax.block_until_ready(args)

    # Exactness: both forms vs direct NumPy slices.
    out_tile = np.asarray(f_tile(*args))
    out_row = np.asarray(f_row(*args))
    ref = np.stack(
        [
            np.stack(
                [
                    integrals[b, lvl[b, i], cy[b, i] : cy[b, i] + side,
                              cx[b, i] : cx[b, i] + side]
                    for i in range(k)
                ]
            )
            for b in range(batch)
        ]
    )
    assert np.array_equal(out_row, ref), "row-block form not exact?!"
    assert np.array_equal(out_tile, ref), "tile-pair form NOT exact"
    print(f"exact: both forms bit-equal on B={batch} K={k} "
          f"(L={ll},H={h},W={w},side={side})", flush=True)

    def timeit(name, fn, iters=20):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        warm = time.perf_counter() - t0
        # Chained dependent calls: each input depends on the previous
        # output, so repeat-call dedup can't fake timings and the
        # per-call tunnel dispatch latency amortizes (same convention
        # as the 4.7 ms row-block number in the gather_patches
        # docstring / scripts_dev/probe_haar_phases.py).
        best = float("inf")
        for _ in range(3):
            a0 = args[0]
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(a0, *args[1:])
                # (B,1,1,1) so it broadcasts over the (B,L,H,W) integrals
                # for any B (ADVICE r3: (B,1,1) fails when B != L).
                a0 = args[0] + out[:, :1, :1, :1] * np.float32(1e-6)
            jax.block_until_ready(a0)
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"{name}: warm={warm:.1f}s best={best*1e3:.2f}ms/call "
              f"(chained x{iters})", flush=True)
        return best

    tr = timeit("row-block (shipped)", f_row)
    tt = timeit("tile-pair (probe)  ", f_tile)
    print(f"tile-pair speedup vs row-block: {tr/tt:.2f}x", flush=True)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 8,
        int(sys.argv[2]) if len(sys.argv) > 2 else 512,
    )

"""Pallas TPU kernels: the fused projection-and-match hot path.

**Algebraic fusion.**  Every step of the recognition preprocess is
linear: bilinear resize (two interpolation matmuls), flatten,
standardize (affine), eigenspace projection (matmul).  Their
composition therefore collapses into a single affine map

    feats = crop_flat @ M + bias
    M[h*cw + w, k] = sum_{y,x} Wy[y,h] * WxT[w,x] * sinv[yx] * C[k, yx]
    bias[k]        = -(smean * sinv + pmean) @ C[k]

precomputed once per (model, crop shape) on host.  The per-crop work
becomes ONE (B, ch*cw) x (ch*cw, k) matmul -- ideal MXU shape -- instead
of per-crop resize loops; numerically identical to the float chain.

The Pallas kernel then fuses the remaining pipeline in VMEM:
K-tiled matmul accumulation, bias, L2 normalization, gallery cosine
``(B, k) @ (k, N)``, and first-occurrence argmax -- one HBM read per
crop tile, one (ids, conf) write, no intermediate feature round-trip.

``linearized_params``/``recognize_linearized`` expose the same math as
a plain XLA path (used as fallback and for correctness diffing).

**Status / measured**: on TPU v5e the plain-XLA paths win for the
reference's shapes (k<=128, N<=2048): XLA fuses this chain into two
MXU matmuls at ~150k crops/s, while this kernel's skinny k dimension
leaves the MXU underfilled.  The production recognizers therefore
default to the XLA paths; the kernel is kept correct (interpret-mode
tests) as the basis for future large-gallery variants where the
(k, N) tile no longer fits XLA's fusion (N >= 1e5 sharded galleries).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class LinearizedModel(NamedTuple):
    """Preprocess+project collapsed to ``crops_flat @ m + bias``."""

    m: jnp.ndarray  # (ch * cw, k)
    bias: jnp.ndarray  # (k,)
    gallery_t: jnp.ndarray  # (k, N)
    gallery_norm: jnp.ndarray  # (N,)
    labels: jnp.ndarray  # (N,)
    crop_shape: Tuple[int, int]


def linearize_model(model, crop_shape: Tuple[int, int]) -> LinearizedModel:
    """Fold resize/scaler/projection of an EigenfacesModel into (M, bias).

    ``crop_shape``: static (ch, cw) of incoming grayscale crops.
    """
    from face_detection_recognization_pca_tpu.ops.resize import (
        _interp_matrix,
    )

    fh, fw = model.face_shape
    ch, cw = crop_shape
    wy = np.asarray(_interp_matrix(ch, fh, np.float32))  # (fh, ch)
    wx = np.asarray(_interp_matrix(cw, fw, np.float32))  # (fw, cw)
    comps = np.asarray(model.components, np.float32)  # (k, d)
    k = comps.shape[0]
    c = comps.reshape(k, fh, fw)
    sinv = (
        1.0 / np.asarray(model.scaler_scale, np.float32)
        if model.scaler_scale is not None
        else np.ones(fh * fw, np.float32)
    ).reshape(fh, fw)
    smean = (
        np.asarray(model.scaler_mean, np.float32)
        if model.scaler_mean is not None
        else np.zeros(fh * fw, np.float32)
    )
    pmean = np.asarray(model.projection_mean, np.float32)

    c2 = c * sinv[None]  # (k, fh, fw)
    # M[h, w, k] = sum_{y,x} Wy[y,h] WxT[w,x] c2[k,y,x]
    m = np.einsum("yh,kyx,xw->hwk", wy, c2, wx, optimize=True)
    m = m.reshape(ch * cw, k).astype(np.float32)
    sflat = smean * sinv.reshape(-1)
    bias = -(sflat + pmean) @ comps.T  # (k,)

    gallery = np.asarray(model.gallery, np.float32)
    return LinearizedModel(
        m=jnp.asarray(m),
        bias=jnp.asarray(bias.astype(np.float32)),
        gallery_t=jnp.asarray(gallery.T),
        gallery_norm=jnp.asarray(np.linalg.norm(gallery, axis=1)),
        labels=jnp.asarray(np.asarray(model.labels), jnp.int32),
        crop_shape=(ch, cw),
    )


def recognize_linearized(
    lin: LinearizedModel, crops: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plain-XLA fused path over the linearized model (fallback/oracle)."""
    b = crops.shape[0]
    flat = crops.reshape(b, -1).astype(jnp.float32)
    feats = jnp.dot(flat, lin.m, preferred_element_type=jnp.float32) + lin.bias
    dots = jnp.dot(feats, lin.gallery_t, preferred_element_type=jnp.float32)
    fn = jnp.linalg.norm(feats, axis=1, keepdims=True)
    denom = fn * lin.gallery_norm[None, :]
    safe = denom > 0
    cos = jnp.where(safe, dots / jnp.where(safe, denom, 1.0), 0.0)
    return jnp.argmax(cos, axis=1).astype(jnp.int32), jnp.max(cos, axis=1)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _match_kernel(
    crops_ref,  # (TB, DK) block of flattened crops
    m_ref,  # (DK, k) block of the fused matrix
    bias_ref,  # (1, k)
    gallery_t_ref,  # (k, N)
    gnorm_ref,  # (1, N)
    mask_ref,  # (1, N) additive mask: 0 valid, -inf padded rows
    ids_ref,  # (TB, 1) i32
    conf_ref,  # (TB, 1) f32
    acc_ref,  # scratch (TB, k) f32
):
    kstep = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kstep == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        crops_ref[:], m_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(kstep == nk - 1)
    def _():
        feats = acc_ref[:] + bias_ref[0][None, :]
        dots = jnp.dot(
            feats, gallery_t_ref[:], preferred_element_type=jnp.float32
        )
        fnorm = jnp.sqrt(jnp.sum(feats * feats, axis=1, keepdims=True))
        denom = fnorm * gnorm_ref[0][None, :]
        safe = denom > 0.0
        cos = jnp.where(safe, dots / jnp.where(safe, denom, 1.0), 0.0)
        cos = cos + mask_ref[0][None, :]
        ids_ref[:, 0] = jnp.argmax(cos, axis=1).astype(jnp.int32)
        conf_ref[:, 0] = jnp.max(cos, axis=1)


@functools.partial(
    jax.jit, static_argnames=("tile_b", "tile_d", "interpret")
)
def fused_match_pallas(
    crops_flat: jnp.ndarray,  # (B, D)
    m: jnp.ndarray,  # (D, k)
    bias: jnp.ndarray,  # (k,)
    gallery_t: jnp.ndarray,  # (k, N)
    gallery_norm: jnp.ndarray,  # (N,)
    gallery_mask: Optional[jnp.ndarray] = None,  # (N,) additive, 0=valid
    tile_b: int = 128,
    tile_d: int = 2048,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K-tiled fused matmul -> cosine -> argmax kernel.

    ``B % tile_b == 0`` and ``D % tile_d == 0`` (pad crops with zeros and
    M with zero rows -- zero rows contribute nothing).
    """
    b, dd = crops_flat.shape
    k = m.shape[1]
    n = gallery_t.shape[1]
    assert b % tile_b == 0 and dd % tile_d == 0
    if gallery_mask is None:
        gallery_mask = jnp.zeros((n,), jnp.float32)

    grid = (b // tile_b, dd // tile_d)
    ids, conf = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_b, tile_d), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_d, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tile_b, k), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * dd * k + 2 * b * k * n,
            bytes_accessed=4 * (b * dd + dd * k + k * n),
            transcendentals=0,
        ),
    )(
        crops_flat.astype(jnp.float32),
        m.astype(jnp.float32),
        bias.reshape(1, -1).astype(jnp.float32),
        gallery_t.astype(jnp.float32),
        gallery_norm.reshape(1, -1).astype(jnp.float32),
        gallery_mask.reshape(1, -1).astype(jnp.float32),
    )
    return ids[:, 0], conf[:, 0]


# ---------------------------------------------------------------------------
# Large-gallery streaming kernel
# ---------------------------------------------------------------------------


def _gallery_match_kernel(
    feats_ref,  # (TB, k) crop features (already projected)
    frinv_ref,  # (TB, 1) f32 reciprocal feature norms (0 if norm 0)
    gallery_t_ref,  # (k, TN) one gallery tile
    grinv_ref,  # (1, TN) f32 reciprocal row norms (0 for zero-norm rows)
    gmask_ref,  # (1, TN) f32 additive mask: 0 valid, -inf sentinel rows
    best_ref,  # (TB, 1) f32 out: running best cosine
    idx_ref,  # (TB, 1) i32 out: running argmax row
):
    j = pl.program_id(1)
    tn = gallery_t_ref.shape[1]

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, -jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    dots = jnp.dot(
        feats_ref[:], gallery_t_ref[:], preferred_element_type=jnp.float32
    )
    # Normalization as two reciprocal MULTIPLIES (precomputed outside):
    # zero-norm features or rows get reciprocal 0 -> cosine 0, exactly
    # like ops.similarity.cosine_gallery; sentinel (invalid) rows carry
    # an additive -inf mask and can never win.
    cos = dots * frinv_ref[:] * grinv_ref[0][None, :] + gmask_ref[0][None, :]
    local_best = jnp.max(cos, axis=1)
    local_idx = jnp.argmax(cos, axis=1).astype(jnp.int32) + j * tn
    # Strict > keeps the FIRST maximum across tiles -- row-major
    # first-occurrence tie-breaking, same as the reference's argmax.
    upd = local_best > best_ref[:, 0]
    best_ref[:, 0] = jnp.where(upd, local_best, best_ref[:, 0])
    idx_ref[:, 0] = jnp.where(upd, local_idx, idx_ref[:, 0])


@functools.partial(
    jax.jit,
    static_argnames=("tile_b", "tile_n", "interpret", "operand_dtype"),
)
def gallery_match_pallas(
    feats: jnp.ndarray,  # (B, k)
    gallery_t: jnp.ndarray,  # (k, N)
    gallery_norm: jnp.ndarray,  # (N,) -- negative marks invalid rows
    tile_b: int = 1024,
    tile_n: int = 1024,
    interpret: bool = False,
    operand_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming cosine argmax against a LARGE gallery.

    The plain-XLA path materializes the full ``(B, N)`` cosine matrix in
    HBM (the dot is a library matmul; the max/argmax reductions read it
    back).  Here each gallery tile is read into VMEM ONCE for the whole
    batch and only the running ``(best, idx)`` pair (8 bytes/crop) ever
    leaves; it is the per-shard inner loop of
    :func:`..parallel.sharding.sharded_gallery_match`.

    Layout lesson (BENCH_r02): with ``tile_b`` < B the gallery streams
    from HBM once PER BATCH TILE (grid iterates batch-major), which at
    B=1024/tile_b=256 made the kernel 4x memory-bound and *slower* than
    XLA.  ``tile_b`` therefore defaults to the whole batch (clamped to
    1024 rows = 512 KB of f32 feats in VMEM); norms are folded as
    reciprocal multiplies so the inner loop is one MXU dot + VPU max.

    ``operand_dtype=jnp.bfloat16`` casts both dot operands to bf16 --
    the same single-pass-MXU rounding XLA's default f32 matmul
    precision applies -- roughly doubling MXU throughput and halving
    the gallery's HBM/VMEM footprint.  The cosine epilogue stays f32.
    ``None`` keeps full f32 operands (exact; the interpret-mode oracle).

    ``B % tile_b == 0``, ``N % tile_n == 0``.  ``gallery_norm`` doubles
    as the validity channel: pass the true row norm for valid rows and
    any NEGATIVE sentinel for padded/invalid rows (they score -inf and
    never win); a *valid* zero-norm row scores 0, exactly like
    :func:`..ops.similarity.cosine_gallery`.
    """
    b, k = feats.shape
    n = gallery_t.shape[1]
    assert b % tile_b == 0 and n % tile_n == 0, (b, tile_b, n, tile_n)
    fnorm = jnp.linalg.norm(
        feats.astype(jnp.float32), axis=1, keepdims=True
    )
    frinv = jnp.where(fnorm > 0, 1.0 / jnp.where(fnorm > 0, fnorm, 1.0), 0.0)
    gn = gallery_norm.reshape(1, -1).astype(jnp.float32)
    grinv = jnp.where(gn > 0, 1.0 / jnp.where(gn > 0, gn, 1.0), 0.0)
    gmask = jnp.where(gn < 0, -jnp.inf, 0.0).astype(jnp.float32)
    dt = operand_dtype or feats.dtype
    grid = (b // tile_b, n // tile_n)
    best, idx = pl.pallas_call(
        _gallery_match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_b, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=jnp.dtype(dt).itemsize * (b * k + k * n)
            + 4 * 2 * b,
            transcendentals=0,
        ),
    )(
        feats.astype(dt),
        frinv.astype(jnp.float32),
        gallery_t.astype(dt),
        grinv,
        gmask,
    )
    return idx[:, 0], best[:, 0]


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


# ---------------------------------------------------------------------------
# Random-access patch gather (Haar phase-B compaction)
# ---------------------------------------------------------------------------


def gather_patches(
    integrals: jnp.ndarray,  # (L, H, W) stacked level integrals
    lvl: jnp.ndarray,  # (K,) i32
    cy: jnp.ndarray,  # (K,) i32
    cx: jnp.ndarray,  # (K,) i32
    side: int,
) -> jnp.ndarray:
    """(K, side, side) patches at (lvl, cy, cx).

    Two forms, both exact; the fork is a per-backend TUNING choice made
    at trace time:

    * **Accelerators**: one ``vmap(dynamic_slice)`` of contiguous
      ``(1, side, W)`` ROW BLOCKS, then the per-candidate column window
      selected by a one-hot matmul at HIGHEST precision (exact: each
      output element is one value times 1.0 plus zeros).  Every
      candidate-indexed dynamic slice lowers to one iteration of a
      sequential Mosaic ``while`` loop at ~1-3 us REGARDLESS of slice
      size (profiler-measured: the (1,25,25)-tile form spent 65 ms of
      a 178 ms 8-frame Haar batch in that loop), so the win is one
      loop instead of two and cheap iterations: 4.7 ms vs 10.7 ms for
      8x512 patches from (5,545,961) f32 on v5e, honest chained-call
      timing (scripts_dev/probe_gather3.py; earlier "HBM-speed"
      numbers here were tunnel repeat-call-dedup artifacts).
    * **CPU**: the direct ``(1, side, side)`` tile slice -- XLA:CPU
      lowers it to memcpys, and the one-hot matmul would be pure
      overhead (the test suite runs here).

    A Pallas DMA variant was tried and rejected: Mosaic requires DMA
    slice shapes tile-aligned to (8, 128), so a 25x25 copy cannot
    compile, and an aligned (32, 256) copy moves 13x the bytes.
    """
    if jax.default_backend() == "cpu":

        def one(l, y, x):
            return jax.lax.dynamic_slice(
                integrals, (l, y, x), (1, side, side)
            )[0]

        return jax.vmap(one)(lvl, cy, cx)

    return _gather_patches_rowblock(integrals, lvl, cy, cx, side)


def _gather_patches_rowblock(
    integrals: jnp.ndarray,
    lvl: jnp.ndarray,
    cy: jnp.ndarray,
    cx: jnp.ndarray,
    side: int,
) -> jnp.ndarray:
    """Accelerator form of :func:`gather_patches` (exact on any backend).

    Row blocks by ``vmap(dynamic_slice)`` (one sequential Mosaic loop
    iteration per candidate, ~1-3 us each), then the per-candidate
    column window selected by a one-hot matmul at HIGHEST precision.

    A fully-dense variant (row selection ALSO a one-hot matmul, zero
    data-dependent memory ops) was tried in r3 while chasing the
    level-4 B=16 device fault: it did NOT fix the fault (the fault is
    batch-size-, not gather-, triggered; see detect/haar.py
    max_device_batch) and its (K*side, L*H) one-hot operand costs
    ~200 MB/frame of HBM temp at K=512 on the big 544p chunk, so the
    row-block form stays.
    """
    w = integrals.shape[-1]
    k = lvl.shape[0]

    def rows_of(l, y):
        return jax.lax.dynamic_slice(
            integrals, (l, y, jnp.zeros((), l.dtype)), (1, side, w)
        )[0]

    rows = jax.vmap(rows_of)(lvl, cy)  # (K, side, W)
    j = jax.lax.broadcasted_iota(jnp.int32, (k, w, side), 1)
    t = jax.lax.broadcasted_iota(jnp.int32, (k, w, side), 2)
    oh = (j == cx[:, None, None] + t).astype(integrals.dtype)
    return jax.lax.dot_general(
        rows,
        oh,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=integrals.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )  # (K, side, side)


def gather_patches_batch(
    integrals: jnp.ndarray,  # (B, L, H, W)
    lvl: jnp.ndarray,  # (B, K) i32
    cy: jnp.ndarray,
    cx: jnp.ndarray,
    side: int,
) -> jnp.ndarray:
    """(B, K, side, side) patches: :func:`gather_patches` over a batch
    axis (the backend-tuned form fork happens inside)."""
    return jax.vmap(
        lambda ig, l_, y_, x_: gather_patches(ig, l_, y_, x_, side)
    )(integrals, lvl, cy, cx)


def make_fused_recognizer(
    model,
    crop_shape: Tuple[int, int],
    tile_b: int = 128,
    interpret: bool = False,
):
    """Bind a model + crop shape to the Pallas kernel.

    Returns ``fn(crops (B, ch, cw)) -> (gallery_rows, cosine)``; B is
    padded internally to the batch tile.
    """
    lin = linearize_model(model, crop_shape)
    dd, k = lin.m.shape
    n = lin.gallery_t.shape[1]
    # Lane alignment: pad k and N to 128 so every MXU pass is full-width
    # (zero-padded basis columns project to zero; padded gallery rows get
    # zero norm -> cosine 0 -> never win the argmax over real rows with
    # positive scores, and ids are clamped below anyway).
    kpad = _round_up(k, 128)
    npad = _round_up(n, 128)
    m_p = jnp.pad(lin.m, ((0, 0), (0, kpad - k)))
    bias_p = jnp.pad(lin.bias, (0, kpad - k))
    gal_p = jnp.pad(lin.gallery_t, ((0, kpad - k), (0, npad - n)))
    gnorm_p = jnp.pad(lin.gallery_norm, (0, npad - n))
    gmask_p = jnp.where(
        jnp.arange(npad) < n, 0.0, -jnp.inf
    ).astype(jnp.float32)

    tile_d = next(
        (t for t in (2048, 1024, 512, 256, 128) if dd % t == 0), None
    )
    if tile_d is None:
        dpad = _round_up(dd, 1024)
        m_p = jnp.pad(m_p, ((0, dpad - dd), (0, 0)))
        tile_d = 1024
    else:
        dpad = dd

    def fn(crops):
        b = crops.shape[0]
        flat = crops.reshape(b, -1).astype(jnp.float32)
        if dpad != dd:
            flat = jnp.pad(flat, ((0, 0), (0, dpad - dd)))
        bpad = _round_up(b, tile_b)
        if bpad != b:
            flat = jnp.pad(flat, ((0, bpad - b), (0, 0)))
        ids, conf = fused_match_pallas(
            flat,
            m_p,
            bias_p,
            gal_p,
            gnorm_p,
            gallery_mask=gmask_p,
            tile_b=tile_b,
            tile_d=tile_d,
            interpret=interpret,
        )
        return ids[:b], conf[:b]

    return fn, lin

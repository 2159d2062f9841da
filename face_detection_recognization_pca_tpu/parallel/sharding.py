"""Sharded compute: DP recognition, gallery sharding, distributed PCA.

All functions use ``shard_map`` over an explicit ``Mesh`` so the
collectives are visible and ride ICI: ``psum`` for Gram/projection
assembly, max+argmax combines for sharded galleries.  XLA inserts
nothing implicit -- what you read here is the communication schedule.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from face_detection_recognization_pca_tpu.models.eigenfaces import (
    EigenfacesModel,
    extract_features,
)
from face_detection_recognization_pca_tpu.ops.similarity import cosine_gallery


def dp_recognize(
    mesh: Mesh,
    model: EigenfacesModel,
    crops: jnp.ndarray,
    threshold: float = 0.7,
    data_axis: str = "data",
):
    """Data-parallel fused recognize: crop batch sharded over frames.

    The model pytree is replicated; the crop batch's leading axis is
    sharded over the ``data`` axis.  Inside each shard the full fused
    chain runs locally -- no collectives needed until results gather.
    """
    n_data = mesh.shape[data_axis]
    b = crops.shape[0]
    if b % n_data:
        raise ValueError(f"batch {b} not divisible by data axis {n_data}")

    crops = jax.device_put(
        crops, NamedSharding(mesh, P(data_axis, *([None] * (crops.ndim - 1))))
    )
    model = jax.device_put(model, NamedSharding(mesh, P()))

    @jax.jit
    def step(model, crops):
        from face_detection_recognization_pca_tpu.models.eigenfaces import (
            recognize,
        )

        return recognize(model, crops, threshold)

    # With sharded inputs + replicated params, jit/XLA GSPMD keeps the
    # batch axis sharded end-to-end (pure DP, zero communication).
    return step(model, crops)


def sharded_gallery_match(
    mesh: Mesh,
    feats: jnp.ndarray,  # (B, k) replicated
    gallery: jnp.ndarray,  # (N, k) -- will be sharded on axis 0
    labels: jnp.ndarray,  # (N,)
    threshold: float = 0.7,
    model_axis: str = "model",
    use_pallas: bool = None,
    pallas_threshold: int = 32768,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine match against a gallery sharded across chips.

    The tensor-parallel analog for galleries too large for one chip's
    HBM: each device scores its gallery shard, then a max/argmax
    combine over the ``model`` axis picks the global winner.

    Per-shard inner loop: for large shards on TPU (>=
    ``pallas_threshold`` rows) the streaming Pallas kernel
    (:func:`..ops.pallas_kernels.gallery_match_pallas`) scores the
    shard without materializing the (B, shard_n) cosine matrix in HBM;
    small shards and CPU test meshes use the plain-XLA path (identical
    results, first-occurrence tie-breaking in both).

    Returns (person_ids (B,), confidences (B,)).
    """
    n_shards = mesh.shape[model_axis]
    n = gallery.shape[0]
    if n % n_shards:
        pad = n_shards - n % n_shards
        gallery = jnp.pad(gallery, ((0, pad), (0, 0)))
        labels = jnp.pad(labels, (0, pad), constant_values=-1)
        n = gallery.shape[0]
    shard_n = n // n_shards
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and shard_n >= pallas_threshold
        )

    def _local_match_pallas(feats, gal, lab):
        from face_detection_recognization_pca_tpu.ops.pallas_kernels import (
            gallery_match_pallas,
        )

        b = feats.shape[0]
        # One batch tile when possible: tile_b < B makes the gallery
        # stream from HBM once per batch tile (BENCH_r02's 0.89x loss).
        bpad = -(-b // 8) * 8  # f32 sublane alignment
        tile_b = min(bpad, 1024)
        bpad = -(-bpad // tile_b) * tile_b
        tile_n = 1024 if shard_n >= 1024 else shard_n
        npad = -(-shard_n // tile_n) * tile_n
        f = jnp.pad(feats, ((0, bpad - b), (0, 0)))
        g = jnp.pad(gal, ((0, npad - shard_n), (0, 0)))
        gnorm = jnp.linalg.norm(g, axis=1)
        # Invalid rows (global pad, labels -1) must never win: zero
        # their norms so the kernel scores them -inf.
        valid = jnp.pad(lab >= 0, (0, npad - shard_n))
        gnorm = jnp.where(valid, gnorm, 0.0)
        idx, best = gallery_match_pallas(
            f, g.T, gnorm, tile_b=tile_b, tile_n=tile_n
        )
        idx = idx[:b]
        best = best[:b]
        lab_pad = jnp.pad(lab, (0, npad - shard_n), constant_values=-1)
        return best, lab_pad[idx]

    def local(feats, gal, lab):
        # gal: (shard_n, k) local shard; feats replicated.
        if use_pallas:
            local_best, local_lab = _local_match_pallas(feats, gal, lab)
        else:
            scores = cosine_gallery(feats, gal)  # (B, shard_n)
            # Mask padded rows.
            valid = lab >= 0
            scores = jnp.where(valid[None, :], scores, -jnp.inf)
            local_idx = jnp.argmax(scores, axis=1)
            local_best = jnp.take_along_axis(
                scores, local_idx[:, None], 1
            )[:, 0]
            local_lab = lab[local_idx]
        # Global combine: gather per-shard winners, reduce on every chip.
        all_best = jax.lax.all_gather(local_best, model_axis)  # (S, B)
        all_lab = jax.lax.all_gather(local_lab, model_axis)  # (S, B)
        winner = jnp.argmax(all_best, axis=0)  # (B,)
        best = jnp.take_along_axis(all_best, winner[None, :], 0)[0]
        lab_out = jnp.take_along_axis(all_lab, winner[None, :], 0)[0]
        ids = jnp.where(best >= threshold, lab_out, -1)
        return ids, best

    spec_gal = P(model_axis, None)
    spec_lab = P(model_axis)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), spec_gal, spec_lab),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(feats, gallery, labels.astype(jnp.int32))


def snapshot_pca_sharded(
    mesh: Mesh,
    x: jnp.ndarray,  # (n, d), n < d; will be sharded over features
    n_components: int,
    model_axis: str = "model",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Feature-sharded snapshot PCA (the distributed training step).

    Communication schedule (all on ICI):
      1. Gram assembly: ``G = sum_s Xc_s Xc_s^T / (n-1)`` -- one psum of
         an (n, n) block per device.
      2. ``eigh(G)`` replicated (n x n is tiny by construction).
      3. Back-projection ``U_s = Xc_s^T V`` stays sharded; column norms
         need one more psum of (k,) partial squares.
      4. Projected gallery ``P = sum_s Xc_s U_s`` -- psum of (n, k).

    Returns (components (k, d) sharded on d, mean (d,) sharded,
    projected (n, k) replicated, eigenvalues (k,) replicated); semantics
    identical to :func:`..linalg.pca.snapshot_pca` up to eigh sign.
    """
    n, d = x.shape
    n_shards = mesh.shape[model_axis]
    if d % n_shards:
        raise ValueError(f"feature dim {d} not divisible by {n_shards}")
    k = min(n_components, n)

    def local(xs):
        # xs: (n, d_shard)
        mean_s = jnp.mean(xs, axis=0)
        xc = xs - mean_s
        gram = jax.lax.psum(
            jnp.dot(xc, xc.T, preferred_element_type=xs.dtype), model_axis
        ) / (n - 1)
        eigval, eigvec = jnp.linalg.eigh(gram)  # replicated compute
        order = jnp.argsort(eigval)[::-1]
        eigval = eigval[order][:k]
        v = eigvec[:, order][:, :k]  # (n, k)
        u_s = jnp.dot(xc.T, v, preferred_element_type=xs.dtype)  # (d_s, k)
        sq = jax.lax.psum(jnp.sum(u_s * u_s, axis=0), model_axis)
        norms = jnp.sqrt(sq)
        u_s = u_s / jnp.where(norms > 0, norms, 1.0)
        proj = jax.lax.psum(
            jnp.dot(xc, u_s, preferred_element_type=xs.dtype), model_axis
        )
        return u_s.T, mean_s, proj, eigval  # (k, d_s) sharded on d

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, model_axis),),
        out_specs=(
            P(None, model_axis),
            P(model_axis),
            P(),
            P(),
        ),
        check_vma=False,
    )
    return fn(x)


def multichip_train_step(
    mesh: Mesh,
    images: jnp.ndarray,  # (n, d)
    probe_crops: jnp.ndarray,  # (B, h, w)
    n_components: int,
    face_shape: Tuple[int, int],
    data_axis: str = "data",
    model_axis: str = "model",
):
    """One full 'training step' across the mesh: distributed PCA fit on
    feature shards + data-parallel recognition of a probe batch against
    the freshly trained gallery.  This is the program
    ``__graft_entry__.dryrun_multichip`` compiles over N devices.
    """
    comps, mean, proj, eigval = snapshot_pca_sharded(
        mesh, images, n_components, model_axis
    )
    model = EigenfacesModel(
        components=comps,
        projection_mean=mean,
        mean_face=mean,
        gallery=proj,
        labels=jnp.zeros(proj.shape[0], jnp.int32),
        scaler_mean=None,
        scaler_scale=None,
        face_shape=tuple(face_shape),
        schema="v1",
    )
    feats = extract_features(model, probe_crops)
    ids, conf = sharded_gallery_match(
        mesh, feats, model.gallery, model.labels, 0.5, model_axis
    )
    return ids, conf, eigval

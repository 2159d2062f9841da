"""Multi-chip sharding on the 8 fake CPU devices (SURVEY §4d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_detection_recognization_pca_tpu.linalg.pca import snapshot_pca
from face_detection_recognization_pca_tpu.models import eigenfaces as ef
from face_detection_recognization_pca_tpu.ops.similarity import cosine_gallery
from face_detection_recognization_pca_tpu.parallel.mesh import make_mesh
from face_detection_recognization_pca_tpu.parallel.sharding import (
    dp_recognize,
    multichip_train_step,
    sharded_gallery_match,
    snapshot_pca_sharded,
)


@pytest.fixture(scope="module")
def devices8():
    if len(jax.devices()) < 8:
        pytest.skip("need 8 fake devices (xla_force_host_platform_device_count)")
    return jax.devices()[:8]


def _toy_model(rng, n=24, d=4096, k=12):
    x = rng.normal(120.0, 30.0, (n, d))
    model, aux = ef.train_v1(jnp.asarray(x), n_components=k)
    return x, model


def test_dp_recognize_matches_single_device(rng, devices8):
    mesh = make_mesh(data=8, model=1, devices=devices8)
    x, model = _toy_model(rng)
    crops = rng.normal(120.0, 30.0, (16, 64, 64)).astype(np.float32)
    model32 = jax.tree.map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "astype") else a, model
    )
    ids_s, conf_s = ef.recognize(model32, jnp.asarray(crops), 0.5)
    ids_p, conf_p = dp_recognize(mesh, model32, jnp.asarray(crops), 0.5)
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_s))
    np.testing.assert_allclose(np.asarray(conf_p), np.asarray(conf_s), atol=1e-5)


def test_sharded_gallery_match_matches_dense(rng, devices8):
    mesh = make_mesh(data=1, model=8, devices=devices8)
    feats = rng.normal(0, 1, (6, 32))
    gallery = rng.normal(0, 1, (40, 32))  # 40 rows -> padded to 48
    labels = rng.integers(0, 5, 40)
    ids, conf = sharded_gallery_match(
        mesh,
        jnp.asarray(feats),
        jnp.asarray(gallery),
        jnp.asarray(labels),
        threshold=0.0,
    )
    dense = np.asarray(cosine_gallery(jnp.asarray(feats), jnp.asarray(gallery)))
    np.testing.assert_allclose(np.asarray(conf), dense.max(1), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(ids), labels[dense.argmax(1)]
    )


def test_snapshot_pca_sharded_matches_dense(rng, devices8):
    mesh = make_mesh(data=1, model=8, devices=devices8)
    x = rng.normal(100.0, 25.0, (20, 512))
    comps_s, mean_s, proj_s, eig_s = snapshot_pca_sharded(mesh, jnp.asarray(x), 8)
    dense = snapshot_pca(jnp.asarray(x), 8)
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(dense.mean), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(eig_s), np.asarray(dense.eigenvalues), rtol=1e-8
    )
    # Same subspace up to per-component sign.
    a = np.asarray(proj_s)
    b = np.asarray(dense.projected)
    signs = np.sign(np.sum(a * b, axis=0))
    np.testing.assert_allclose(a * signs, b, atol=1e-6)
    c_s = np.asarray(comps_s)
    c_d = np.asarray(dense.components)
    np.testing.assert_allclose(c_s * signs[:, None], c_d, atol=1e-7)


def test_multichip_train_step_2x4(rng, devices8):
    """Full train+recognize step over a 2x4 (data x model) mesh."""
    mesh = make_mesh(data=2, model=4, devices=devices8)
    images = rng.normal(110.0, 20.0, (16, 4096))
    probes = images[:4].reshape(4, 64, 64)
    ids, conf, eigval = multichip_train_step(
        mesh, jnp.asarray(images), jnp.asarray(probes), 8, (64, 64)
    )
    # Probes are training rows: must match themselves at cosine ~1.
    np.testing.assert_array_equal(np.asarray(ids), np.zeros(4))
    assert np.asarray(conf).min() > 0.999
    assert np.all(np.diff(np.asarray(eigval)) <= 1e-9)  # descending


def test_initialize_multihost_noop_without_coordinator(monkeypatch):
    """Single-host: no coordinator env -> graceful no-op, never init."""
    from face_detection_recognization_pca_tpu.parallel import distributed

    for var in (
        "FDRP_COORDINATOR",
        "JAX_COORDINATOR_ADDRESS",
        "FDRP_MULTIHOST",
    ):
        monkeypatch.delenv(var, raising=False)
    assert distributed.initialize_multihost() is False


def test_global_mesh_topology_rule():
    """Outer axis = data (DCN-crossing), inner = model (ICI); model
    axis may not exceed the local device count."""
    import jax
    import pytest as _pytest

    from face_detection_recognization_pca_tpu.parallel.distributed import (
        global_mesh,
    )

    mesh = global_mesh(data=2, model=4)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (2, 4)
    with _pytest.raises(ValueError, match="ICI"):
        global_mesh(model=jax.local_device_count() * 2)


def test_dryrun_multichip_n_hosts_graceful(capsys):
    """dryrun_multichip(8, n_hosts=2) on one host: says so, still runs."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8, n_hosts=2)
    out = capsys.readouterr().out
    assert "continuing single-host" in out
    assert "dryrun_multichip OK" in out

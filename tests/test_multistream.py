"""Multi-stream tracker+recognizer: planted-face tracking, DP equality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from face_detection_recognization_pca_tpu.models import eigenfaces as ef
from face_detection_recognization_pca_tpu.parallel.mesh import make_mesh
from face_detection_recognization_pca_tpu.parallel.multistream import (
    MultiStreamRecognizer,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(1234)
    tpl = 64
    yy, xx = np.mgrid[0:tpl, 0:tpl].astype(np.float32) / tpl
    face = (
        120 + 50 * np.sin(6.28 * yy * 1.7) + 35 * np.cos(6.28 * xx * 2.3)
    ).astype(np.float32)
    # Structured gallery variation (shifted copies + light noise) so the
    # eigenbasis captures real signal, not iid noise directions.
    gallery = np.stack(
        [
            np.roll(
                face, (int(rng.integers(-2, 3)), int(rng.integers(-2, 3))), (0, 1)
            ).reshape(-1)
            + rng.normal(0, 2, tpl * tpl)
            for _ in range(32)
        ]
    ).astype(np.float32)
    model, _ = ef.train_v1(jnp.asarray(gallery), n_components=8)
    return face, model


def _frames(face, rng, s=8, h=240, w=320, offs=None):
    frames = rng.normal(100, 20, (s, h, w)).astype(np.float32)
    pos = []
    for i in range(s):
        oy, ox = (60 + 5 * i, 100 + 7 * i) if offs is None else offs[i]
        frames[i, oy : oy + 64, ox : ox + 64] = face
        pos.append((ox, oy))
    return frames, pos


def test_tracks_and_recognizes_planted_faces(setup, rng):
    face, model = setup
    msr = MultiStreamRecognizer(model, face, window=128)
    frames, pos = _frames(face, rng)
    state = msr.init_state(8, (240, 320))
    out, state = msr.process_batch(jnp.asarray(frames), state)
    # Streams whose face lies inside the initial centered window should
    # lock on exactly; confidence near 1 for all (window covers plants).
    bx = np.asarray(out["x"])
    by = np.asarray(out["y"])
    tm = np.asarray(out["template_confidence"])
    for i, (ox, oy) in enumerate(pos):
        # initial window is centered at (56..184, 96..224): all plants in range
        assert tm[i] > 0.9
        assert abs(int(bx[i]) - ox) <= 1 and abs(int(by[i]) - oy) <= 1
    assert np.asarray(out["confidence"]).min() > 0.95

    # Second batch: faces move; tracker window recentered, still locks.
    offs2 = [(65 + 5 * i, 105 + 7 * i) for i in range(8)]
    frames2, pos2 = _frames(face, rng, offs=offs2)
    out2, _ = msr.process_batch(jnp.asarray(frames2), state)
    tm2 = np.asarray(out2["template_confidence"])
    assert tm2.min() > 0.9


def test_dp_mesh_matches_single_device(setup, rng):
    if len(jax.devices()) < 8:
        pytest.skip("need 8 fake devices")
    face, model = setup
    frames, _ = _frames(face, rng)
    single = MultiStreamRecognizer(model, face, window=128)
    st = single.init_state(8, (240, 320))
    out_s, _ = single.process_batch(jnp.asarray(frames), st)

    mesh = make_mesh(data=8, model=1)
    dp = MultiStreamRecognizer(model, face, window=128, mesh=mesh)
    st2 = dp.init_state(8, (240, 320))
    out_p, _ = dp.process_batch(jnp.asarray(frames), st2)
    np.testing.assert_array_equal(
        np.asarray(out_s["gallery_row"]), np.asarray(out_p["gallery_row"])
    )
    np.testing.assert_allclose(
        np.asarray(out_s["confidence"]),
        np.asarray(out_p["confidence"]),
        atol=1e-5,
    )

    # The time-fused window path under the same DP mesh: a (T=2, S=8)
    # window must match the single-device window run exactly.
    frames_ts = jnp.asarray(np.stack([frames, frames]))
    st_s = single.init_state(8, (240, 320))
    w_s, _ = single.process_window(frames_ts, st_s)
    st_p = dp.init_state(8, (240, 320))
    w_p, _ = dp.process_window(frames_ts, st_p)
    np.testing.assert_array_equal(
        np.asarray(w_s["gallery_row"]), np.asarray(w_p["gallery_row"])
    )
    np.testing.assert_allclose(
        np.asarray(w_s["confidence"]),
        np.asarray(w_p["confidence"]),
        atol=1e-5,
    )


def test_state_donation_no_copy(setup, rng):
    """The steady-state loop's state update is donation-aliased
    (SURVEY §5's jit-donation substitute for sanitizers): new_origin
    reuses the old origin buffer (pointer-equal on this backend) and
    the consumed state is deleted -- no per-step state copy."""
    face, model = setup
    msr = MultiStreamRecognizer(model, face, window=128)
    frames, _ = _frames(face, rng)
    state = msr.init_state(8, (240, 320))
    frames_dev = jnp.asarray(frames)
    _, state = msr.process_batch(frames_dev, state)  # compile step
    old = state.origin
    p_old = old.unsafe_buffer_pointer()
    _, state = msr.process_batch(frames_dev, state)
    assert state.origin.unsafe_buffer_pointer() == p_old
    with pytest.raises(RuntimeError):
        np.asarray(old)  # donated away: reuse must fail loudly


def test_process_window_matches_sequential_steps(setup, rng):
    """One time-fused dispatch (lax.scan over T on device) must produce
    exactly the per-batch results of T sequential process_batch calls:
    same positions, rows, and confidences, and the same final state."""
    face, model = setup
    T, S = 4, 8
    frames_t = []
    for t in range(T):
        offs = [(60 + 5 * i + 2 * t, 100 + 7 * i - t) for i in range(S)]
        f, _ = _frames(face, rng, offs=offs)
        frames_t.append(f)
    frames_ts = jnp.asarray(np.stack(frames_t))  # (T, S, H, W)

    msr = MultiStreamRecognizer(model, face, window=128)
    st_seq = msr.init_state(S, (240, 320))
    seq = []
    for t in range(T):
        out, st_seq = msr.process_batch(frames_ts[t], st_seq)
        seq.append(out)

    st_w = msr.init_state(S, (240, 320))
    win, st_w = msr.process_window(frames_ts, st_w)
    for t in range(T):
        for key in ("gallery_row", "x", "y"):
            np.testing.assert_array_equal(
                np.asarray(win[key])[t], np.asarray(seq[t][key])
            )
        np.testing.assert_allclose(
            np.asarray(win["confidence"])[t],
            np.asarray(seq[t]["confidence"]),
            rtol=0,
            atol=1e-6,
        )
    np.testing.assert_array_equal(
        np.asarray(st_w.origin), np.asarray(st_seq.origin)
    )

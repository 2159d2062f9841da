"""Multi-stream fused serving: guided detect + recognize over stream
batches, optionally data-parallel over a device mesh.

This is the production form of the benchmark step (BASELINE config 5):
per stream, slice the guided search window around the last known box,
TM_CCOEFF_NORMED against the stream's template (rFFT correlation +
banded-matmul window statistics -- see bench.py for the measured
rationale), crop the best hit with one-hot selection matmuls, and run
the linearized projection-and-match.  One jitted program per frame
batch; state (per-stream box) feeds back between batches, giving a
tracking loop like the reference's guided scanner but vectorized over
streams.

With a mesh, the stream axis is sharded over ``data`` and the model
operands are replicated -- pure DP with zero collectives per step.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from face_detection_recognization_pca_tpu.ops.pallas_kernels import (
    linearize_model,
)


@dataclasses.dataclass
class MultiStreamState:
    """Per-stream tracker state: window origin (y, x) in frame coords."""

    origin: jnp.ndarray  # (S, 2) int32


def _make_step(win: int, tpl: int, template0: np.ndarray):
    out_n = win - tpl + 1
    from face_detection_recognization_pca_tpu.ops.dft_match import (
        make_circular_correlator,
    )

    corr_fn = make_circular_correlator(np.asarray(template0), win, out_n)

    def _frame_step(frames, origin, t_energy, m, bias, gallery_t, gnorm):
        s = frames.shape[0]

        def window_of(frame, oyx):
            return jax.lax.dynamic_slice(frame, (oyx[0], oyx[1]), (win, win))

        windows = jax.vmap(window_of)(frames, origin)
        # Centered copy for NCC statistics only (f32 cancellation safety
        # -- see ops/match.py); recognition crops stay raw pixels.
        windows_c = windows - jnp.mean(windows)

        # MXU-DFT circular correlation (see ops/dft_match.py; ~5x the
        # jnp.fft path at these sizes).
        num = corr_fn(windows_c)

        jj = jax.lax.broadcasted_iota(jnp.int32, (win, out_n), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (win, out_n), 1)
        band = ((jj >= xx) & (jj < xx + tpl)).astype(jnp.float32)
        s1 = jnp.einsum(
            "swv,wy,vx->syx", windows_c, band, band,
            preferred_element_type=jnp.float32,
        )
        s2 = jnp.einsum(
            "swv,wy,vx->syx", windows_c * windows_c, band, band,
            preferred_element_type=jnp.float32,
        )
        n = tpl * tpl
        var_n = jnp.maximum(s2 - s1 * s1 / n, 0.0)
        denom = jnp.sqrt(t_energy * var_n)
        safe = var_n > n * 1.0
        scores = jnp.clip(
            jnp.where(safe, num / jnp.where(safe, denom, 1.0), 0.0), -1.0, 1.0
        )
        flat = scores.reshape(s, -1)
        loc = jnp.argmax(flat, axis=1)
        tm_conf = jnp.take_along_axis(flat, loc[:, None], 1)[:, 0]
        ly, lx = loc // out_n, loc % out_n

        i_t = jax.lax.broadcasted_iota(jnp.int32, (tpl, win), 0)
        j_t = jax.lax.broadcasted_iota(jnp.int32, (tpl, win), 1)
        py = (j_t[None] == (ly[:, None, None] + i_t[None])).astype(jnp.float32)
        px = (j_t[None] == (lx[:, None, None] + i_t[None])).astype(jnp.float32)
        crops = jnp.einsum(
            "saw,swv,sbv->sab", py, windows, px,
            preferred_element_type=jnp.float32,
        )

        feats = (
            jnp.dot(crops.reshape(s, -1), m, preferred_element_type=jnp.float32)
            + bias
        )
        dots = jnp.dot(feats, gallery_t, preferred_element_type=jnp.float32)
        fn = jnp.linalg.norm(feats, axis=1, keepdims=True)
        dn = fn * gnorm[None, :]
        cos = jnp.where(dn > 0, dots / jnp.where(dn > 0, dn, 1.0), 0.0)
        ids = jnp.argmax(cos, axis=1).astype(jnp.int32)
        conf = jnp.max(cos, axis=1)

        # Track: recenter next window on the hit (clamped inside frame).
        box_y = origin[:, 0] + ly
        box_x = origin[:, 1] + lx
        fh, fw_ = frames.shape[1], frames.shape[2]
        new_oy = jnp.clip(box_y - (win - tpl) // 2, 0, fh - win)
        new_ox = jnp.clip(box_x - (win - tpl) // 2, 0, fw_ - win)
        new_origin = jnp.stack([new_oy, new_ox], axis=1).astype(jnp.int32)
        return ids, conf, tm_conf, box_x, box_y, new_origin

    # The (S, 2) origin state feeds back every batch; donating it lets
    # XLA alias new_origin onto the old buffer (no per-step state copy
    # -- SURVEY §5's jit-donation/aliasing substitute for sanitizers).
    # process_batch therefore CONSUMES its state argument; callers must
    # thread the returned state, never reuse the old one (both in-tree
    # callers already do).
    @functools.partial(jax.jit, donate_argnums=(1,))
    def step(frames, origin, t_energy, m, bias, gallery_t, gnorm):
        return _frame_step(
            frames, origin, t_energy, m, bias, gallery_t, gnorm
        )

    # Time-fused variant: ONE dispatch tracks T consecutive frames per
    # stream, lax.scan carrying the per-stream window origin across the
    # time axis ON DEVICE.  The per-frame math is byte-identical to
    # ``step`` (same _frame_step body); only the dispatch granularity
    # changes -- through the remote tunnel each dispatch costs ~5-10 ms
    # of latency, which at one frame/stream/dispatch bounds the tracker
    # regardless of compute (measured r5: 6.1k fps single-step vs the
    # headline's 147k for the same per-frame math).  XLA cannot batch
    # the time axis itself (state feedback is sequential), so scan is
    # the idiomatic form: compiler-friendly control flow, zero host
    # round-trips inside the window.
    @functools.partial(jax.jit, donate_argnums=(1,))
    def step_window(frames_ts, origin, t_energy, m, bias, gallery_t, gnorm):
        def body(org, frames):
            ids, conf, tm_conf, bx, by, new_org = _frame_step(
                frames, org, t_energy, m, bias, gallery_t, gnorm
            )
            return new_org, (ids, conf, tm_conf, bx, by)

        new_origin, outs = jax.lax.scan(body, origin, frames_ts)
        return outs + (new_origin,)

    return step, step_window


class MultiStreamRecognizer:
    """Stateful vectorized tracker+recognizer over N video streams."""

    def __init__(
        self,
        model,
        template: np.ndarray,
        window: int = 192,
        mesh: Optional[Mesh] = None,
        data_axis: str = "data",
    ):
        tpl = int(template.shape[0])
        if template.shape[0] != template.shape[1]:
            raise ValueError("square templates only")
        if window <= tpl:
            raise ValueError("window must exceed template size")
        self.win, self.tpl = int(window), tpl
        lin = linearize_model(model, (tpl, tpl))
        t0 = np.asarray(template, np.float32)
        t0 = t0 - t0.mean()
        self._args = (
            jnp.asarray(np.sum(t0 * t0, dtype=np.float64).astype(np.float32)),
            lin.m,
            lin.bias,
            lin.gallery_t,
            lin.gallery_norm,
        )
        self.labels = lin.labels
        self._step, self._step_window = _make_step(self.win, tpl, t0)
        self.mesh = mesh
        self.data_axis = data_axis

    def init_state(self, num_streams: int, frame_hw: Tuple[int, int],
                   boxes: Optional[np.ndarray] = None) -> MultiStreamState:
        """Initial window origins: centered, or around provided boxes."""
        h, w = frame_hw
        if boxes is None:
            oy = np.full(num_streams, (h - self.win) // 2, np.int32)
            ox = np.full(num_streams, (w - self.win) // 2, np.int32)
        else:
            pad = (self.win - self.tpl) // 2
            oy = np.clip(boxes[:, 1] - pad, 0, h - self.win).astype(np.int32)
            ox = np.clip(boxes[:, 0] - pad, 0, w - self.win).astype(np.int32)
        return MultiStreamState(jnp.stack([jnp.asarray(oy), jnp.asarray(ox)], 1))

    def process_batch(self, frames: jnp.ndarray, state: MultiStreamState):
        """frames (S, H, W) f32 -> (results dict, new state)."""
        if self.mesh is not None:
            spec = NamedSharding(self.mesh, P(self.data_axis, None, None))
            frames = jax.device_put(frames, spec)
            state = MultiStreamState(
                jax.device_put(
                    state.origin, NamedSharding(self.mesh, P(self.data_axis, None))
                )
            )
        ids, conf, tm_conf, bx, by, new_origin = self._step(
            frames, state.origin, *self._args
        )
        return (
            {
                "gallery_row": ids,
                "person_id": self.labels[ids],
                "confidence": conf,
                "template_confidence": tm_conf,
                "x": bx,
                "y": by,
            },
            MultiStreamState(new_origin),
        )

    def process_window(self, frames_ts: jnp.ndarray, state: MultiStreamState):
        """Track T consecutive frames per stream in ONE dispatch.

        ``frames_ts``: (T, S, H, W) f32 -- the time axis is scanned ON
        DEVICE (``lax.scan`` carries each stream's window origin), so a
        window costs one host round-trip instead of T.  Per-frame math
        identical to :meth:`process_batch`; results carry a leading T
        axis.  Like process_batch, the state argument is CONSUMED
        (donated) -- thread the returned state."""
        if self.mesh is not None:
            spec = NamedSharding(
                self.mesh, P(None, self.data_axis, None, None)
            )
            frames_ts = jax.device_put(frames_ts, spec)
            state = MultiStreamState(
                jax.device_put(
                    state.origin,
                    NamedSharding(self.mesh, P(self.data_axis, None)),
                )
            )
        ids, conf, tm_conf, bx, by, new_origin = self._step_window(
            frames_ts, state.origin, *self._args
        )
        return (
            {
                "gallery_row": ids,
                "person_id": self.labels[ids],
                "confidence": conf,
                "template_confidence": tm_conf,
                "x": bx,
                "y": by,
            },
            MultiStreamState(new_origin),
        )

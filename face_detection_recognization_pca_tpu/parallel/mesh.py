"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """(data x model) device mesh.

    ``data=None`` uses all remaining devices on the data axis.  On a
    single host the device order follows ``jax.devices()``; on real pods
    pass an explicitly ICI-contiguous device list.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (data_axis, model_axis))

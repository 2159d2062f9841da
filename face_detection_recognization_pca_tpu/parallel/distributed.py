"""Multi-host (DCN) initialization + global mesh construction.

The reference has no distributed execution at all -- its only IPC is
``subprocess.run`` between pipeline stages (``run_pipeline.py:41``,
SURVEY.md §2.4).  This module is the new first-class component the
TPU-native build adds for multi-host scaling (SURVEY.md §5): fan
independent video streams out across hosts, shard big galleries within
a host's ICI domain.

Topology rule: the stream/data axis is the OUTERMOST mesh axis so it
is the one that crosses DCN -- streams are embarrassingly parallel, so
DCN carries no per-step tensor traffic; gallery/model sharding stays
on the innermost axis, whose collectives (``psum``/``all_gather`` in
:mod:`.sharding`) ride ICI within one host's slice.  This follows the
standard mesh recipe (outer axes = slowest interconnect).

Single-host behavior is unchanged: :func:`initialize_multihost` is a
guarded no-op unless a coordinator is configured, and
:func:`global_mesh` degrades to :func:`.mesh.make_mesh` over the local
devices.  Correctness of the multi-process path is executed for real by
``tests/test_multihost.py``: two CPU processes (4 fake devices each)
join a localhost coordinator, run ``multichip_train_step`` over the
cross-process mesh (collectives on Gloo), and must reproduce the
single-process result.  Only DCN *performance* requires a real pod.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh

from face_detection_recognization_pca_tpu.parallel.mesh import make_mesh
from face_detection_recognization_pca_tpu.utils.logging import get_logger

log = get_logger("fdrp.dist")

_initialized = False


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Guarded ``jax.distributed.initialize``.

    Configuration comes from the arguments or, if omitted, from the
    environment (``FDRP_COORDINATOR`` / ``JAX_COORDINATOR_ADDRESS``,
    ``FDRP_NUM_PROCESSES``, ``FDRP_PROCESS_ID``); on TPU pods with the
    standard metadata environment, bare ``jax.distributed.initialize()``
    autodetects all three, so setting just ``FDRP_MULTIHOST=1`` works
    there too.

    Returns True iff distributed mode was (or already is) initialized.
    A plain single-host run -- no coordinator configured -- is a no-op
    returning False, never an error.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "FDRP_COORDINATOR", os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    autodetect = os.environ.get("FDRP_MULTIHOST", "") == "1"
    if coordinator_address is None and not autodetect:
        return False
    if num_processes is None and "FDRP_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["FDRP_NUM_PROCESSES"])
    if process_id is None and "FDRP_PROCESS_ID" in os.environ:
        process_id = int(os.environ["FDRP_PROCESS_ID"])
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _initialized = True
    log.info(
        "multi-host initialized: process %d/%d, %d local + %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def global_mesh(
    data: Optional[int] = None,
    model: int = 1,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """(data x model) mesh over ALL global devices.

    ``jax.devices()`` orders devices process-major, so reshaping to
    (data, model) with ``model`` <= local device count puts the model
    axis inside each host (ICI) and lets the data axis span hosts
    (DCN) -- the topology rule in the module docstring.  On a single
    host this is exactly :func:`.mesh.make_mesh`.
    """
    devices = jax.devices()
    local = jax.local_device_count()
    if model > local:
        raise ValueError(
            f"model axis {model} exceeds local device count {local}; "
            "gallery sharding must stay inside one host's ICI domain"
        )
    return make_mesh(
        data=data,
        model=model,
        devices=devices,
        data_axis=data_axis,
        model_axis=model_axis,
    )

"""Multi-chip scaling: meshes, shardings, collectives.

The reference is a serial single-process pipeline (SURVEY §2.4: no
parallelism, no distributed backend -- ``subprocess.run`` is its only
IPC).  These are therefore *new first-class components*, designed for
TPU topology rather than ported:

* frame/stream **data parallelism** over the ``data`` mesh axis (ICI);
* **gallery/eigenbasis sharding** over the ``model`` axis -- the tensor-
  parallel analog for large multi-person galleries, with psum/argmax
  combines;
* **feature-sharded snapshot PCA training** -- the Gram matrix is
  assembled with one psum over d-shards, eigh runs replicated (n x n is
  tiny), and the eigenbasis back-projection stays sharded.

Sequence/pipeline/expert parallelism have no analog in this workload
(no sequences, no layer pipeline, no experts); scaling is by frames,
streams and gallery size.
"""

from face_detection_recognization_pca_tpu.parallel.distributed import (  # noqa: F401
    global_mesh,
    initialize_multihost,
)
from face_detection_recognization_pca_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
)
from face_detection_recognization_pca_tpu.parallel.sharding import (  # noqa: F401
    dp_recognize,
    sharded_gallery_match,
    snapshot_pca_sharded,
)

"""TPU-native eigenfaces face detection + recognition framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of the
reference pipeline ``saladbkp/face-detection-recognization-PCA``
(detect -> PCA train -> recognize over videos / webcams), built
TPU-first:

* frame preprocessing (grayscale, crop, resize, flatten, standardize)
  compiles to fused, vmappable XLA ops (:mod:`.ops`);
* PCA training (mean face, Gram/snapshot trick, eigh/SVD, top-k
  eigenfaces) runs as batched dense linear algebra on the MXU
  (:mod:`.linalg`);
* the recognition loop (project crop into eigenspace, cosine similarity
  against the gallery, threshold + argmax) fuses into a single Pallas
  projection-and-match kernel (:mod:`.ops.pallas_kernels`,
  :mod:`.recognize`);
* detection runs either as batched normalized cross-correlation
  (template matching, TM_CCOEFF_NORMED parity) or as a dense
  vectorized Haar cascade over integral images (:mod:`.detect`);
* multi-stream video scales over a ``jax.sharding.Mesh`` with sharded
  galleries and XLA collectives (:mod:`.parallel`).

Model artifacts stay format-compatible with the reference
(``*_pca_model.pkl``, ``face_model.pkl``, ``*_model_info.json``,
detection JSONs, eigenface/mean-face images) -- see :mod:`.io`.
"""

__version__ = "0.1.0"

from face_detection_recognization_pca_tpu.config import (  # noqa: F401
    DetectConfig,
    PipelineConfig,
    RecognizeConfig,
    TrainConfig,
)

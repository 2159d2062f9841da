"""Recognition: fused multi-model matching + fusion/arbitration policies."""

from face_detection_recognization_pca_tpu.recognize.engine import (  # noqa: F401
    ModelStack,
    MultiModelRecognizer,
)
from face_detection_recognization_pca_tpu.recognize.fusion import (  # noqa: F401
    arbitration_score,
    fuse_template_pca,
)

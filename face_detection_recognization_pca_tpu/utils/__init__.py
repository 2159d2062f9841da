"""Host utilities: structured logging, counters, timers, annotation."""

from face_detection_recognization_pca_tpu.utils.logging import (  # noqa: F401
    Counters,
    get_logger,
)
from face_detection_recognization_pca_tpu.utils.profiling import (  # noqa: F401
    StageTimer,
)

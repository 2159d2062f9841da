"""Detection engines: template-matching NCC, raw-CCOEFF template
detection, and the Haar cascade."""

from face_detection_recognization_pca_tpu.detect.ccoeff import (  # noqa: F401
    CcoeffTemplateDetector,
)
from face_detection_recognization_pca_tpu.detect.template import (  # noqa: F401
    Detection,
    TemplateBank,
    TemplateDetector,
)

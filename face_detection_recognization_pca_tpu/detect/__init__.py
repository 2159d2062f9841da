"""Detection engines: template-matching NCC and the Haar cascade."""

from face_detection_recognization_pca_tpu.detect.template import (  # noqa: F401
    Detection,
    TemplateBank,
    TemplateDetector,
)

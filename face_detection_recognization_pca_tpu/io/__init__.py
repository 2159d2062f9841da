"""Artifact I/O: reference-compatible pickles, JSONs, images, video."""

from face_detection_recognization_pca_tpu.io.artifacts import (  # noqa: F401
    EigenfacesArtifact,
    load_model,
    save_model_v1,
    save_model_v2,
)
from face_detection_recognization_pca_tpu.io.detection_json import (  # noqa: F401
    DetectionRecord,
    generate_detection_json,
    read_detection_json,
    write_detection_json,
)

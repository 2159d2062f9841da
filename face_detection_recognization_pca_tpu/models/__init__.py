"""Model families: eigenfaces PCA (v1 snapshot, v2 scaled), trainers,
multi-model galleries, and the enhanced multi-feature ensemble."""

from face_detection_recognization_pca_tpu.models.eigenfaces import (  # noqa: F401
    EigenfacesModel,
    extract_features,
    recognize,
    train_v1,
    train_v2,
)

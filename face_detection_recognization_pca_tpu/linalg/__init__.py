"""Dense linear algebra on the MXU: PCA engines and standardization."""

from face_detection_recognization_pca_tpu.linalg.pca import (  # noqa: F401
    PCAResult,
    pca_fit,
    scaled_pca,
    snapshot_pca,
)
from face_detection_recognization_pca_tpu.linalg.standardize import (  # noqa: F401
    ScalerParams,
    scaler_fit,
    scaler_transform,
)

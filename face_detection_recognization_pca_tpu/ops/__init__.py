"""Fused XLA/Pallas compute ops: preprocessing, matching, similarity, NMS."""

from face_detection_recognization_pca_tpu.ops.color import (  # noqa: F401
    bgr_to_gray,
    bgr_to_gray_exact,
    rgb_to_gray,
)
from face_detection_recognization_pca_tpu.ops.resize import (  # noqa: F401
    resize_bilinear,
    resize_bilinear_u8_exact,
)
from face_detection_recognization_pca_tpu.ops.similarity import (  # noqa: F401
    cosine_gallery,
    cosine_similarity,
)
from face_detection_recognization_pca_tpu.ops.preprocess import (  # noqa: F401
    preprocess_crop,
    preprocess_crops,
)

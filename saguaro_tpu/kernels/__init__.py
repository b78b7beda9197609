from saguaro_tpu.kernels.maxproj import max_project, max_project_batch
from saguaro_tpu.kernels.resample import (
    lanczos_resize,
    lanczos_resize_batch,
    lanczos_matrices,
)
from saguaro_tpu.kernels.illum import illum_correct, estimate_illumination
from saguaro_tpu.kernels.qc import qc_metrics, qc_metrics_batch, radial_power_spectrum
from saguaro_tpu.kernels.flow_ode import (
    compute_masks,
    compute_masks_batch,
    follow_flows,
    follow_flows_pointer,
)
from saguaro_tpu.kernels.crops import extract_crops, label_centroids
from saguaro_tpu.kernels.glcm import haralick_features, object_glcm
from saguaro_tpu.kernels.segment_reduce import (
    correlation_features,
    intensity_features,
    shape_features,
)
from saguaro_tpu.kernels.zernike import zernike_features

__all__ = [
    "max_project",
    "max_project_batch",
    "lanczos_resize",
    "lanczos_resize_batch",
    "lanczos_matrices",
    "illum_correct",
    "estimate_illumination",
    "qc_metrics",
    "qc_metrics_batch",
    "radial_power_spectrum",
    "compute_masks",
    "compute_masks_batch",
    "follow_flows",
    "follow_flows_pointer",
    "extract_crops",
    "label_centroids",
    "haralick_features",
    "object_glcm",
    "correlation_features",
    "intensity_features",
    "shape_features",
    "zernike_features",
]

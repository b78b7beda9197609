from saguaro_tpu.kernels.maxproj import max_project, max_project_batch
from saguaro_tpu.kernels.resample import (
    lanczos_resize,
    lanczos_resize_batch,
    lanczos_matrices,
)
from saguaro_tpu.kernels.illum import illum_correct
from saguaro_tpu.kernels.qc import qc_metrics, radial_power_spectrum

__all__ = [
    "max_project",
    "max_project_batch",
    "lanczos_resize",
    "lanczos_resize_batch",
    "lanczos_matrices",
    "illum_correct",
    "qc_metrics",
    "radial_power_spectrum",
]

from saguaro_tpu.models.cellpose import (
    CellposeUNet,
    CellposeConfig,
    init_cellpose,
    segment_image,
    segment_tiles,
)
from saguaro_tpu.models.xgb import XGBEnsemble

__all__ = [
    "CellposeUNet",
    "CellposeConfig",
    "init_cellpose",
    "segment_image",
    "segment_tiles",
    "XGBEnsemble",
]

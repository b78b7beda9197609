"""Cellpose checkpoint conversion: CPnet torch state dict -> CellposeUNet.

The reference's segmentation numerics are defined by the cellpose
'nuclei' checkpoint (`models.CellposeModel(model_type='nuclei')`,
Cellpose_GPU_s3fs.py:28,108). CellposeUNet (models/cellpose.py) is
graph-exact to CPnet, so conversion is a pure renaming + layout
transpose, enumerated here key for key. Activation parity against a
torch CPnet mirror is proven in tests/test_weights.py (<=1e-5).

Checkpoint facts (for when a file is available; no egress here):
* cellpose model files are torch ``state_dict`` saves loadable with
  ``torch.load(path, map_location='cpu')``;
* the 'nuclei' model: nbase=[2, 32, 64, 128, 256], nout=3, sz=3,
  diam_mean=17.0 (cyto* models use 30.0) — pass
  ``CellposeConfig(diam_mean=17.0)`` when loading it;
* newer files carry extra scalar buffers (``diam_mean``,
  ``diam_labels``) — ignored by the map (reported as UNUSED).
"""

from __future__ import annotations

import numpy as np

from saguaro_tpu.models.cellpose import CellposeConfig
from saguaro_tpu.models.weights import convert_state_dict, linear_torch_to_flax

__all__ = [
    "cellpose_name_map",
    "convert_cellpose_state_dict",
    "load_torch_cellpose",
]


def cellpose_name_map(config: CellposeConfig = CellposeConfig()) -> dict[str, str]:
    """{flax flat key: CPnet state-dict key} for every parameter.

    CPnet key anatomy (cellpose resnet_torch naming):
      downsample.down.res_down_{n}.proj.{0,1}       batchconv0: BN, Conv1x1
      downsample.down.res_down_{n}.conv.conv_{t}.{0,2}  batchconv: BN, Conv3x3
      upsample.up.res_up_{n}.proj.{0,1}
      upsample.up.res_up_{n}.conv.conv_0.{0,2}
      upsample.up.res_up_{n}.conv.conv_{1..3}.conv.{0,2} + .full (style Dense)
      output.{0,2}                                  batchconv head
    """
    m: dict[str, str] = {}

    def bn(flax_prefix: str, torch_prefix: str) -> None:
        m[f"params/{flax_prefix}/scale"] = f"{torch_prefix}.weight"
        m[f"params/{flax_prefix}/bias"] = f"{torch_prefix}.bias"
        m[f"batch_stats/{flax_prefix}/mean"] = f"{torch_prefix}.running_mean"
        m[f"batch_stats/{flax_prefix}/var"] = f"{torch_prefix}.running_var"

    def conv(flax_prefix: str, torch_prefix: str) -> None:
        m[f"params/{flax_prefix}/kernel"] = f"{torch_prefix}.weight"
        m[f"params/{flax_prefix}/bias"] = f"{torch_prefix}.bias"

    for n in range(len(config.features)):
        fd, td = f"res_down_{n}", f"downsample.down.res_down_{n}"
        bn(f"{fd}/proj/bn", f"{td}.proj.0")
        conv(f"{fd}/proj/conv", f"{td}.proj.1")
        for t in range(4):
            bn(f"{fd}/conv_{t}/bn", f"{td}.conv.conv_{t}.0")
            conv(f"{fd}/conv_{t}/conv", f"{td}.conv.conv_{t}.2")

        fu, tu = f"res_up_{n}", f"upsample.up.res_up_{n}"
        bn(f"{fu}/proj/bn", f"{tu}.proj.0")
        conv(f"{fu}/proj/conv", f"{tu}.proj.1")
        bn(f"{fu}/conv_0/bn", f"{tu}.conv.conv_0.0")
        conv(f"{fu}/conv_0/conv", f"{tu}.conv.conv_0.2")
        for t in range(1, 4):
            bn(f"{fu}/conv_{t}/conv/bn", f"{tu}.conv.conv_{t}.conv.0")
            conv(f"{fu}/conv_{t}/conv/conv", f"{tu}.conv.conv_{t}.conv.2")
            m[f"params/{fu}/conv_{t}/full/kernel"] = f"{tu}.conv.conv_{t}.full.weight"
            m[f"params/{fu}/conv_{t}/full/bias"] = f"{tu}.conv.conv_{t}.full.bias"

    bn("output/bn", "output.0")
    conv("output/conv", "output.2")
    return m


def convert_cellpose_state_dict(
    state_dict: dict[str, np.ndarray],
    flax_variables: dict,
    config: CellposeConfig = CellposeConfig(),
) -> dict:
    """CPnet torch state dict -> CellposeUNet variables tree.

    Dense (style ``full``) weights are explicitly transposed: several are
    square (256x256 in res_up_3), so the rank-based fallback would
    silently skip the transpose.
    """
    name_map = cellpose_name_map(config)
    transforms = {
        fk: linear_torch_to_flax for fk in name_map if fk.endswith("full/kernel")
    }
    return convert_state_dict(state_dict, flax_variables, name_map, transforms)


def load_torch_cellpose(
    path: str,
    flax_variables: dict,
    config: CellposeConfig = CellposeConfig(),
) -> dict:
    """Load a cellpose model FILE (torch save) and convert it.

    Handles both bare state dicts and {'state_dict'/'model': ...}
    wrappers; tensors are fetched through the storage layer so s3/gs
    paths work.
    """
    import io

    import torch

    from saguaro_tpu.io import storage

    blob = storage.read_bytes(path)
    obj = torch.load(io.BytesIO(blob), map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    sd = {
        k: v.detach().cpu().numpy()
        for k, v in obj.items()
        if hasattr(v, "detach")
    }
    return convert_cellpose_state_dict(sd, flax_variables, config)

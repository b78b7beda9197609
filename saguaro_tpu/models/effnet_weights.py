"""EfficientNetV2 checkpoint conversion: timm state dict -> EffNetV2.

The reference's embedding numerics come from
``timm/tf_efficientnetv2_l.in21k`` loaded via transformers AutoModel
(Cellpose_GPU_s3fs.py:27,109-110). EffNetV2 (models/effnetv2.py) is
graph-compatible with timm's efficientnetv2 (tf_ variant: TF SAME
padding = flax SAME, BN eps 1e-3, SE reduce = in_chs * se_ratio), so
conversion is renaming + conv transposes. Activation parity against a
torch mirror with timm naming is proven in tests/test_weights.py.

timm key anatomy:
  conv_stem / bn1                          stem
  blocks.{s}.{i}.conv + bn1                stage-0 fused, expand=1 (ConvBnAct)
  blocks.{s}.{i}.conv_exp + bn1, conv_pwl + bn2   fused, expand>1 (EdgeResidual)
  blocks.{s}.{i}.conv_pw + bn1, conv_dw + bn2,
                 se.conv_reduce/.conv_expand,
                 conv_pwl + bn3            MBConv (InvertedResidual)
  conv_head / bn2                          head (classifier unused)

transformers' TimmWrapperModel stores the same keys under a
``timm_model.`` prefix — stripped automatically.
"""

from __future__ import annotations

import numpy as np

from saguaro_tpu.models.effnetv2 import EFFNETV2_L, EffNetV2Config
from saguaro_tpu.models.weights import convert_state_dict

__all__ = ["effnet_name_map", "convert_effnet_state_dict", "load_torch_effnet"]

_PREFIXES = ("timm_model.", "module.", "model.")


def effnet_name_map(config: EffNetV2Config = EFFNETV2_L) -> dict[str, str]:
    """{flax flat key: timm key} for every parameter in the config.

    Flax keys follow linen auto-naming of models/effnetv2.py's compact
    modules (_ConvBNAct_0 stem, _FusedMBConv_i/_MBConv_j blocks,
    _ConvBNAct_1 head).
    """
    m: dict[str, str] = {}

    def bn(flax_prefix: str, torch_prefix: str) -> None:
        m[f"params/{flax_prefix}/scale"] = f"{torch_prefix}.weight"
        m[f"params/{flax_prefix}/bias"] = f"{torch_prefix}.bias"
        m[f"batch_stats/{flax_prefix}/mean"] = f"{torch_prefix}.running_mean"
        m[f"batch_stats/{flax_prefix}/var"] = f"{torch_prefix}.running_var"

    def convbnact(flax_prefix: str, conv_key: str, bn_key: str) -> None:
        m[f"params/{flax_prefix}/Conv_0/kernel"] = f"{conv_key}.weight"
        bn(f"{flax_prefix}/BatchNorm_0", bn_key)

    convbnact("_ConvBNAct_0", "conv_stem", "bn1")

    fused_i = mb_i = 0
    for s, spec in enumerate(config.stages):
        for i in range(spec.count):
            t = f"blocks.{s}.{i}"
            if spec.block == "fused":
                f = f"_FusedMBConv_{fused_i}"
                fused_i += 1
                if spec.expand == 1:
                    convbnact(f"{f}/_ConvBNAct_0", f"{t}.conv", f"{t}.bn1")
                else:
                    convbnact(f"{f}/_ConvBNAct_0", f"{t}.conv_exp", f"{t}.bn1")
                    convbnact(f"{f}/_ConvBNAct_1", f"{t}.conv_pwl", f"{t}.bn2")
            else:
                f = f"_MBConv_{mb_i}"
                mb_i += 1
                convbnact(f"{f}/_ConvBNAct_0", f"{t}.conv_pw", f"{t}.bn1")
                m[f"params/{f}/Conv_0/kernel"] = f"{t}.conv_dw.weight"
                bn(f"{f}/BatchNorm_0", f"{t}.bn2")
                if spec.se_ratio > 0:
                    m[f"params/{f}/_SE_0/Conv_0/kernel"] = f"{t}.se.conv_reduce.weight"
                    m[f"params/{f}/_SE_0/Conv_0/bias"] = f"{t}.se.conv_reduce.bias"
                    m[f"params/{f}/_SE_0/Conv_1/kernel"] = f"{t}.se.conv_expand.weight"
                    m[f"params/{f}/_SE_0/Conv_1/bias"] = f"{t}.se.conv_expand.bias"
                convbnact(f"{f}/_ConvBNAct_1", f"{t}.conv_pwl", f"{t}.bn3")

    convbnact("_ConvBNAct_1", "conv_head", "bn2")
    return m


def convert_effnet_state_dict(
    state_dict: dict[str, np.ndarray],
    flax_variables: dict,
    config: EffNetV2Config = EFFNETV2_L,
) -> dict:
    """timm (or transformers TimmWrapper) state dict -> EffNetV2 variables."""
    for prefix in _PREFIXES:
        if any(k.startswith(prefix) for k in state_dict):
            state_dict = {
                (k[len(prefix):] if k.startswith(prefix) else k): v
                for k, v in state_dict.items()
            }
    return convert_state_dict(state_dict, flax_variables, effnet_name_map(config))


def load_torch_effnet(
    path: str,
    flax_variables: dict,
    config: EffNetV2Config = EFFNETV2_L,
) -> dict:
    """Load a timm/transformers checkpoint FILE (torch save) and convert."""
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
    return convert_effnet_state_dict(sd, flax_variables, config)

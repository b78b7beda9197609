"""EfficientNetV2 feature extractor, flax/TPU-native.

Replaces the reference's HuggingFace ``timm/tf_efficientnetv2_l.in21k``
pooler-output embedding engine (Cellpose_GPU_s3fs.py:27,109-110,191-194;
SURVEY.md E2): per 200x200 masked cell crop, each channel is min-max scaled
to 8-bit, replicated to RGB, resized to the model resolution, and embedded
to a 1280-d vector.

Architecture follows the EfficientNetV2 paper family (fused-MBConv early
stages, MBConv+SE late stages, 1280-d head). Variant L matches the
reference's checkpoint shape: widths (32,64,96,192,224,384,640), depths
(4,7,7,10,19,25,7). BatchNorm runs in inference mode with stored
statistics so converted pretrained weights drop straight in
(models/effnet_weights.py maps a timm state dict onto this tree).

TPU notes: NHWC, bf16 activations, f32 statistics; everything static so a
whole (cells x channels) padded batch embeds as one jitted program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "EffNetV2Config",
    "EFFNETV2_S",
    "EFFNETV2_M",
    "EFFNETV2_L",
    "EffNetV2",
    "init_effnetv2",
    "fold_batchnorm",
    "preprocess_crops",
    "embed_crops",
]


@dataclass(frozen=True)
class StageSpec:
    block: str          # "fused" | "mbconv"
    expand: int
    kernel: int
    stride: int
    filters: int
    count: int
    se_ratio: float = 0.0


@dataclass(frozen=True)
class EffNetV2Config:
    stem_filters: int
    stages: tuple[StageSpec, ...]
    head_filters: int = 1280
    input_size: int = 480
    compute_dtype: str = "bfloat16"
    # Inference BN folding: BatchNorm (inference mode) is an affine with
    # fixed statistics, so it folds into the preceding conv's weights
    # (W' = W * gamma/sqrt(var+eps), b' = beta - mean*gamma/sqrt(var+eps)).
    # The unfolded graph pays a separate f32 elementwise pass per conv on
    # 100-600 MB activation tensors (profiled: stage-6 1x1 convs at
    # 23 TFLOP/s); folding lets XLA keep the conv+SiLU epilogue in bf16.
    # Weight trees convert with ``fold_batchnorm``.
    fold_bn: bool = False


EFFNETV2_S = EffNetV2Config(
    stem_filters=24,
    stages=(
        StageSpec("fused", 1, 3, 1, 24, 2),
        StageSpec("fused", 4, 3, 2, 48, 4),
        StageSpec("fused", 4, 3, 2, 64, 4),
        StageSpec("mbconv", 4, 3, 2, 128, 6, 0.25),
        StageSpec("mbconv", 6, 3, 1, 160, 9, 0.25),
        StageSpec("mbconv", 6, 3, 2, 256, 15, 0.25),
    ),
    input_size=384,
)

EFFNETV2_M = EffNetV2Config(
    stem_filters=24,
    stages=(
        StageSpec("fused", 1, 3, 1, 24, 3),
        StageSpec("fused", 4, 3, 2, 48, 5),
        StageSpec("fused", 4, 3, 2, 80, 5),
        StageSpec("mbconv", 4, 3, 2, 160, 7, 0.25),
        StageSpec("mbconv", 6, 3, 1, 176, 14, 0.25),
        StageSpec("mbconv", 6, 3, 2, 304, 18, 0.25),
        StageSpec("mbconv", 6, 3, 1, 512, 5, 0.25),
    ),
    input_size=480,
)

EFFNETV2_L = EffNetV2Config(
    stem_filters=32,
    stages=(
        StageSpec("fused", 1, 3, 1, 32, 4),
        StageSpec("fused", 4, 3, 2, 64, 7),
        StageSpec("fused", 4, 3, 2, 96, 7),
        StageSpec("mbconv", 4, 3, 2, 192, 10, 0.25),
        StageSpec("mbconv", 6, 3, 1, 224, 19, 0.25),
        StageSpec("mbconv", 6, 3, 2, 384, 25, 0.25),
        StageSpec("mbconv", 6, 3, 1, 640, 7, 0.25),
    ),
    input_size=480,
)


class _ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=self.fold_bn,
            dtype=self.dtype,
        )(x)
        if not self.fold_bn:
            x = nn.BatchNorm(
                use_running_average=True, dtype=jnp.float32, epsilon=1e-3
            )(x)
        # BN statistics/affine in f32, activations back to compute dtype:
        # leaving them f32 doubles inter-layer HBM traffic (profiled: the
        # 240x240 stem-area conv fusions ran at 15-27 TFLOP/s vs 150+ for
        # the bf16 mid-network)
        return (nn.silu(x) if self.act else x).astype(self.dtype)


class _SE(nn.Module):
    in_filters: int
    se_filters: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mean=None):
        # ``mean``: optionally precomputed (N, 1, 1, C) squeeze input
        # (a fused depthwise formulation can emit it for free)
        if mean is None:
            mean = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = nn.Conv(self.se_filters, (1, 1), dtype=jnp.float32)(mean)
        s = nn.silu(s)
        s = nn.Conv(self.in_filters, (1, 1), dtype=jnp.float32)(s)
        return x * jax.nn.sigmoid(s).astype(x.dtype)


class _DepthwiseSiluConv(nn.Module):
    """Depthwise 3x3 stride-1 SAME conv + bias + SiLU (+ SE mean).

    Drop-in for the folded-BN ``nn.Conv(feature_group_count) -> silu``
    pair in _MBConv — same param tree (``kernel``/``bias`` under the
    module name, shapes/init matching nn.Conv), so ``fold_batchnorm``
    trees apply unchanged.

    A VMEM-resident Pallas depthwise kernel (+SE-mean fusion) was built
    and PRUNED in r5: standalone it beat XLA's grouped-conv lowering
    (4-9 vs ~6.5 ms/call), but the INTEGRATED model regressed embed
    1.125 -> 2.81 s/site — the custom-call boundaries break XLA's
    layout/fusion choices around the 57 dispatch sites (BENCH.md r3
    handoff; kernel in git history at tag pre-r5-prune if ever revisited).
    Returns (y, se_mean) where se_mean is (N, 1, 1, C) f32 when a fused
    formulation provides it, or None (SE recomputes the mean)."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 1, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        import os

        if os.environ.get("SAGUARO_DW_TAPS"):
            # pure-XLA formulation of the same math: 9 shifted
            # multiply-adds on the zero-padded input, f32 accumulation,
            # one bf16 round (stays inside XLA's fusion domain — no
            # custom-call boundaries; A/B'd vs the grouped-conv
            # lowering by benchmarks/bench_effnet_ab.py)
            n, h, ww, c = x.shape
            xp = jnp.pad(
                x.astype(self.dtype), ((0, 0), (1, 1), (1, 1), (0, 0))
            )
            acc = None
            for dh in range(3):
                for dw in range(3):
                    tap = xp[:, dh : dh + h, dw : dw + ww, :].astype(
                        jnp.float32
                    ) * kernel[dh, dw, 0]
                    acc = tap if acc is None else acc + tap
            y = acc.astype(self.dtype) + bias.astype(self.dtype)
            return nn.silu(y).astype(self.dtype), None
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.features,
        )
        y = nn.silu(y + bias.astype(self.dtype)).astype(self.dtype)
        return y, None


class _FusedMBConv(nn.Module):
    spec: StageSpec
    stride: int
    dtype: jnp.dtype = jnp.bfloat16
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        mid = inp * self.spec.expand
        h = x
        if self.spec.expand != 1:
            h = _ConvBNAct(mid, self.spec.kernel, self.stride, dtype=self.dtype,
                           fold_bn=self.fold_bn)(h)
            h = _ConvBNAct(self.spec.filters, 1, 1, act=False, dtype=self.dtype,
                           fold_bn=self.fold_bn)(h)
        else:
            h = _ConvBNAct(self.spec.filters, self.spec.kernel, self.stride,
                           dtype=self.dtype, fold_bn=self.fold_bn)(h)
        if self.stride == 1 and inp == self.spec.filters:
            h = h + x
        return h


class _MBConv(nn.Module):
    # A whole-block VMEM-resident Pallas MBConv (expand 1x1 + dw 3x3 +
    # SE + project 1x1 in one HBM pass) was built in r4 and PRUNED in
    # r5: its integrated A/B never cleared the bar (the dw-only variant
    # measured 2.81 vs 1.125 s/site embed — custom-call boundaries cost
    # more than the fusion saves; BENCH.md r3 handoff). Kernel + param
    # shims live in git history (tag pre-r5-prune) if embed's XLA conv ceiling
    # ever justifies revisiting.
    spec: StageSpec
    stride: int
    dtype: jnp.dtype = jnp.bfloat16
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        inp = x.shape[-1]
        mid = inp * self.spec.expand
        h = _ConvBNAct(mid, 1, 1, dtype=self.dtype, fold_bn=self.fold_bn)(x)
        # depthwise: folded-BN stride-1 3x3 goes through the dispatching
        # module (same "Conv_0" param tree); stride-2 / unfolded keep the
        # XLA grouped conv (2 of EffNetV2-L's 61 MBConvs are stride-2)
        se_mean = None
        if self.fold_bn and self.stride == 1 and self.spec.kernel == 3:
            h, se_mean = _DepthwiseSiluConv(mid, dtype=self.dtype, name="Conv_0")(h)
        else:
            h = nn.Conv(
                mid,
                (self.spec.kernel, self.spec.kernel),
                strides=(self.stride, self.stride),
                padding="SAME",
                feature_group_count=mid,
                use_bias=self.fold_bn,
                dtype=self.dtype,
            )(h)
            if not self.fold_bn:
                h = nn.BatchNorm(
                    use_running_average=True, dtype=jnp.float32, epsilon=1e-3
                )(h)
            h = nn.silu(h).astype(self.dtype)
        if self.spec.se_ratio > 0:
            h = _SE(mid, max(1, int(inp * self.spec.se_ratio)), self.dtype)(h, se_mean)
        h = _ConvBNAct(self.spec.filters, 1, 1, act=False, dtype=self.dtype,
                       fold_bn=self.fold_bn)(h)
        if self.stride == 1 and inp == self.spec.filters:
            h = h + x
        return h


class EffNetV2(nn.Module):
    """(B, H, W, 3) -> (B, 1280) pooled features (the 'pooler_output')."""

    config: EffNetV2Config = EFFNETV2_L

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        fold = cfg.fold_bn
        x = x.astype(dtype)
        x = _ConvBNAct(cfg.stem_filters, 3, 2, dtype=dtype, fold_bn=fold)(x)
        for spec in cfg.stages:
            for i in range(spec.count):
                stride = spec.stride if i == 0 else 1
                if spec.block == "fused":
                    x = _FusedMBConv(spec, stride, dtype, fold)(x)
                else:
                    x = _MBConv(spec, stride, dtype, fold)(x)
        x = _ConvBNAct(cfg.head_filters, 1, 1, dtype=dtype, fold_bn=fold)(x)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


def fold_batchnorm(variables) -> dict:
    """Fold inference-mode BatchNorms into their preceding convolutions.

    Input: an unfolded EffNetV2 variable tree ({'params', 'batch_stats'});
    output: a tree for the SAME architecture built with
    ``fold_bn=True`` (convs gain a bias, BatchNorm nodes disappear):

        W' = W * gamma / sqrt(var + eps)       (per output channel)
        b' = beta - mean * gamma / sqrt(var + eps)

    Every BatchNorm in this family normalizes the conv that shares its
    scope (``Conv_0`` + ``BatchNorm_0`` siblings inside _ConvBNAct and
    _MBConv); SE convs carry their own bias and no BN. eps matches the
    module's 1e-3. Exact in f32; under bf16 compute the folded program
    rounds once where the unfolded rounded twice (tested in
    tests/test_weights.py).

    The arithmetic runs wherever the inputs live: device trees stay
    device-resident (folding a host/numpy tree and feeding it to a jit
    would re-upload every leaf on EVERY call — through this
    environment's relay that is ~0.5 GB per embed chunk).
    """
    def walk(p: dict, s: dict) -> dict:
        out = {}
        for key, val in p.items():
            if key.startswith("BatchNorm"):
                continue  # consumed by the sibling conv below
            if key.startswith("Conv") and "BatchNorm_0" in p:
                bn_p, bn_s = p["BatchNorm_0"], s["BatchNorm_0"]
                scale = bn_p["scale"] / jnp.sqrt(bn_s["var"] + 1e-3)
                out[key] = {
                    "kernel": val["kernel"] * scale,          # HWIO: out last
                    "bias": bn_p["bias"] - bn_s["mean"] * scale,
                }
            elif isinstance(val, dict):
                out[key] = walk(val, s.get(key, {}))
            else:
                out[key] = val
        return out

    # ONE jitted program (vs ~6k eager dispatches for L's leaf count —
    # material through a remote-dispatch relay)
    return jax.jit(
        lambda v: {"params": walk(dict(v["params"]), dict(v["batch_stats"]))}
    )(variables)


def fold_rgb_stem(variables) -> dict:
    """Fold the stem conv's RGB input weights into ONE channel.

    The embed pipeline replicates each GRAY crop to RGB
    (Cellpose_GPU_s3fs.py:177-182), so the stem conv sees three identical
    channels: conv(x,x,x) = (W_r + W_g + W_b) * x exactly. Summing the
    stem kernel over its input-channel axis lets the network take
    (N, H, W, 1) inputs — the (chunk, 480, 480, 3) replicated input
    tensor never materializes (2/3 less stem-input HBM traffic and
    resize/normalize output). Exact in f32; under bf16 compute the
    pre-summed weight rounds once where the conv summed three rounded
    products (same noise class as fold_batchnorm). Idempotent: a tree
    whose stem is already single-channel is returned unchanged.
    """
    params = variables["params"]
    stem = params["_ConvBNAct_0"]["Conv_0"]["kernel"]
    if stem.shape[2] == 1:
        return variables
    new_params = dict(params)
    stem_scope = dict(new_params["_ConvBNAct_0"])
    conv = dict(stem_scope["Conv_0"])
    conv["kernel"] = jnp.sum(stem, axis=2, keepdims=True)
    stem_scope["Conv_0"] = conv
    new_params["_ConvBNAct_0"] = stem_scope
    out = dict(variables)
    out["params"] = new_params
    return out


def init_effnetv2(config: EffNetV2Config = EFFNETV2_L, seed: int = 0, init_size: int | None = None):
    """Initialize (model, variables). ``init_size`` can be small: the net is
    fully convolutional, so parameter shapes are resolution-independent."""
    model = EffNetV2(config)
    size = init_size or 64
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x)
    return model, variables


# ----------------------------------------------------------------------------
# Crop preprocessing — the reference's scale_to_8bit + RGB + processor chain
# ----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("out_size", "n_channels"))
def preprocess_crops(
    crops: jax.Array, out_size: int = 480, n_channels: int = 3
) -> jax.Array:
    """(N, H, W) single-channel crops -> (N, out, out, n_channels)
    model inputs (``n_channels=1`` skips the RGB replication for a
    ``fold_rgb_stem``-folded network — same values, 1/3 the tensor).

    Transcription of the reference's embed preprocessing
    (Cellpose_GPU_s3fs.py:34-43,177-182,191-194): per crop min-max scale
    to [0, 255] quantized to uint8 steps (scale_to_8bit), replicate to
    RGB, then the AutoImageProcessor transform for
    ``timm/tf_efficientnetv2_l.in21k`` — the timm pretrained_cfg test
    transform: bicubic resize to 480 (crop_pct 1.0 -> no crop for square
    crops) + Normalize(mean=0.5, std=0.5).

    The resize reproduces PIL's uint8 pipeline bit-for-bit (to the
    rounding tie): PIL resamples HORIZONTALLY first, clamps+rounds the
    intermediate to uint8, then resamples vertically (ImagingResample's
    two-pass fixed-point path) — bicubic overshoot on textured crops
    makes the intermediate clamp visible (up to ~21/255 vs a pure float
    resize), so the float shortcut was a real embedding shift
    (VERDICT r2 weak #3). Pinned against a PIL oracle in
    tests/test_effnet_preprocess.py.
    """
    from saguaro_tpu.kernels.resample import bicubic_axis_matrix

    x = crops.astype(jnp.float32)
    mn = jnp.min(x, axis=(1, 2), keepdims=True)
    mx = jnp.max(x, axis=(1, 2), keepdims=True)
    flat = mx == mn
    scaled = jnp.where(flat, 0.0, 255.0 * (x - mn) / jnp.where(flat, 1.0, mx - mn))
    scaled = jnp.floor(scaled)  # uint8 truncation parity
    n, h, w = crops.shape
    # PIL's exact bicubic taps as (out, in) matrices -> the resize is two
    # MXU einsums instead of gathers (jax.image.resize held ~244 ms/batch
    # of the embed profile as gather fusions); horizontal first, uint8
    # round+clip between passes, like ImagingResample
    wh = jnp.asarray(bicubic_axis_matrix(w, out_size))  # (out, w)
    wv = jnp.asarray(bicubic_axis_matrix(h, out_size))  # (out, h)
    horiz = jnp.einsum(
        "nhw,ow->nho", scaled, wh,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    horiz = jnp.round(jnp.clip(horiz, 0.0, 255.0))
    resized = jnp.einsum(
        "nho,Oh->nOo", horiz, wv,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    resized = jnp.round(jnp.clip(resized, 0.0, 255.0))
    normed = (resized / 255.0 - 0.5) / 0.5
    if n_channels == 1:
        return normed[..., None]
    return jnp.repeat(normed[..., None], n_channels, axis=-1)


def embed_crops(apply_fn, variables, crops: jax.Array, out_size: int = 480) -> jax.Array:
    """(N, H, W) crops -> (N, 1280) embeddings, one fused program."""
    return apply_fn(variables, preprocess_crops(crops, out_size))

"""Cellpose-style segmentation network, TPU-first.

Replaces the reference's Cellpose engine (`models.CellposeModel(
model_type='nuclei').eval(img, diameter=100)`, Cellpose_GPU_s3fs.py:108,143;
SURVEY.md E1). The network predicts, per pixel, a 2-D flow field pointing
toward the cell center plus a cell-probability logit; instance masks are
recovered by integrating pixels along the flow (kernels/flow_ode.py).

Design notes (tpu-first, not a torch translation):

* NHWC layout end-to-end; convs land on the MXU via XLA.
* The network is GRAPH-EXACT to cellpose's CPnet (pre-activation
  BN->ReLU->Conv "batchconv" blocks, additive residual projections,
  4 scales [32, 64, 128, 256], a global style vector = L2-normalized GAP
  of the bottleneck injected via per-channel Dense biases in every
  decoder conv) so pretrained cellpose checkpoints ('nuclei') convert
  weight-for-weight: models/cellpose_weights.py holds the name map and
  tests/test_weights.py proves activation parity against a torch mirror.
* BatchNorm runs in inference mode with stored statistics so a converter
  can populate parameters from a pretrained cellpose checkpoint.
  NB the 'nuclei' checkpoint's diam_mean is 17 px (cyto models use 30);
  pass the checkpoint's value via CellposeConfig(diam_mean=...).
* Static shapes everywhere: inference is tiled (fixed tile size, overlap
  averaged with a taper window), diameter handling is a bilinear rescale
  to the 30-px training diameter before the network and a rescale of the
  flows after.
* bf16 activations on TPU with f32 params/outputs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "CellposeConfig",
    "CellposeUNet",
    "init_cellpose",
    "segment_tiles",
    "segment_image",
    "train_step",
    "flow_loss",
]


@dataclass(frozen=True)
class CellposeConfig:
    n_channels: int = 2            # cellpose convention: [primary, nuclear/zero]
    features: tuple[int, ...] = (32, 64, 128, 256)
    diam_mean: float = 30.0        # training diameter (px)
    tile: int = 224                # inference tile size
    tile_overlap: float = 0.1
    cellprob_threshold: float = 0.0
    flow_iters: int = 200          # Euler steps for mask recovery
    compute_dtype: str = "bfloat16"


class _BatchConv(nn.Module):
    """cellpose ``batchconv`` (relu=True) / ``batchconv0`` (relu=False):
    BatchNorm(in) [-> ReLU] -> Conv(k, SAME, bias)."""

    features: int
    kernel: int = 3
    relu: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.BatchNorm(use_running_average=True, dtype=jnp.float32, name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding="SAME",
            dtype=self.dtype,
            name="conv",
        )(x.astype(self.dtype))


class _ResDown(nn.Module):
    """cellpose ``resdown``: x = proj(x) + c1(c0(x)); x = x + c3(c2(x))."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        proj = _BatchConv(self.features, 1, relu=False, dtype=self.dtype, name="proj")(x)
        h = _BatchConv(self.features, dtype=self.dtype, name="conv_0")(x)
        h = _BatchConv(self.features, dtype=self.dtype, name="conv_1")(h)
        x = proj + h
        h = _BatchConv(self.features, dtype=self.dtype, name="conv_2")(x)
        h = _BatchConv(self.features, dtype=self.dtype, name="conv_3")(h)
        return x + h


class _StyleConv(nn.Module):
    """cellpose ``batchconvstyle``: conv(x [+ y] + Dense(style))."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, style, x, y=None):
        if y is not None:
            x = x + y
        feat = nn.Dense(self.features, dtype=jnp.float32, name="full")(style)
        x = x + feat[:, None, None, :].astype(x.dtype)
        return _BatchConv(self.features, dtype=self.dtype, name="conv")(x)


class _ResUp(nn.Module):
    """cellpose ``resup``: x = proj(x) + c1(style, c0(x), y=skip);
    x = x + c3(style, c2(style, x))."""

    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, y, style):
        proj = _BatchConv(self.features, 1, relu=False, dtype=self.dtype, name="proj")(x)
        h = _BatchConv(self.features, dtype=self.dtype, name="conv_0")(x)
        h = _StyleConv(self.features, dtype=self.dtype, name="conv_1")(style, h, y=y)
        x = proj + h
        h = _StyleConv(self.features, dtype=self.dtype, name="conv_2")(style, x)
        h = _StyleConv(self.features, dtype=self.dtype, name="conv_3")(style, h)
        return x + h


class CellposeUNet(nn.Module):
    """(B, H, W, C_in) -> (B, H, W, 3): [flow_y, flow_x, cellprob logit].

    Graph-exact flax expression of cellpose's CPnet
    (nbase=[C_in, *features], sz=3, residual_on, style_on): encoder
    ``res_down_n`` with 2x maxpool between levels, style = L2-normalized
    global average of the bottleneck, decoder ``res_up_n`` over nearest
    2x upsampling with additive skips, and a final batchconv head
    ``output`` to 3 channels. Weight name map:
    models/cellpose_weights.py (cellpose 'nuclei' et al.).
    """

    config: CellposeConfig = CellposeConfig()

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        nbase = cfg.features
        h = x.astype(dtype)

        xd = []
        for n, f in enumerate(nbase):
            if n > 0:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = _ResDown(f, dtype, name=f"res_down_{n}")(h)
            xd.append(h)

        # make_style: GAP of the bottleneck, x / sqrt(sum(x^2)) (CPnet exact)
        style = jnp.mean(xd[-1].astype(jnp.float32), axis=(1, 2))
        style = style / jnp.sqrt(
            jnp.maximum(jnp.sum(style**2, axis=1, keepdims=True), 1e-12)
        )

        # top resup consumes the bottleneck twice (x and skip), no upsample
        h = _ResUp(nbase[-1], dtype, name=f"res_up_{len(nbase) - 1}")(
            xd[-1], xd[-1], style
        )
        for n in range(len(nbase) - 2, -1, -1):
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), method="nearest")
            h = _ResUp(nbase[n], dtype, name=f"res_up_{n}")(h, xd[n], style)

        out = _BatchConv(3, 1, dtype=jnp.float32, name="output")(h.astype(jnp.float32))
        return out


def init_cellpose(config: CellposeConfig = CellposeConfig(), seed: int = 0):
    """Initialize (model, variables) with the tile shape."""
    model = CellposeUNet(config)
    rng = jax.random.PRNGKey(seed)
    x = jnp.zeros((1, config.tile, config.tile, config.n_channels), jnp.float32)
    variables = model.init(rng, x)
    return model, variables


# ----------------------------------------------------------------------------
# Tiled inference
# ----------------------------------------------------------------------------


def _taper(tile: int) -> np.ndarray:
    """Smooth window weighting tile interiors over their borders."""
    ramp = np.minimum(np.arange(tile) + 1, tile - np.arange(tile))
    ramp = np.minimum(ramp / (0.1 * tile + 1), 1.0)
    return (ramp[:, None] * ramp[None, :]).astype(np.float32)


def convert_input(images: jax.Array, nchan: int = 2) -> jax.Array:
    """Transcription of cellpose's default channel selection.

    The reference calls ``cell_model.eval(image_4ch, diameter=100)`` with
    NO channels argument (Cellpose_GPU_s3fs.py:143), so cellpose's
    ``transforms.convert_image(x, channels=None, nchan=2)`` applies its
    default: channels already last (``move_min_dim`` keeps the smallest
    axis last), and with more planes than the network's ``nchan=2`` it
    warns "more than 2 channels given ... just using first 2 channels"
    and slices ``x = x[..., :nchan]``; with fewer it zero-pads up to
    nchan. No averaging, no channel arithmetic — the net sees the first
    two raw channels (cellpose transforms.convert_image, channels-is-None
    branch). Works on (..., H, W, C).
    """
    c = images.shape[-1]
    x = images[..., :nchan].astype(jnp.float32)
    if c < nchan:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, nchan - c)]
        x = jnp.pad(x, pad)
    return x


def normalize_input(x: jax.Array, spatial_axes: tuple[int, ...]) -> jax.Array:
    """Transcription of cellpose ``transforms.normalize_img``: per channel
    (channel = last axis), ``(x - p1) / (p99 - p1)`` with np.percentile's
    linear interpolation — unless the channel is flat
    (``p99 - p1 <= 1e-3``), which cellpose zeroes outright. Cellpose
    applies this at the ORIGINAL resolution, before the diameter rescale
    (models._run_cp normalizes, then resizes), so callers must too.
    """
    lo = jnp.percentile(x, 1.0, axis=spatial_axes, keepdims=True)
    hi = jnp.percentile(x, 99.0, axis=spatial_axes, keepdims=True)
    return jnp.where(hi - lo > 1e-3, (x - lo) / jnp.maximum(hi - lo, 1e-6), 0.0)


@partial(jax.jit, static_argnames=("apply_fn",))
def segment_tiles(apply_fn, variables, tiles: jax.Array) -> jax.Array:
    """Run the network over a (N, tile, tile, C) batch of tiles."""
    return apply_fn(variables, tiles)


def _tile_grid(size: int, tile: int, overlap: float) -> tuple[int, ...]:
    """Start offsets covering [0, size) with ~overlap fraction of overlap."""
    if size <= tile:
        return (0,)
    stride = max(1, int(tile * (1 - overlap)))
    starts = list(range(0, size - tile + 1, stride))
    if starts[-1] != size - tile:
        starts.append(size - tile)
    return tuple(starts)


@partial(
    jax.jit,
    static_argnames=("apply_fn", "net_hw", "tile", "ys", "xs", "out_hw"),
)
def _segment_full(apply_fn, variables, image, net_hw, tile, ys, xs, out_hw):
    """ONE device program: resize -> normalize -> tile -> network -> taper
    merge (-> optional resize back). All slices static, so the whole
    full-image pass is a single dispatch — no host round-trips per tile.
    """
    h1, w1 = net_hw
    c = image.shape[-1]
    # cellpose order: normalize at ORIGINAL resolution, THEN rescale
    # (models._run_cp: normalize_img -> resize_image)
    x = normalize_input(image.astype(jnp.float32), spatial_axes=(0, 1))
    x = jax.image.resize(x, (h1, w1, c), method="bilinear")

    hp = max(h1, tile)
    wp = max(w1, tile)
    x = jnp.pad(x, ((0, hp - h1), (0, wp - w1), (0, 0)))

    tiles = jnp.stack([x[y : y + tile, xx : xx + tile] for y in ys for xx in xs])
    out = apply_fn(variables, tiles)  # (N, tile, tile, 3)

    win = jnp.asarray(_taper(tile))[:, :, None]
    acc = jnp.zeros((hp, wp, 3), jnp.float32)
    wacc = jnp.zeros((hp, wp, 1), jnp.float32)
    k = 0
    for y in ys:
        for xx in xs:
            acc = acc.at[y : y + tile, xx : xx + tile].add(out[k] * win)
            wacc = wacc.at[y : y + tile, xx : xx + tile].add(win)
            k += 1
    merged = (acc / jnp.maximum(wacc, 1e-6))[:h1, :w1]

    if out_hw is not None and out_hw != (h1, w1):
        merged = jax.image.resize(merged, (*out_hw, 3), method="bilinear")
    flows = jnp.moveaxis(merged[:, :, :2], -1, 0)
    return flows, merged[:, :, 2]


@partial(
    jax.jit,
    static_argnames=("apply_fn", "net_hw", "tile", "ys", "xs", "out_hw", "n_seg"),
)
def _segment_full_batch(
    apply_fn, variables, images, net_hw, tile, ys, xs, out_hw, n_seg=None
):
    """Batched full-image pass: (B, H, W, C) -> (B, 2, h, w), (B, h, w).

    Tiles from ALL images in the batch feed the network as one
    (B*N_tiles, tile, tile, C) batch — the MXU sees a big batch instead of
    the per-image trickle, which is where single-chip throughput comes
    from for small (rescaled) fields.

    With ``n_seg`` set, ``images`` is the RAW multichannel batch (any
    dtype): the segmentation input is built on device by cellpose's
    default channel conversion (``convert_input``: first 2 raw channels,
    zero-padded — the reference's no-channels-arg eval at
    Cellpose_GPU_s3fs.py:143), so the host ships the raw uint16 data once
    and nothing else. ``n_seg`` is the network channel count (2).
    """
    b = images.shape[0]
    h1, w1 = net_hw
    if n_seg is not None:
        images = convert_input(images, nchan=n_seg)
    c = images.shape[-1]
    # cellpose order: normalize at ORIGINAL resolution, THEN rescale
    x = normalize_input(images.astype(jnp.float32), spatial_axes=(1, 2))
    x = jax.image.resize(x, (b, h1, w1, c), method="bilinear")

    hp, wp = max(h1, tile), max(w1, tile)
    x = jnp.pad(x, ((0, 0), (0, hp - h1), (0, wp - w1), (0, 0)))

    tiles = jnp.stack(
        [x[:, y : y + tile, xx : xx + tile] for y in ys for xx in xs]
    )  # (N, B, t, t, C)
    n = tiles.shape[0]
    out = apply_fn(variables, tiles.reshape(n * b, tile, tile, c))
    out = out.reshape(n, b, tile, tile, 3)

    win = jnp.asarray(_taper(tile))[None, :, :, None]
    acc = jnp.zeros((b, hp, wp, 3), jnp.float32)
    wacc = jnp.zeros((b, hp, wp, 1), jnp.float32)
    k = 0
    for y in ys:
        for xx in xs:
            acc = acc.at[:, y : y + tile, xx : xx + tile].add(out[k] * win)
            wacc = wacc.at[:, y : y + tile, xx : xx + tile].add(win)
            k += 1
    merged = (acc / jnp.maximum(wacc, 1e-6))[:, :h1, :w1]
    if out_hw is not None and out_hw != (h1, w1):
        merged = jax.image.resize(merged, (b, *out_hw, 3), method="bilinear")
    flows = jnp.moveaxis(merged[..., :2], -1, 1)  # (B, 2, h, w)
    return flows, merged[..., 2]


def segment_image_batch(
    apply_fn,
    variables,
    images,
    config: CellposeConfig = CellposeConfig(),
    diameter: float | None = None,
    at_network_resolution: bool = False,
    n_seg: int | None = None,
):
    """Batched variant of segment_image over (B, H, W, C).

    ``n_seg``: build the segmentation input on device from the first
    n_seg raw channels (ship raw data, not preprocessed floats).
    """
    b, h0, w0 = images.shape[:3]
    h1, w1 = _network_shape(h0, w0, config, diameter)
    t = config.tile
    ys = _tile_grid(max(h1, t), t, config.tile_overlap)
    xs = _tile_grid(max(w1, t), t, config.tile_overlap)
    out_hw = None if at_network_resolution else (h0, w0)
    return _segment_full_batch(
        apply_fn, variables, jnp.asarray(images), (h1, w1), t, ys, xs, out_hw, n_seg
    )


def _network_shape(h0: int, w0: int, config: CellposeConfig, diameter: float | None):
    scale = 1.0 if not diameter else config.diam_mean / float(diameter)
    h1 = max(config.tile // 4, int(round(h0 * scale)))
    w1 = max(config.tile // 4, int(round(w0 * scale)))
    return h1, w1


def segment_image(
    apply_fn,
    variables,
    image: np.ndarray,
    config: CellposeConfig = CellposeConfig(),
    diameter: float | None = None,
    at_network_resolution: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full-image network pass with diameter rescale + overlap-tiled eval.

    image: (H, W, C) float array. Returns (flows (2,H,W), cellprob (H,W),
    styles) at the ORIGINAL resolution by default, mirroring cellpose
    eval's resizing contract (reference runs diameter=100 -> rescale 0.3).
    With ``at_network_resolution=True`` the outputs stay at the rescaled
    network resolution — the right domain for the flow dynamics (cellpose
    integrates there and upsamples the masks), ~1/scale^2 cheaper.
    """
    h0, w0 = image.shape[:2]
    h1, w1 = _network_shape(h0, w0, config, diameter)
    t = config.tile
    ys = _tile_grid(max(h1, t), t, config.tile_overlap)
    xs = _tile_grid(max(w1, t), t, config.tile_overlap)
    out_hw = None if at_network_resolution else (h0, w0)
    flows, cellprob = _segment_full(
        apply_fn, variables, jnp.asarray(image), (h1, w1), t, ys, xs, out_hw
    )
    return flows, cellprob, None


# ----------------------------------------------------------------------------
# Training (flow regression) — the multi-chip trainable path
# ----------------------------------------------------------------------------


def flow_loss(pred: jax.Array, target_flows: jax.Array, target_prob: jax.Array) -> jax.Array:
    """Cellpose's objective: MSE on (5x scaled) flows + BCE on cellprob."""
    mse = jnp.mean((pred[..., :2] - 5.0 * target_flows) ** 2)
    logits = pred[..., 2]
    bce = jnp.mean(
        jnp.maximum(logits, 0) - logits * target_prob + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return mse + bce


def train_step(apply_fn, params, batch_stats, opt_state, batch, tx):
    """One optimizer step; callers jit/shard this over a mesh."""
    images, target_flows, target_prob = batch

    def loss_fn(p):
        pred = apply_fn({"params": p, "batch_stats": batch_stats}, images)
        return flow_loss(pred, target_flows, target_prob)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = jax.tree.map(lambda p, u: p + u, params, updates)
    return params, opt_state, loss

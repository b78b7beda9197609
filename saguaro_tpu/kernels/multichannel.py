"""Multichannel fused per-object statistics.

pipeline/features.py measures C channels x 3 object sets; calling the
per-channel kernels independently costs O(C) one-hot/scatter passes per
family (with C=5: 15 intensity calls, 30 correlation passes, ...). These
variants carry ALL channels (and all channel pairs) as payload lanes of
a handful of passes per object set:

* ``multichannel_stats``: intensity + correlation for every channel and
  channel pair — 2 one-hot matmuls (linear sums, centered quadratics),
  3 vector-payload segment min/max/argmax passes, 1 row gather.
* ``edge_intensity_multichannel``: the Edge family over boundary pixels.
* ``radial_distribution_multichannel``: ring geometry computed once,
  one (N, C)-payload keyed scatter for all channels.

Numerically identical to the per-channel kernels (equality-tested in
tests/test_multichannel.py); those remain the reference implementations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from saguaro_tpu.kernels.onehot_reduce import segment_matmul_sums

__all__ = [
    "multichannel_stats",
    "edge_intensity_multichannel",
    "radial_distribution_multichannel",
]


@partial(jax.jit, static_argnames=("max_cells",))
def multichannel_stats(image: jax.Array, labels: jax.Array, max_cells: int = 1024):
    """Intensity + correlation families for all channels at once.

    image: (H, W, C); labels: (H, W). Returns
    (intensity dict of (max_cells, C), correlation dict of
    (max_cells, C, C) [symmetric; diagonal = 1/variance-slope]).
    """
    h, w, n_ch = image.shape
    flat = labels.reshape(-1).astype(jnp.int32)
    seg = jnp.where((flat > 0) & (flat < max_cells), flat, 0)
    inside_m = (labels > 0).reshape(-1)
    inside = inside_m.astype(jnp.float32)
    v = image.reshape(-1, n_ch).astype(jnp.float32) * inside[:, None]  # (N, C)

    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    yf = yy.reshape(-1)
    xf = xx.reshape(-1)

    # pass 1: [1, y, x, v_c..., y v_c..., x v_c...] -> 3 + 3C lanes
    payload1 = jnp.concatenate(
        [
            jnp.stack([inside, yf * inside, xf * inside], axis=1),
            v,
            yf[:, None] * v,
            xf[:, None] * v,
        ],
        axis=1,
    )
    sums = segment_matmul_sums(seg, payload1, max_cells)
    cnt, sy, sx = sums[:, 0], sums[:, 1], sums[:, 2]
    s = sums[:, 3 : 3 + n_ch]                      # (cells, C)
    wy = sums[:, 3 + n_ch : 3 + 2 * n_ch]
    wx = sums[:, 3 + 2 * n_ch : 3 + 3 * n_ch]
    denom = jnp.maximum(cnt, 1.0)
    mean = s / denom[:, None]

    # pass 2: centered quadratics — C squares + C(C-1)/2 cross products
    vc = (image.reshape(-1, n_ch).astype(jnp.float32) - jnp.take(mean, seg, axis=0)) * inside[:, None]
    pairs = [(a, b) for a in range(n_ch) for b in range(a + 1, n_ch)]
    payload2 = jnp.concatenate(
        [vc * vc] + ([jnp.stack([vc[:, a] * vc[:, b] for a, b in pairs], axis=1)] if pairs else []),
        axis=1,
    )
    sums2 = segment_matmul_sums(seg, payload2, max_cells)
    var = jnp.maximum(sums2[:, :n_ch] / denom[:, None], 0.0)

    # min / max / argmax as (N, C) vector-payload segment reductions
    vr = image.reshape(-1, n_ch).astype(jnp.float32)
    big = jnp.float32(3.4e38)
    vmin = jax.ops.segment_min(
        jnp.where(inside_m[:, None], vr, big), seg, num_segments=max_cells
    )
    vmax = jax.ops.segment_max(
        jnp.where(inside_m[:, None], vr, -big), seg, num_segments=max_cells
    )
    at_max = inside_m[:, None] & (vr >= jnp.take(vmax, seg, axis=0))
    idx = jnp.arange(h * w, dtype=jnp.float32)
    pick = jax.ops.segment_min(
        jnp.where(at_max, idx[:, None], jnp.float32(h * w)),
        seg,
        num_segments=max_cells,
    )
    pick_i = jnp.clip(pick, 0, h * w - 1).astype(jnp.int32)  # (cells, C)
    max_y = (pick_i // w).astype(jnp.float32)
    max_x = (pick_i % w).astype(jnp.float32)

    sdenom = jnp.maximum(s, 1e-12)
    disp = jnp.sqrt(
        ((sy / denom)[:, None] - wy / sdenom) ** 2
        + ((sx / denom)[:, None] - wx / sdenom) ** 2
    )
    zero = (cnt <= 0)[:, None]
    z = lambda a: jnp.where(zero, 0.0, a)
    intensity = {
        "IntegratedIntensity": z(s),
        "MeanIntensity": z(mean),
        "StdIntensity": z(jnp.sqrt(var)),
        "MinIntensity": z(vmin),
        "MaxIntensity": z(vmax),
        "MassDisplacement": z(disp),
        "CenterMassIntensity_Y": z(wy / sdenom),
        "CenterMassIntensity_X": z(wx / sdenom),
        "MaxIntensity_Y": z(max_y),
        "MaxIntensity_X": z(max_x),
    }

    zero1 = cnt <= 1
    corr_out = {}
    for i, (a, b) in enumerate(pairs):
        cov = sums2[:, n_ch + i] / denom
        c = cov / jnp.maximum(jnp.sqrt(var[:, a] * var[:, b]), 1e-12)
        sl = cov / jnp.maximum(var[:, a], 1e-12)
        corr_out[(a, b)] = (
            jnp.where(zero1, 0.0, c),
            jnp.where(zero1, 0.0, sl),
        )
    return intensity, corr_out


@partial(jax.jit, static_argnames=("max_cells",))
def edge_intensity_multichannel(
    image: jax.Array, labels: jax.Array, max_cells: int = 1024
):
    """CP Edge intensity family for all channels: stats over each
    object's boundary pixels. Returns dict of (max_cells, C)."""
    h, w, n_ch = image.shape
    lab = labels.astype(jnp.int32)
    pad = jnp.pad(lab, 1, constant_values=0)
    boundary = (
        (pad[:-2, 1:-1] != lab)
        | (pad[2:, 1:-1] != lab)
        | (pad[1:-1, :-2] != lab)
        | (pad[1:-1, 2:] != lab)
    ) & (lab > 0)
    flat = jnp.where(boundary, lab, 0).reshape(-1)
    seg = jnp.where((flat > 0) & (flat < max_cells), flat, 0)
    on = (flat > 0)
    onf = on.astype(jnp.float32)
    vr = image.reshape(-1, n_ch).astype(jnp.float32)
    v = vr * onf[:, None]

    payload1 = jnp.concatenate([onf[:, None], v], axis=1)
    sums = segment_matmul_sums(seg, payload1, max_cells)
    cnt = sums[:, 0]
    s = sums[:, 1:]
    denom = jnp.maximum(cnt, 1.0)
    mean = s / denom[:, None]

    vc = (vr - jnp.take(mean, seg, axis=0)) * onf[:, None]
    var = jnp.maximum(
        segment_matmul_sums(seg, vc * vc, max_cells) / denom[:, None], 0.0
    )

    big = jnp.float32(3.4e38)
    vmin = jax.ops.segment_min(
        jnp.where(on[:, None], vr, big), seg, num_segments=max_cells
    )
    vmax = jax.ops.segment_max(
        jnp.where(on[:, None], vr, -big), seg, num_segments=max_cells
    )
    zero = (cnt <= 0)[:, None]
    z = lambda a: jnp.where(zero, 0.0, a)
    return {
        "IntegratedIntensityEdge": z(s),
        "MeanIntensityEdge": z(mean),
        "StdIntensityEdge": z(jnp.sqrt(var)),
        "MinIntensityEdge": z(vmin),
        "MaxIntensityEdge": z(vmax),
    }


@partial(jax.jit, static_argnames=("max_cells", "n_rings"))
def radial_distribution_multichannel(
    image: jax.Array, labels: jax.Array, max_cells: int = 1024, n_rings: int = 4
):
    """CP radial distribution for all channels: ring geometry computed
    once, one keyed (N, C)-payload scatter. Returns dict of
    (max_cells, n_rings, C)."""
    h, w, n_ch = image.shape
    flat = labels.reshape(-1).astype(jnp.int32)
    seg = jnp.where((flat > 0) & (flat < max_cells), flat, 0)
    inside = (labels > 0).reshape(-1).astype(jnp.float32)
    v = image.reshape(-1, n_ch).astype(jnp.float32) * inside[:, None]

    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    sums = segment_matmul_sums(
        seg,
        jnp.stack([inside, yy.reshape(-1) * inside, xx.reshape(-1) * inside], axis=1),
        max_cells,
    )
    cnt = sums[:, 0]
    denom = jnp.maximum(cnt, 1.0)
    cy = sums[:, 1] / denom
    cx = sums[:, 2] / denom
    dy = yy.reshape(-1) - jnp.take(cy, seg)
    dx = xx.reshape(-1) - jnp.take(cx, seg)
    dist = jnp.sqrt(dy * dy + dx * dx)
    dmax = jax.ops.segment_max(
        jnp.where(inside > 0, dist, -1.0), seg, num_segments=max_cells
    )
    dnorm = dist / jnp.maximum(jnp.take(dmax, seg), 1e-6)
    ring = jnp.clip((dnorm * n_rings).astype(jnp.int32), 0, n_rings - 1)

    keys = seg * n_rings + ring
    payload = jnp.concatenate([inside[:, None], v], axis=1)  # count + C sums
    ring_sums = jax.ops.segment_sum(
        payload, keys, num_segments=max_cells * n_rings
    ).reshape(max_cells, n_rings, 1 + n_ch)
    ring_cnt = ring_sums[..., 0]
    ring_int = ring_sums[..., 1:]  # (cells, rings, C)

    total_int = jnp.maximum(jnp.sum(ring_int, axis=1, keepdims=True), 1e-12)
    frac_at_d = ring_int / total_int
    pix_frac = ring_cnt / jnp.maximum(cnt[:, None], 1.0)
    mean_frac = frac_at_d / jnp.maximum(pix_frac[:, :, None], 1e-12)
    zero = (cnt <= 0)[:, None, None]
    return {
        "FracAtD": jnp.where(zero, 0.0, frac_at_d),
        "MeanFrac": jnp.where(zero, 0.0, mean_frac),
    }

"""Extended per-object measurements: quantile/edge intensities, radial
distribution, neighbors — the remaining CP measurement families
(SURVEY.md E4).

All computed as segment reductions with static bounds:

* quantile intensities (Median/MAD/quartiles): per-object 256-bin
  histograms + CDF interpolation — bin-resolution approximation of CP's
  exact order statistics. Histograms are one-hot MXU matmuls
  (``onehot_reduce.onehot_counts``): measured 0.125 vs 0.164 s/site for
  the keyed-scatter form (benchmarks/bench_family_variants.py), and the
  multichannel variant fuses all channels' bins against ONE label
  one-hot per pass;
* edge intensities: segment stats restricted to boundary pixels;
* radial distribution (FracAtD/MeanFrac per ring): normalized centroid
  distance binned into rings, one segment-sum per statistic;
* neighbors: adjacency after label dilation, distinct-neighbor counts as
  4 directional one-hot histograms (0.053 vs 0.066 s/site for the keyed
  (max_cells²)-scatter form), plus PercentTouching.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from saguaro_tpu.kernels.morphology import _pool
from saguaro_tpu.kernels.onehot_reduce import onehot_counts
from saguaro_tpu.kernels.segment_reduce import segment_stats

__all__ = [
    "quantile_intensity_features",
    "quantile_intensity_features_mc",
    "edge_intensity_features",
    "radial_distribution_features",
    "neighbor_features",
]

_NBINS = 256


@partial(jax.jit, static_argnames=("max_cells",))
def quantile_intensity_features(
    image: jax.Array, labels: jax.Array, max_cells: int = 1024, stats=None
):
    """Median/MAD/LowerQuartile/UpperQuartile intensity per object via
    per-object histograms (256 bins over the object's own range).

    ``stats``: optional precomputed (cnt, vmin, vmax) — e.g. from
    kernels/fused_measure — skipping this kernel's own segment_stats
    passes over the pixel array."""
    mc = quantile_intensity_features_mc(
        image[..., None],
        labels,
        max_cells,
        stats=None if stats is None else (stats[0], stats[1][:, None], stats[2][:, None]),
    )
    return {k: v[:, 0] for k, v in mc.items()}


@partial(jax.jit, static_argnames=("max_cells",))
def quantile_intensity_features_mc(
    image: jax.Array, labels: jax.Array, max_cells: int = 1024, stats=None,
    ranges=None,
):
    """Multichannel quantile intensities: (H, W, C) image -> dict of
    (max_cells, C). All channels' per-object histograms contract against
    ONE label one-hot per pixel chunk (two passes total: value bins, then
    |v - median| bins for MAD) — the label one-hot is the dominant HBM
    traffic, so fusing channels is nearly free.

    ``stats``: optional precomputed (cnt (max_cells,), vmin, vmax
    (max_cells, C)) from kernels/fused_measure.
    ``ranges``: optional pregathered per-pixel (pmin, prange) each
    (N, C) — shared with GLCM quantization, skipping this kernel's own
    range-lookup scan (requires ``stats``)."""
    n_ch = image.shape[-1]
    flat = labels.reshape(-1).astype(jnp.int32)
    seg = jnp.where((flat > 0) & (flat < max_cells), flat, 0)
    inside = (labels > 0).reshape(-1)
    v = image.reshape(-1, n_ch).astype(jnp.float32)

    if stats is None:
        cnt = jax.ops.segment_sum(
            inside.astype(jnp.float32), seg, num_segments=max_cells
        )
        neg = jnp.where(inside[:, None], v, jnp.inf)
        pos = jnp.where(inside[:, None], v, -jnp.inf)
        vmin = jax.vmap(
            lambda col: jax.ops.segment_min(col, seg, num_segments=max_cells),
            in_axes=1, out_axes=1,
        )(neg)
        vmax = jax.vmap(
            lambda col: jax.ops.segment_max(col, seg, num_segments=max_cells),
            in_axes=1, out_axes=1,
        )(pos)
        vmin = jnp.where(jnp.isfinite(vmin), vmin, 0.0)
        vmax = jnp.where(jnp.isfinite(vmax), vmax, 0.0)
    else:
        cnt, vmin, vmax = stats
    vrange = jnp.maximum(vmax - vmin, 1e-12)          # (max_cells, C)
    from saguaro_tpu.kernels.onehot_reduce import mxu_take

    if ranges is not None:
        pmin, prange = ranges                         # (N, C) each
    else:
        # per-pixel range lookups as one matmul-take scan (full-size XLA
        # gathers run at ~1.7 GB/s on TPU — see onehot_reduce.mxu_take)
        gq = mxu_take(jnp.concatenate([vmin, vrange], axis=1), seg, max_cells)
        pmin = gq[:, :n_ch]
        prange = gq[:, n_ch:]
    bins = jnp.clip(((v - pmin) / prange * _NBINS), 0, _NBINS - 1).astype(jnp.int32)
    hists = onehot_counts(
        seg, [(bins[:, c], inside, _NBINS) for c in range(n_ch)], max_cells
    )  # C x (max_cells, _NBINS)
    hist = jnp.stack(hists, axis=-1)                  # (max_cells, _NBINS, C)

    cdf = jnp.cumsum(hist, axis=1)
    total = jnp.maximum(cdf[:, -1:, :], 1.0)
    cdfn = cdf / total

    def q(p):
        # first bin where CDF >= p, mapped back to intensity
        idx = jnp.argmax(cdfn >= p, axis=1).astype(jnp.float32)  # (max_cells, C)
        return vmin + (idx + 0.5) / _NBINS * vrange

    med = q(0.5)
    lo = q(0.25)
    hi = q(0.75)

    # MAD: histogram of |v - median(object)| over [0, range]
    pmed = mxu_take(med, seg, max_cells)
    dev = jnp.abs(v - pmed)
    dbins = jnp.clip((dev / prange * _NBINS), 0, _NBINS - 1).astype(jnp.int32)
    dhists = onehot_counts(
        seg, [(dbins[:, c], inside, _NBINS) for c in range(n_ch)], max_cells
    )
    dhist = jnp.stack(dhists, axis=-1)
    dcdf = jnp.cumsum(dhist, axis=1) / total
    mad_idx = jnp.argmax(dcdf >= 0.5, axis=1).astype(jnp.float32)
    mad = (mad_idx + 0.5) / _NBINS * vrange

    zero = (cnt <= 0)[:, None]
    z = lambda a: jnp.where(zero, 0.0, a)
    return {
        "MedianIntensity": z(med),
        "MADIntensity": z(mad),
        "LowerQuartileIntensity": z(lo),
        "UpperQuartileIntensity": z(hi),
    }


@partial(jax.jit, static_argnames=("max_cells",))
def edge_intensity_features(image: jax.Array, labels: jax.Array, max_cells: int = 1024):
    """Intensity stats over each object's boundary pixels (CP Edge set)."""
    lab = labels.astype(jnp.int32)
    pad = jnp.pad(lab, 1, constant_values=0)
    boundary = (
        (pad[:-2, 1:-1] != lab)
        | (pad[2:, 1:-1] != lab)
        | (pad[1:-1, :-2] != lab)
        | (pad[1:-1, 2:] != lab)
    ) & (lab > 0)
    edge_labels = jnp.where(boundary, lab, 0)
    cnt, s, ss, vmin, vmax = segment_stats(image, edge_labels, max_cells)
    denom = jnp.maximum(cnt, 1.0)
    mean = s / denom
    var = jnp.maximum(ss / denom - mean * mean, 0.0)
    zero = cnt <= 0
    z = lambda a: jnp.where(zero, 0.0, a)
    return {
        "IntegratedIntensityEdge": z(s),
        "MeanIntensityEdge": z(mean),
        "StdIntensityEdge": z(jnp.sqrt(var)),
        "MinIntensityEdge": z(vmin),
        "MaxIntensityEdge": z(vmax),
    }


@partial(jax.jit, static_argnames=("max_cells", "n_rings"))
def radial_distribution_features(
    image: jax.Array, labels: jax.Array, max_cells: int = 1024, n_rings: int = 4
):
    """CP MeasureObjectIntensityDistribution core: per ring (scaled by the
    object's max centroid distance): FracAtD (fraction of total intensity)
    and MeanFrac (FracAtD normalized by the ring's pixel fraction)."""
    h, w = labels.shape
    flat = labels.reshape(-1).astype(jnp.int32)
    seg = jnp.where((flat > 0) & (flat < max_cells), flat, 0)
    inside = (labels > 0).reshape(-1).astype(jnp.float32)
    v = image.reshape(-1).astype(jnp.float32) * inside

    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    cnt = jax.ops.segment_sum(inside, seg, num_segments=max_cells)
    denom = jnp.maximum(cnt, 1.0)
    cy = jax.ops.segment_sum(yy.reshape(-1) * inside, seg, num_segments=max_cells) / denom
    cx = jax.ops.segment_sum(xx.reshape(-1) * inside, seg, num_segments=max_cells) / denom
    dy = yy.reshape(-1) - jnp.take(cy, seg)
    dx = xx.reshape(-1) - jnp.take(cx, seg)
    dist = jnp.sqrt(dy * dy + dx * dx)
    dmax = jax.ops.segment_max(
        jnp.where(inside > 0, dist, -1.0), seg, num_segments=max_cells
    )
    dnorm = dist / jnp.maximum(jnp.take(dmax, seg), 1e-6)
    ring = jnp.clip((dnorm * n_rings).astype(jnp.int32), 0, n_rings - 1)

    keys = seg * n_rings + ring
    ring_int = jax.ops.segment_sum(v, keys, num_segments=max_cells * n_rings).reshape(
        max_cells, n_rings
    )
    ring_cnt = jax.ops.segment_sum(
        inside, keys, num_segments=max_cells * n_rings
    ).reshape(max_cells, n_rings)
    total_int = jnp.maximum(jnp.sum(ring_int, axis=1, keepdims=True), 1e-12)
    frac_at_d = ring_int / total_int
    pix_frac = ring_cnt / jnp.maximum(cnt[:, None], 1.0)
    mean_frac = frac_at_d / jnp.maximum(pix_frac, 1e-12)
    zero = (cnt <= 0)[:, None]
    return {
        "FracAtD": jnp.where(zero, 0.0, frac_at_d),       # (max_cells, n_rings)
        "MeanFrac": jnp.where(zero, 0.0, mean_frac),
    }


@partial(jax.jit, static_argnames=("max_cells", "distance"))
def neighbor_features(labels: jax.Array, max_cells: int = 1024, distance: int = 5):
    """CP MeasureObjectNeighbors core: NumberOfNeighbors within
    ``distance`` px and PercentTouching (fraction of boundary pixels whose
    dilated neighborhood meets another object)."""
    lab = labels.astype(jnp.int32)

    # dilate labels into background so nearby (not just touching) objects
    # become adjacent; existing objects keep their pixels
    grown = lab
    for _ in range(max(distance // 2, 0)):
        neigh = _pool(grown.astype(jnp.float32), jax.lax.max).astype(jnp.int32)
        grown = jnp.where(grown == 0, neigh, grown)

    pad = jnp.pad(grown, 1, constant_values=0)
    shifts = (pad[:-2, 1:-1], pad[2:, 1:-1], pad[1:-1, :-2], pad[1:-1, 2:])

    touching = jnp.zeros(grown.shape, jnp.bool_)
    # route overflow ids (>= max_cells) to the ignored background bin,
    # matching the _flat convention — clipping would alias them onto
    # cell max_cells-1 and give it phantom neighbors
    me = jnp.where((grown > 0) & (grown < max_cells), grown, 0)
    codes = []
    for sh in shifts:
        other = jnp.where((sh > 0) & (sh < max_cells), sh, 0)
        is_pair = (me > 0) & (other > 0) & (me != other)
        touching = touching | is_pair
        codes.append((other.reshape(-1), is_pair.reshape(-1), max_cells))
    # 4 directional (me, other) pair histograms against one label one-hot
    # per chunk — MXU matmuls instead of keyed max_cells² scatters
    hists = onehot_counts(me.reshape(-1), codes, max_cells)
    pairs = (sum(hists) > 0).astype(jnp.float32)
    n_neighbors = jnp.sum(pairs, axis=1)

    # PercentTouching over the ORIGINAL object boundaries
    padl = jnp.pad(lab, 1, constant_values=0)
    boundary = (
        (padl[:-2, 1:-1] != lab)
        | (padl[2:, 1:-1] != lab)
        | (padl[1:-1, :-2] != lab)
        | (padl[1:-1, 2:] != lab)
    ) & (lab > 0)
    flat = lab.reshape(-1)
    seg = jnp.where((flat > 0) & (flat < max_cells), flat, 0)
    # boundary / touching counts as 2 one-hot count columns (scalar
    # segment_sum scatters cost ~82 ms each on TPU, profiled)
    b_cnt, t_cnt = onehot_counts(
        seg,
        [
            (jnp.zeros_like(seg), boundary.reshape(-1), 1),
            (jnp.zeros_like(seg), (boundary & touching).reshape(-1), 1),
        ],
        max_cells,
    )
    b_cnt, t_cnt = b_cnt[:, 0], t_cnt[:, 0]
    pct = 100.0 * t_cnt / jnp.maximum(b_cnt, 1.0)
    return {
        "NumberOfNeighbors": n_neighbors,
        "PercentTouching": pct,
    }

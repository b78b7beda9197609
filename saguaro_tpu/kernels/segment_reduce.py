"""Per-object segment reductions — the core of CellProfiler-equivalent
measurements (SURVEY.md E4).

Every per-cell statistic (intensity stats, shape moments, bounding boxes,
channel correlations) is expressed as a segment reduction over the label
image with a static ``max_cells`` bound, so a whole site's object
measurements compile into a handful of fused XLA segment-sums — replacing
CellProfiler's per-object Python/C loops.

Index convention: output arrays are indexed by compact label id
(0 = background; slot 0 is zeroed/ignored).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "segment_stats",
    "intensity_features",
    "shape_features",
    "perimeter_weight_image",
    "correlation_features",
]


def _flat(labels: jax.Array, max_cells: int) -> jax.Array:
    """Flatten labels, routing ids >= max_cells to the (ignored) background
    bin 0 — clipping instead would silently merge every overflow cell into
    cell max_cells-1 and corrupt its measurements."""
    flat = labels.reshape(-1).astype(jnp.int32)
    return jnp.where((flat > 0) & (flat < max_cells), flat, 0)


@partial(jax.jit, static_argnames=("max_cells",))
def segment_stats(values: jax.Array, labels: jax.Array, max_cells: int = 1024):
    """(count, sum, sumsq, min, max) per label for one value image."""
    seg = _flat(labels, max_cells)
    v = values.reshape(-1).astype(jnp.float32)
    inside = (labels > 0).reshape(-1)
    ones = inside.astype(jnp.float32)
    cnt = jax.ops.segment_sum(ones, seg, num_segments=max_cells)
    s = jax.ops.segment_sum(v * ones, seg, num_segments=max_cells)
    ss = jax.ops.segment_sum(v * v * ones, seg, num_segments=max_cells)
    big = jnp.float32(3.4e38)
    vmin = jax.ops.segment_min(jnp.where(inside, v, big), seg, num_segments=max_cells)
    vmax = jax.ops.segment_max(jnp.where(inside, v, -big), seg, num_segments=max_cells)
    return cnt, s, ss, vmin, vmax


@partial(jax.jit, static_argnames=("max_cells",))
def intensity_features(image: jax.Array, labels: jax.Array, max_cells: int = 1024):
    """CP MeasureObjectIntensity core set for one channel.

    Returns dict of (max_cells,) arrays: IntegratedIntensity, MeanIntensity,
    StdIntensity, MinIntensity, MaxIntensity, MassDisplacement (distance
    between the binary centroid and the intensity-weighted centroid),
    CenterMassIntensity_Y/X and MaxIntensity_Y/X locations.

    All plain sums ride ONE chunked one-hot matmul (TPU scatters
    serialize); only min/max/argmax stay segment reductions.
    """
    from saguaro_tpu.kernels.onehot_reduce import segment_matmul_sums

    h, w = labels.shape
    seg = _flat(labels, max_cells)
    inside = (labels > 0).reshape(-1).astype(jnp.float32)
    v = image.reshape(-1).astype(jnp.float32) * inside
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    yf = yy.reshape(-1)
    xf = xx.reshape(-1)
    payload = jnp.stack(
        [inside, v, yf * inside, xf * inside, yf * v, xf * v], axis=1
    )
    sums = segment_matmul_sums(seg, payload, max_cells)
    cnt, s, sy, sx, wy, wx = (sums[:, i] for i in range(6))
    denom = jnp.maximum(cnt, 1.0)
    mean = s / denom
    # variance over CENTERED values — uint16-scale v**2 sums would lose
    # the mean-square cancellation under the hi/lo bf16 split
    vr = image.reshape(-1).astype(jnp.float32)
    vc = (vr - jnp.take(mean, seg)) * inside
    var = (
        segment_matmul_sums(seg, (vc * vc)[:, None], max_cells)[:, 0] / denom
    )
    var = jnp.maximum(var, 0.0)

    inside_m = (labels > 0).reshape(-1)
    big = jnp.float32(3.4e38)
    vmin = jax.ops.segment_min(
        jnp.where(inside_m, vr, big), seg, num_segments=max_cells
    )
    vmax = jax.ops.segment_max(
        jnp.where(inside_m, vr, -big), seg, num_segments=max_cells
    )
    sdenom = jnp.maximum(s, 1e-12)
    disp = jnp.sqrt(
        (sy / denom - wy / sdenom) ** 2 + (sx / denom - wx / sdenom) ** 2
    )
    # location of the max-intensity pixel: smallest linear index attaining
    # the per-object max (CP Location_MaxIntensity)
    inside_b = (labels > 0).reshape(-1)
    vflat = image.reshape(-1).astype(jnp.float32)
    at_max = inside_b & (vflat >= jnp.take(vmax, seg))
    bigidx = jnp.float32(h * w)
    pick = jax.ops.segment_min(
        jnp.where(at_max, jnp.arange(h * w, dtype=jnp.float32), bigidx),
        seg,
        num_segments=max_cells,
    )
    pick_i = jnp.clip(pick, 0, h * w - 1).astype(jnp.int32)
    max_y = (pick_i // w).astype(jnp.float32)
    max_x = (pick_i % w).astype(jnp.float32)
    zero = cnt <= 0
    z = lambda a: jnp.where(zero, 0.0, a)
    return {
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


def perimeter_weight_image(labels: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-pixel weights of the CP 4.2.8 perimeter (exact).

    CP 4.2.8 MeasureObjectSizeShape records regionprops' ``perimeter`` =
    ``skimage.measure.perimeter(mask, neighbourhood=4)``: border pixels
    (4-connected erosion residue) are scored by their 3x3 configuration
    value ``1 + 2*n4 + 10*nd`` (n4/nd = 4-adjacent / diagonal border
    neighbors of the same object) through a 50-entry weight table with
    weights 1, sqrt(2), (1+sqrt2)/2 on the attained configurations
    (consumed via FormFactor/Compactness at Normalize_CP_ami.py:47-52).

    TPU-native: the table lookup collapses to VPU predicate arithmetic —
    indices {5,7,15,17,25,27} -> 1 are exactly (n4 in {2,3}, nd <= 2);
    {21,33} -> sqrt2 are (n4=0, nd=2) | (n4=1, nd=3); {13,23} ->
    (1+sqrt2)/2 are (n4=1, nd in {1,2}); every other configuration
    weighs 0 — no gathers, 8 shifts, vmappable over a site batch.

    Each object is scored on its own isolated mask (regionprops
    semantics: other labels count as background), which the label-aware
    neighbor tests reproduce without per-object loops. Returns
    (weights (H, W) f32, border (H, W) bool).
    """
    lab = labels.astype(jnp.int32)
    pad_l = jnp.pad(lab, 1, constant_values=0)

    def sh(a, dy, dx):
        return a[1 + dy : a.shape[0] - 1 + dy, 1 + dx : a.shape[1] - 1 + dx]

    border = (
        (sh(pad_l, -1, 0) != lab)
        | (sh(pad_l, 1, 0) != lab)
        | (sh(pad_l, 0, -1) != lab)
        | (sh(pad_l, 0, 1) != lab)
    ) & (lab > 0)
    pad_b = jnp.pad(border, 1, constant_values=False)

    def nb(dy, dx):
        # same-label border neighbor at offset (dy, dx)
        return (sh(pad_b, dy, dx) & (sh(pad_l, dy, dx) == lab)).astype(jnp.int32)

    n4 = nb(-1, 0) + nb(1, 0) + nb(0, -1) + nb(0, 1)
    nd = nb(-1, -1) + nb(-1, 1) + nb(1, -1) + nb(1, 1)
    w1 = ((n4 == 2) | (n4 == 3)) & (nd <= 2)
    ws2 = ((n4 == 0) & (nd == 2)) | ((n4 == 1) & (nd == 3))
    wh = (n4 == 1) & ((nd == 1) | (nd == 2))
    weights = (
        w1.astype(jnp.float32)
        + ws2.astype(jnp.float32) * jnp.float32(jnp.sqrt(2.0))
        + wh.astype(jnp.float32) * jnp.float32((1.0 + jnp.sqrt(2.0)) / 2.0)
    )
    return jnp.where(border, weights, 0.0), border


@partial(jax.jit, static_argnames=("max_cells",))
def shape_features(labels: jax.Array, max_cells: int = 1024):
    """CP AreaShape core set from raw moments + boundary counts.

    Returns dict of (max_cells,) arrays: Area, Perimeter, Center_X/Y,
    MajorAxisLength, MinorAxisLength, Eccentricity, Orientation, Extent,
    FormFactor, Compactness, BoundingBoxArea, plus bbox min/max.
    """
    from saguaro_tpu.kernels.onehot_reduce import segment_matmul_sums

    h, w = labels.shape
    seg = _flat(labels, max_cells)
    inside = labels > 0
    ones = inside.reshape(-1).astype(jnp.float32)
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )

    # perimeter: CP-exact weighted boundary configurations (skimage
    # regionprops 'perimeter'; oracle tests/oracles.skimage_perimeter_oracle)
    pw, _boundary = perimeter_weight_image(labels)

    # plain sums as chunked one-hot matmuls (scatters serialize on TPU).
    # Two passes: first the linear sums, then the second moments over
    # CENTERED coordinates — centering before squaring keeps the sums at
    # object scale (global-coordinate quadratics would lose the central
    # moments to cancellation under the hi/lo bf16 split).
    yf = yy.reshape(-1)
    xf = xx.reshape(-1)
    payload = jnp.stack(
        [ones, yf * ones, xf * ones, pw.reshape(-1)],
        axis=1,
    )
    sums = segment_matmul_sums(seg, payload, max_cells)
    area, sy, sx, perim = (sums[:, i] for i in range(4))
    denom = jnp.maximum(area, 1.0)
    cy, cx = sy / denom, sx / denom

    yc = (yf - jnp.take(cy, seg)) * ones
    xc = (xf - jnp.take(cx, seg)) * ones
    sums2 = segment_matmul_sums(
        seg, jnp.stack([yc * yc, xc * xc, yc * xc], axis=1), max_cells
    )
    # central second moments (pixel-center convention: +1/12 per axis)
    muyy = sums2[:, 0] / denom + 1.0 / 12.0
    muxx = sums2[:, 1] / denom + 1.0 / 12.0
    muxy = sums2[:, 2] / denom
    common = jnp.sqrt(jnp.maximum((muyy - muxx) ** 2 + 4 * muxy**2, 0.0))
    l1 = (muyy + muxx + common) / 2.0
    l2 = (muyy + muxx - common) / 2.0
    major = 4.0 * jnp.sqrt(jnp.maximum(l1, 0.0))
    minor = 4.0 * jnp.sqrt(jnp.maximum(l2, 0.0))
    ecc = jnp.sqrt(jnp.maximum(1.0 - (l2 / jnp.maximum(l1, 1e-12)), 0.0))
    orientation = 0.5 * jnp.arctan2(2.0 * muxy, muxx - muyy)

    big = jnp.float32(1e9)
    ymin = jax.ops.segment_min(
        jnp.where(inside, yy, big).reshape(-1), seg, num_segments=max_cells
    )
    ymax = jax.ops.segment_max(
        jnp.where(inside, yy, -big).reshape(-1), seg, num_segments=max_cells
    )
    xmin = jax.ops.segment_min(
        jnp.where(inside, xx, big).reshape(-1), seg, num_segments=max_cells
    )
    xmax = jax.ops.segment_max(
        jnp.where(inside, xx, -big).reshape(-1), seg, num_segments=max_cells
    )
    bbox_area = jnp.maximum(ymax - ymin + 1, 0) * jnp.maximum(xmax - xmin + 1, 0)
    extent = area / jnp.maximum(bbox_area, 1.0)
    form = 4.0 * jnp.pi * area / jnp.maximum(perim * perim, 1e-12)
    compact = jnp.maximum(perim * perim, 0.0) / jnp.maximum(4.0 * jnp.pi * area, 1e-12)

    zero = area <= 0
    z = lambda a: jnp.where(zero, 0.0, a)
    return {
        "Area": z(area),
        "Perimeter": z(perim),
        "Center_Y": z(cy),
        "Center_X": z(cx),
        "MajorAxisLength": z(major),
        "MinorAxisLength": z(minor),
        "Eccentricity": z(ecc),
        "Orientation": z(orientation),
        "Extent": z(extent),
        "FormFactor": z(form),
        "Compactness": z(compact),
        "BoundingBoxArea": z(bbox_area),
        "BoundingBoxMinimum_Y": z(ymin),
        "BoundingBoxMaximum_Y": z(ymax),
        "BoundingBoxMinimum_X": z(xmin),
        "BoundingBoxMaximum_X": z(xmax),
    }


@partial(jax.jit, static_argnames=("max_cells",))
def euler_numbers(labels: jax.Array, max_cells: int = 1024) -> jax.Array:
    """Per-object Euler number (components minus holes) by Gray's 2x2
    quad-pattern counting, 8-connectivity: E = (Q1 - Q3 - 2*QD) / 4 —
    the skimage regionprops / CP AreaShape_EulerNumber convention, where
    Q1/Q3 count quads with exactly 1/3 pixels of the object and QD counts
    diagonal quads. Validated: disk=1, annulus=0, two-hole blob=-1.

    Patterns are counted PER corner label: every quad contributes one
    pattern evaluation for each DISTINCT object among its 4 corners
    (attributed at that object's first corner in a,b,c,d scan order), so
    touching or diagonally adjacent objects that share a quad are each
    counted correctly — a single max-owner attribution would miscount the
    lower-id object's Q1/Q3 whenever two objects share a quad."""
    from saguaro_tpu.kernels.onehot_reduce import segment_matmul_sums

    lab = jnp.pad(labels.astype(jnp.int32), 1, constant_values=0)
    corners = (lab[:-1, :-1], lab[:-1, 1:], lab[1:, :-1], lab[1:, 1:])
    a, b, c, d = corners

    segs, contribs = [], []
    for r, target in enumerate(corners):
        # only where this corner is the first corner of its own label in
        # the quad — one evaluation per (quad, distinct label) pair
        first = target > 0
        for prev in corners[:r]:
            first = first & (prev != target)
        ta, tb, tc, td = (a == target), (b == target), (c == target), (d == target)
        s = (
            ta.astype(jnp.int32)
            + tb.astype(jnp.int32)
            + tc.astype(jnp.int32)
            + td.astype(jnp.int32)
        )
        q1 = (s == 1) & first
        q3 = (s == 3) & first
        qd = (s == 2) & ((ta & td) | (tb & tc)) & first
        contrib = (
            q1.astype(jnp.float32)
            - q3.astype(jnp.float32)
            - 2.0 * qd.astype(jnp.float32)
        )
        segs.append(jnp.where(first & (target < max_cells), target, 0).reshape(-1))
        contribs.append(contrib.reshape(-1))
    # the 4 corner passes as ONE chunked one-hot matmul scan over the
    # concatenated streams: each full-size scalar segment_sum scatter
    # costs ~82 ms on TPU (profiled), the 4N-element matmul scan ~50 ms
    # total. Contributions are in {1,-1,-2} — bf16-exact sums.
    total = segment_matmul_sums(
        jnp.concatenate(segs), jnp.concatenate(contribs)[:, None], max_cells
    )[:, 0]
    return total.at[0].set(0.0) / 4.0


@partial(jax.jit, static_argnames=("max_cells",))
def correlation_features(
    ch_a: jax.Array, ch_b: jax.Array, labels: jax.Array, max_cells: int = 1024
):
    """CP MeasureColocalization core per object: Pearson correlation and
    least-squares slope between two channels inside each object.

    One-hot matmul sums (scatters serialize on TPU); covariances use
    centered values to survive the hi/lo bf16 split."""
    from saguaro_tpu.kernels.onehot_reduce import segment_matmul_sums

    seg = _flat(labels, max_cells)
    inside = (labels > 0).reshape(-1).astype(jnp.float32)
    a = ch_a.reshape(-1).astype(jnp.float32) * inside
    b = ch_b.reshape(-1).astype(jnp.float32) * inside
    sums = segment_matmul_sums(seg, jnp.stack([inside, a, b], axis=1), max_cells)
    n, sa, sb = sums[:, 0], sums[:, 1], sums[:, 2]
    denom = jnp.maximum(n, 1.0)
    ac = (a - jnp.take(sa / denom, seg)) * inside
    bc = (b - jnp.take(sb / denom, seg)) * inside
    sums2 = segment_matmul_sums(
        seg, jnp.stack([ac * ac, bc * bc, ac * bc], axis=1), max_cells
    )
    va = jnp.maximum(sums2[:, 0] / denom, 0.0)
    vb = jnp.maximum(sums2[:, 1] / denom, 0.0)
    cov = sums2[:, 2] / denom
    corr = cov / jnp.maximum(jnp.sqrt(va * vb), 1e-12)
    slope = cov / jnp.maximum(va, 1e-12)
    zero = n <= 1
    return {
        "Correlation": jnp.where(zero, 0.0, corr),
        "Slope": jnp.where(zero, 0.0, slope),
    }

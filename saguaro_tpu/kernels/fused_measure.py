"""Fused per-object measurement — all payload-sum families in two passes.

pipeline/features.py composes per-family kernels (shape, moments,
Zernike, intensity/correlation, edge, radial); each family makes its own
full passes over the pixel array (a segment_matmul_sums scan or a
segment min/max) and re-derives shared geometry (centroids, distances).
Measured in-program at bench.py's operating point, every extra pass
costs ~0.1-0.15 s/site-batch regardless of payload width — pass COUNT,
not lane count, is the budget (BENCH.md r2 bisection).

This module computes the same families with a fixed pass structure per
object set:

  A   one wide segment_matmul_sums: areas/centroids/boundary counts,
      channel sums, intensity-weighted coordinates, edge sums
  B   one segment_min + one segment_max (multi-lane): bboxes, channel
      min/max, edge min/max
  C0  one segment_min: centroid-distance max (shared by Zernike +
      radial) and per-channel max-intensity pixel index
  C2  one wide segment_matmul_sums: bbox-local + central moment power
      products, Zernike re/im, centered intensity quadratics and
      channel cross-products, centered edge quadratics
  D   one keyed segment_sum: radial ring sums

Numerics are identical to the per-family kernels (same formulas, same
hi/lo bf16 matmul reduction per lane, same scan order) — equality-tested
in tests/test_fused_measure.py; the per-family kernels remain the
reference implementations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from saguaro_tpu.kernels.onehot_reduce import segment_matmul_sums
from saguaro_tpu.kernels.zernike import ZERNIKE_INDEXES, _radial_coeffs

__all__ = ["fused_object_features"]

_ORDERS = [(p, q) for p in range(4) for q in range(4)]


@partial(
    jax.jit,
    static_argnames=(
        "max_cells",
        "n_rings",
        "with_moments",
        "with_zernike",
        "with_edge",
        "with_radial",
    ),
)
def fused_object_features(
    image: jax.Array,
    labels: jax.Array,
    max_cells: int = 1024,
    n_rings: int = 4,
    with_moments: bool = True,
    with_zernike: bool = True,
    with_edge: bool = True,
    with_radial: bool = True,
):
    """(H, W, C) image + (H, W) labels -> dict of family result trees:

    ``shape``     segment_reduce.shape_features dict
    ``stats``     (cnt, vmin (cells, C), vmax (cells, C)) for reuse
    ``moments``   moments.moments_features dict            [with_moments]
    ``zernike``   (max_cells, 30) magnitudes               [with_zernike]
    ``intensity`` multichannel.multichannel_stats intensity dict
    ``corr``      {(a, b): (corr, slope)}
    ``edge``      multichannel.edge_intensity_multichannel [with_edge]
    ``radial``    multichannel.radial_distribution dict    [with_radial]
    """
    h, w, n_ch = image.shape
    flat = labels.reshape(-1).astype(jnp.int32)
    seg = jnp.where((flat > 0) & (flat < max_cells), flat, 0)
    inside_m = (flat > 0)
    inside = inside_m.astype(jnp.float32)

    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    yf, xf = yy.reshape(-1), xx.reshape(-1)
    vr = image.reshape(-1, n_ch).astype(jnp.float32)
    v = vr * inside[:, None]

    lab = labels.astype(jnp.int32)
    pad = jnp.pad(lab, 1, constant_values=0)
    boundary_m = (
        (pad[:-2, 1:-1] != lab)
        | (pad[2:, 1:-1] != lab)
        | (pad[1:-1, :-2] != lab)
        | (pad[1:-1, 2:] != lab)
    ) & (lab > 0)
    boundary_m = boundary_m.reshape(-1)
    boundary = boundary_m.astype(jnp.float32)

    # ---------------- pass A: all linear sums ----------------
    lanes_a = [inside, yf * inside, xf * inside, boundary]
    lanes_a += [v, yf[:, None] * v, xf[:, None] * v]
    if with_edge:
        lanes_a.append(vr * boundary[:, None])
    payload_a = jnp.concatenate(
        [l if l.ndim == 2 else l[:, None] for l in lanes_a], axis=1
    )
    sums_a = segment_matmul_sums(seg, payload_a, max_cells)
    cnt, sy, sx, perim = (sums_a[:, i] for i in range(4))
    o = 4
    s = sums_a[:, o : o + n_ch]
    wy = sums_a[:, o + n_ch : o + 2 * n_ch]
    wx = sums_a[:, o + 2 * n_ch : o + 3 * n_ch]
    o += 3 * n_ch
    edge_s = sums_a[:, o : o + n_ch] if with_edge else None

    denom = jnp.maximum(cnt, 1.0)
    cy, cx = sy / denom, sx / denom
    mean = s / denom[:, None]
    zero = cnt <= 0

    # ---------------- pass B: multi-lane min / max ----------------
    big = jnp.float32(3.4e38)
    min_lanes = [
        jnp.where(inside_m, yf, big)[:, None],
        jnp.where(inside_m, xf, big)[:, None],
        jnp.where(inside_m[:, None], vr, big),
    ]
    max_lanes = [
        jnp.where(inside_m, yf, -big)[:, None],
        jnp.where(inside_m, xf, -big)[:, None],
        jnp.where(inside_m[:, None], vr, -big),
    ]
    if with_edge:
        min_lanes.append(jnp.where(boundary_m[:, None], vr, big))
        max_lanes.append(jnp.where(boundary_m[:, None], vr, -big))
    mins = jax.ops.segment_min(
        jnp.concatenate(min_lanes, axis=1), seg, num_segments=max_cells
    )
    maxs = jax.ops.segment_max(
        jnp.concatenate(max_lanes, axis=1), seg, num_segments=max_cells
    )
    ymin, xmin = mins[:, 0], mins[:, 1]
    ymax, xmax = maxs[:, 0], maxs[:, 1]
    vmin = mins[:, 2 : 2 + n_ch]
    vmax = maxs[:, 2 : 2 + n_ch]
    edge_vmin = mins[:, 2 + n_ch :] if with_edge else None
    edge_vmax = maxs[:, 2 + n_ch :] if with_edge else None

    # ---------------- pass C0: distance max + argmax picks ----------------
    dy = yf - jnp.take(cy, seg)
    dx = xf - jnp.take(cx, seg)
    dist = jnp.sqrt(dy * dy + dx * dx)
    at_max = inside_m[:, None] & (vr >= jnp.take(vmax, seg, axis=0))
    idxf = jnp.arange(h * w, dtype=jnp.float32)
    c0_lanes = [
        # zernike/radial convention: rmax over inside pixels, fill -1
        jnp.where(inside_m, -dist, -(-1.0))[:, None],
        jnp.where(at_max, idxf[:, None], jnp.float32(h * w)),
    ]
    c0 = jax.ops.segment_min(
        jnp.concatenate(c0_lanes, axis=1), seg, num_segments=max_cells
    )
    rmax = -c0[:, 0]
    pick_i = jnp.clip(c0[:, 1:], 0, h * w - 1).astype(jnp.int32)
    max_y = (pick_i // w).astype(jnp.float32)
    max_x = (pick_i % w).astype(jnp.float32)

    # ---------------- pass C2: centered power products ----------------
    yc = dy * inside
    xc = dx * inside
    lanes_c: list = []
    spec_c: list = []  # (name, n_lanes) bookkeeping for unpacking

    def powers(base):
        b2 = base * base
        return [inside, base, b2, b2 * base]

    ycp, xcp = powers(yc), powers(xc)
    # shape's second central moments ride the central moment lanes
    central_orders = [pq for pq in _ORDERS if pq != (0, 0)]
    lanes_c += [ycp[p] * xcp[q] for p, q in central_orders]
    spec_c.append(("central", len(central_orders)))
    if with_moments:
        ybl = (yf - jnp.take(jnp.where(zero, 0.0, ymin), seg)) * inside
        xbl = (xf - jnp.take(jnp.where(zero, 0.0, xmin), seg)) * inside
        ybp, xbp = powers(ybl), powers(xbl)
        bbox_orders = [pq for pq in _ORDERS if pq != (0, 0)]
        lanes_c += [ybp[p] * xbp[q] for p, q in bbox_orders]
        spec_c.append(("bbox", len(bbox_orders)))
    if with_zernike:
        rho = jnp.minimum(dist / jnp.maximum(jnp.take(rmax, seg), 1e-6), 1.0)
        theta = jnp.arctan2(dy, dx)
        rpow = jnp.stack([rho**k for k in range(10)], axis=1)
        coeffs = jnp.asarray(_radial_coeffs(), jnp.float32)
        radials = jnp.dot(
            rpow, coeffs.T,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (N, 30)
        ms = jnp.asarray([m for _, m in ZERNIKE_INDEXES], jnp.float32)
        mtheta = theta[:, None] * ms[None, :]
        lanes_c.append(radials * jnp.cos(mtheta) * inside[:, None])
        lanes_c.append(radials * jnp.sin(mtheta) * inside[:, None])
        spec_c.append(("zernike", 60))
    vc = (vr - jnp.take(mean, seg, axis=0)) * inside[:, None]
    lanes_c.append(vc * vc)
    spec_c.append(("var", n_ch))
    pairs = [(a, b) for a in range(n_ch) for b in range(a + 1, n_ch)]
    if pairs:
        lanes_c.append(jnp.stack([vc[:, a] * vc[:, b] for a, b in pairs], axis=1))
        spec_c.append(("cross", len(pairs)))
    if with_edge:
        edge_denom = jnp.maximum(perim, 1.0)
        edge_mean = edge_s / edge_denom[:, None]
        ec = (vr - jnp.take(edge_mean, seg, axis=0)) * boundary[:, None]
        lanes_c.append(ec * ec)
        spec_c.append(("edge_var", n_ch))
    payload_c = jnp.concatenate(
        [l if l.ndim == 2 else l[:, None] for l in lanes_c], axis=1
    )
    sums_c = segment_matmul_sums(seg, payload_c, max_cells)
    parts = {}
    off = 0
    for name, n in spec_c:
        parts[name] = sums_c[:, off : off + n]
        off += n

    # ---------------- pass D: radial ring sums (keyed) ----------------
    radial_out = None
    if with_radial:
        dnorm = dist / jnp.maximum(jnp.take(rmax, seg), 1e-6)
        ring = jnp.clip((dnorm * n_rings).astype(jnp.int32), 0, n_rings - 1)
        keys = seg * n_rings + ring
        payload_d = jnp.concatenate([inside[:, None], v], axis=1)
        ring_sums = jax.ops.segment_sum(
            payload_d, keys, num_segments=max_cells * n_rings
        ).reshape(max_cells, n_rings, 1 + n_ch)
        ring_cnt = ring_sums[..., 0]
        ring_int = ring_sums[..., 1:]
        total_int = jnp.maximum(jnp.sum(ring_int, axis=1, keepdims=True), 1e-12)
        frac_at_d = ring_int / total_int
        pix_frac = ring_cnt / jnp.maximum(cnt[:, None], 1.0)
        mean_frac = frac_at_d / jnp.maximum(pix_frac[:, :, None], 1e-12)
        zr = zero[:, None, None]
        radial_out = {
            "FracAtD": jnp.where(zr, 0.0, frac_at_d),
            "MeanFrac": jnp.where(zr, 0.0, mean_frac),
        }

    # ---------------- assemble family outputs ----------------
    z = lambda a: jnp.where(zero, 0.0, a)
    z2 = lambda a: jnp.where(zero[:, None], 0.0, a)
    central = {pq: parts["central"][:, i] for i, pq in enumerate(central_orders)}
    central[(0, 0)] = cnt

    # shape (segment_reduce.shape_features formulas)
    muyy = central[(2, 0)] / denom + 1.0 / 12.0
    muxx = central[(0, 2)] / denom + 1.0 / 12.0
    muxy = central[(1, 1)] / denom
    common = jnp.sqrt(jnp.maximum((muyy - muxx) ** 2 + 4 * muxy**2, 0.0))
    l1 = (muyy + muxx + common) / 2.0
    l2 = (muyy + muxx - common) / 2.0
    bbox_area = jnp.maximum(ymax - ymin + 1, 0) * jnp.maximum(xmax - xmin + 1, 0)
    shape = {
        "Area": z(cnt),
        "Perimeter": z(perim),
        "Center_Y": z(cy),
        "Center_X": z(cx),
        "MajorAxisLength": z(4.0 * jnp.sqrt(jnp.maximum(l1, 0.0))),
        "MinorAxisLength": z(4.0 * jnp.sqrt(jnp.maximum(l2, 0.0))),
        "Eccentricity": z(
            jnp.sqrt(jnp.maximum(1.0 - (l2 / jnp.maximum(l1, 1e-12)), 0.0))
        ),
        "Orientation": z(0.5 * jnp.arctan2(2.0 * muxy, muxx - muyy)),
        "Extent": z(cnt / jnp.maximum(bbox_area, 1.0)),
        "FormFactor": z(4.0 * jnp.pi * cnt / jnp.maximum(perim * perim, 1e-12)),
        "Compactness": z(
            jnp.maximum(perim * perim, 0.0) / jnp.maximum(4.0 * jnp.pi * cnt, 1e-12)
        ),
        "BoundingBoxArea": z(bbox_area),
        "BoundingBoxMinimum_Y": z(ymin),
        "BoundingBoxMaximum_Y": z(ymax),
        "BoundingBoxMinimum_X": z(xmin),
        "BoundingBoxMaximum_X": z(xmax),
    }

    moments_out = None
    if with_moments:
        spatial = {pq: parts["bbox"][:, i] for i, pq in enumerate(bbox_orders)}
        spatial[(0, 0)] = cnt
        mo: dict[str, jax.Array] = {}
        for p, q in _ORDERS:
            mo[f"SpatialMoment_{p}_{q}"] = z(spatial[(p, q)])
        for p, q in _ORDERS:
            mo[f"CentralMoment_{p}_{q}"] = z(central[(p, q)])
        nu = {}
        for p, q in _ORDERS:
            nu[(p, q)] = central[(p, q)] / jnp.power(denom, 1.0 + (p + q) / 2.0)
            mo[f"NormalizedMoment_{p}_{q}"] = z(nu[(p, q)])
        n20, n02, n11 = nu[(2, 0)], nu[(0, 2)], nu[(1, 1)]
        n30, n03, n21, n12 = nu[(3, 0)], nu[(0, 3)], nu[(2, 1)], nu[(1, 2)]
        hu = [
            n20 + n02,
            (n20 - n02) ** 2 + 4 * n11**2,
            (n30 - 3 * n12) ** 2 + (3 * n21 - n03) ** 2,
            (n30 + n12) ** 2 + (n21 + n03) ** 2,
            (n30 - 3 * n12) * (n30 + n12)
            * ((n30 + n12) ** 2 - 3 * (n21 + n03) ** 2)
            + (3 * n21 - n03) * (n21 + n03)
            * (3 * (n30 + n12) ** 2 - (n21 + n03) ** 2),
            (n20 - n02) * ((n30 + n12) ** 2 - (n21 + n03) ** 2)
            + 4 * n11 * (n30 + n12) * (n21 + n03),
            (3 * n21 - n03) * (n30 + n12)
            * ((n30 + n12) ** 2 - 3 * (n21 + n03) ** 2)
            - (n30 - 3 * n12) * (n21 + n03)
            * (3 * (n30 + n12) ** 2 - (n21 + n03) ** 2),
        ]
        for i, val in enumerate(hu):
            mo[f"HuMoment_{i}"] = z(val)
        t00 = central[(2, 0)] / denom
        t11 = central[(0, 2)] / denom
        t01 = -central[(1, 1)] / denom
        mo["InertiaTensor_0_0"] = z(t00)
        mo["InertiaTensor_0_1"] = z(t01)
        mo["InertiaTensor_1_0"] = z(t01)
        mo["InertiaTensor_1_1"] = z(t11)
        tr = (t00 + t11) / 2.0
        det = jnp.sqrt(jnp.maximum(((t00 - t11) / 2.0) ** 2 + t01**2, 0.0))
        mo["InertiaTensorEigenvalues_0"] = z(tr + det)
        mo["InertiaTensorEigenvalues_1"] = z(tr - det)
        mo["EquivalentDiameter"] = z(jnp.sqrt(4.0 * cnt / jnp.pi))
        moments_out = mo

    zernike_out = None
    if with_zernike:
        sre = parts["zernike"][:, :30]
        sim = parts["zernike"][:, 30:]
        mag = jnp.sqrt(sre * sre + sim * sim)
        ns = jnp.asarray([n for n, _ in ZERNIKE_INDEXES], jnp.float32)
        norm = (ns[None, :] + 1.0) / jnp.pi / jnp.maximum(cnt[:, None], 1.0)
        zernike_out = jnp.where(cnt[:, None] > 0, mag * norm, 0.0)

    # intensity + correlation (multichannel_stats formulas)
    var = jnp.maximum(parts["var"] / denom[:, None], 0.0)
    sdenom = jnp.maximum(s, 1e-12)
    disp = jnp.sqrt(
        ((sy / denom)[:, None] - wy / sdenom) ** 2
        + ((sx / denom)[:, None] - wx / sdenom) ** 2
    )
    intensity = {
        "IntegratedIntensity": z2(s),
        "MeanIntensity": z2(mean),
        "StdIntensity": z2(jnp.sqrt(var)),
        "MinIntensity": z2(vmin),
        "MaxIntensity": z2(vmax),
        "MassDisplacement": z2(disp),
        "CenterMassIntensity_Y": z2(wy / sdenom),
        "CenterMassIntensity_X": z2(wx / sdenom),
        "MaxIntensity_Y": z2(max_y),
        "MaxIntensity_X": z2(max_x),
    }
    zero1 = cnt <= 1
    corr = {}
    for i, (a, b) in enumerate(pairs):
        cov = parts["cross"][:, i] / denom
        c = cov / jnp.maximum(jnp.sqrt(var[:, a] * var[:, b]), 1e-12)
        sl = cov / jnp.maximum(var[:, a], 1e-12)
        corr[(a, b)] = (jnp.where(zero1, 0.0, c), jnp.where(zero1, 0.0, sl))

    edge_out = None
    if with_edge:
        e_zero = (perim <= 0)[:, None]
        ze = lambda a: jnp.where(e_zero, 0.0, a)
        e_var = jnp.maximum(parts["edge_var"] / edge_denom[:, None], 0.0)
        edge_out = {
            "IntegratedIntensityEdge": ze(edge_s),
            "MeanIntensityEdge": ze(edge_mean),
            "StdIntensityEdge": ze(jnp.sqrt(e_var)),
            "MinIntensityEdge": ze(edge_vmin),
            "MaxIntensityEdge": ze(edge_vmax),
        }

    return {
        "shape": shape,
        "stats": (cnt, vmin, vmax),
        "moments": moments_out,
        "zernike": zernike_out,
        "intensity": intensity,
        "corr": corr,
        "edge": edge_out,
        "radial": radial_out,
    }

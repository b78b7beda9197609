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

  A   one wide in-chunk lane scan (_lane_scan): areas/centroids/boundary
      counts, channel sums, intensity-weighted coordinates, edge sums
  B   one segment_min + one segment_max (multi-lane): bboxes, channel
      min/max, edge min/max
  C0  one segment_min: centroid-distance max (shared by Zernike +
      radial) and per-channel max-intensity pixel index
  C2  one wide in-chunk lane scan: bbox-local + central moment power
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

from saguaro_tpu.kernels.zernike import ZERNIKE_INDEXES, _radial_coeffs

__all__ = ["fused_object_features"]

_ORDERS = [(p, q) for p in range(4) for q in range(4)]

# The lane-major (Pallas) lane functions are built by cached factories
# keyed on the STATIC measurement config, so every retrace with the same
# config passes the IDENTICAL callable into
# segment_pallas.seg_lane_sums_pallas — whose kernel builder is
# lru_cached on the callable. Fresh per-call closures would miss that
# cache on every trace (shape buckets, config variants) and accrete
# permanent entries.
import functools


@functools.lru_cache(maxsize=None)
def _make_lanes_a_fn_t(with_edge: bool, n_ch: int):
    # uncentered quadratic lanes (v^2, v_a*v_b) feed the CP
    # MeasureColocalization Overlap/K statistics exactly (centered-sum
    # reconstruction would inherit the gathered-mean ulp error)
    pairs = [(a, b) for a in range(n_ch) for b in range(a + 1, n_ch)]

    def lanes_a_fn_t(lab_row, g, consts, in_c, y_c, x_c, b_c, pw_c, vr_c):
        # lane-major twin of lanes_a_fn ((C, TILE) blocks, same order)
        v_c = vr_c * in_c
        rows = [in_c[None], (y_c * in_c)[None], (x_c * in_c)[None],
                b_c[None], pw_c[None], v_c, y_c * v_c, x_c * v_c]
        if with_edge:
            rows.append(vr_c * b_c)
        rows.append(vr_c * v_c)
        if pairs:
            rows.append(jnp.stack([vr_c[a] * v_c[b] for a, b in pairs], axis=0))
        return jnp.concatenate(rows, axis=0)

    return lanes_a_fn_t


@functools.lru_cache(maxsize=None)
def _make_lanes_c_fn_t(
    with_moments: bool, with_zernike: bool, with_edge: bool,
    with_radial: bool, n_ch: int, n_rings: int, cp_rw: bool = False,
):
    # derived statics mirror fused_object_features' table-column layout
    central_orders = [pq for pq in _ORDERS if pq != (0, 0)]
    bbox_orders = [pq for pq in _ORDERS if pq != (0, 0)]
    pairs = [(a, b) for a in range(n_ch) for b in range(a + 1, n_ch)]
    o_bbox = 2
    o_rmax = 2 + (2 if with_moments else 0)
    need_rmax = with_zernike or (with_radial and not cp_rw)
    o_mean = o_rmax + (1 if need_rmax else 0)
    o_emean = o_mean + n_ch

    def lanes_c_fn_t(lab_row, g, consts, in_c, y_c, x_c, b_c, vr_c, *rest):
        # lane-major twin of lanes_c_fn: g is (K, TILE), vr_c (C, TILE);
        # consts = (zernike radial coeffs (30, 10),) ride as kernel
        # inputs (Pallas can't capture traced constants)
        dy_c = y_c - g[0]
        dx_c = x_c - g[1]
        yc = dy_c * in_c
        xc = dx_c * in_c

        def powers(base_):
            b2 = base_ * base_
            return [in_c, base_, b2, b2 * base_]

        ycp, xcp = powers(yc), powers(xc)
        rows = [(ycp[p] * xcp[q])[None] for p, q in central_orders]
        if with_moments:
            ybl = (y_c - g[o_bbox]) * in_c
            xbl = (x_c - g[o_bbox + 1]) * in_c
            ybp, xbp = powers(ybl), powers(xbl)
            rows += [(ybp[p] * xbp[q])[None] for p, q in bbox_orders]
        if need_rmax:
            dist_c = jnp.sqrt(dy_c * dy_c + dx_c * dx_c)
            inv_rmax = 1.0 / jnp.maximum(g[o_rmax], 1e-6)
        if with_zernike:
            (coeffs30x10,) = consts
            rho = jnp.minimum(dist_c * inv_rmax, 1.0)
            rpow = jnp.stack([rho**k for k in range(10)], axis=0)  # (10, T)
            radials = jnp.dot(
                coeffs30x10, rpow,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (30, T)
            # cos(m·θ)/sin(m·θ) by the angle-addition recurrence on
            # (cosθ, sinθ) = (dx, dy)/dist — Mosaic has no atan2/trig
            # lowering, and none is needed. At dist=0 both come out 0
            # (vs cos(0)=1 for XLA's atan2 path), where every m>0 radial
            # is 0 anyway and m=0 uses the constant cos row.
            inv_d = jnp.where(dist_c > 0.0, 1.0 / jnp.maximum(dist_c, 1e-30), 0.0)
            ct, st = dx_c * inv_d, dy_c * inv_d
            cms, sms = [jnp.ones_like(ct)], [jnp.zeros_like(ct)]
            for _m in range(1, 10):
                c_new = ct * cms[-1] - st * sms[-1]
                s_new = st * cms[-1] + ct * sms[-1]
                cms.append(c_new)
                sms.append(s_new)
            m_list = [m for _, m in ZERNIKE_INDEXES]
            cos_sel = jnp.stack([cms[m] for m in m_list], axis=0)  # (30, T)
            sin_sel = jnp.stack([sms[m] for m in m_list], axis=0)
            rows.append(radials * cos_sel * in_c)
            rows.append(radials * sin_sel * in_c)
        vc = (vr_c - g[o_mean : o_mean + n_ch]) * in_c
        rows.append(vc * vc)
        if pairs:
            rows.append(jnp.stack([vc[a] * vc[b] for a, b in pairs], axis=0))
        if with_edge:
            ec = (vr_c - g[o_emean : o_emean + n_ch]) * b_c
            rows.append(ec * ec)
        if with_radial:
            if cp_rw:
                # kernels/radial.cp_ring_wedge packed code ring*8+wedge
                # (8*n_rings = excluded: outside, race lost, unreached)
                rw_c = rest[0]
                ring_c = (rw_c * jnp.float32(0.125)).astype(jnp.int32)
                wedge_c = rw_c.astype(jnp.int32) - 8 * ring_c
            else:
                ring_c = jnp.clip(
                    (dist_c * inv_rmax * n_rings).astype(jnp.int32), 0, n_rings - 1
                )
                # RadialCV octant wedges (measureobjectintensitydistribution:
                # index = (i > ic) + 2*(j > jc) + 4*(|di| > |dj|))
                wedge_c = (
                    (dy_c > 0).astype(jnp.int32)
                    + 2 * (dx_c > 0).astype(jnp.int32)
                    + 4 * (jnp.abs(dy_c) > jnp.abs(dx_c)).astype(jnp.int32)
                )
            v_c = vr_c * in_c
            for r in range(n_rings):
                mask = (ring_c == r).astype(jnp.float32)
                rows.append((in_c * mask)[None])
                rows.append(v_c * mask)
            for r in range(n_rings):
                rm = ring_c == r
                for w8 in range(8):
                    m = (rm & (wedge_c == w8)).astype(jnp.float32)
                    rows.append((in_c * m)[None])
                    rows.append(v_c * m)
        return jnp.concatenate(rows, axis=0)

    return lanes_c_fn_t


def _lane_scan(seg, base, lane_fn, n_lanes, max_cells, chunk=32768, tables=None,
               lane_fn_t=None, consts=()):
    """Chunked one-hot contraction with payload lanes built PER CHUNK.

    ``base``: list of (N,) / (N, C) per-pixel arrays; ``lane_fn(seg_c,
    [gathered,] *base_c) -> (chunk, n_lanes) f32``. The full (N, n_lanes)
    payload never exists: each chunk's lanes are built in-register from
    the base arrays and immediately contracted against the label one-hot
    — same hi/lo bf16 split, chunking, and scan order as
    ``onehot_reduce.segment_matmul_sums`` (bit-identical sums), at
    1/(n_lanes/len(base)) of the HBM traffic and footprint. Under the
    object-set vmap this is what keeps the batch-8 site program inside
    HBM (the materialized 96-lane payload was 3x1.3 GB per site).

    ``tables``: optional (max_cells, K) f32 of per-label values the lanes
    need (centroids, means, bboxes...). The body gathers them with the
    SAME label one-hot it builds for the contraction (3-term bf16 split,
    ~1 ulp of jnp.take) and passes the (chunk, K) block to lane_fn as its
    second argument — per-chunk XLA gathers run at ~1.7 GB/s on TPU
    (profiled 1.1 s/batch across the C2 scans); the matmul reuse is free.

    ``lane_fn_t``: optional lane-major twin of lane_fn (bases arrive as
    (TILE,) / (C, TILE) rows, returns (n_lanes, TILE)). When given and a
    real TPU is the backend, the scan runs as the Pallas kernel
    ``segment_pallas.seg_lane_sums_pallas`` — payload AND one-hots stay
    in VMEM (the XLA scan's one-hot materialization held ~390 ms/batch
    of while overhead at the 5-ch op point, device-profiled).
    """
    if lane_fn_t is not None:
        from saguaro_tpu.kernels.segment_pallas import (
            seg_lane_sums_pallas,
            use_pallas,
        )

        if use_pallas():
            return seg_lane_sums_pallas(
                seg, base, lane_fn_t, n_lanes, max_cells, tables=tables,
                consts=consts,
            )
    n = seg.shape[0]
    n_pad = (-n) % chunk
    seg_f = jnp.pad(seg, (0, n_pad))
    base_f = [
        jnp.pad(v, ((0, n_pad),) + ((0, 0),) * (v.ndim - 1)) for v in base
    ]
    n_chunks = (n + n_pad) // chunk
    if tables is not None:
        from saguaro_tpu.kernels.onehot_reduce import _bf16_split3

        t_hi, t_mid, t_lo = _bf16_split3(tables)

    def body(s, idx):
        sl = idx * chunk
        seg_c = jax.lax.dynamic_slice_in_dim(seg_f, sl, chunk)
        base_c = [jax.lax.dynamic_slice_in_dim(v, sl, chunk) for v in base_f]
        lab_oh = jax.nn.one_hot(seg_c, max_cells, dtype=jnp.bfloat16)
        from saguaro_tpu.kernels.onehot_reduce import _summed_dots

        if tables is not None:
            take = lambda t: jax.lax.dot_general(
                lab_oh,
                t,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            gathered = _summed_dots(take, t_hi, t_mid, t_lo)
            payload = lane_fn(seg_c, gathered, *base_c).astype(jnp.float32)
        else:
            payload = lane_fn(seg_c, *base_c).astype(jnp.float32)

        # barrier: see onehot_reduce._bf16_split3 (excess-precision
        # residual cancellation)
        hi = jax.lax.optimization_barrier(payload.astype(jnp.bfloat16))
        lo = (payload - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda v: jax.lax.dot_general(
            lab_oh,
            v,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return s + _summed_dots(dot, hi, lo), None

    s0 = jnp.zeros((max_cells, n_lanes), jnp.float32)
    s, _ = jax.lax.scan(body, s0, jnp.arange(n_chunks))
    return s


def fused_object_features(
    image: jax.Array,
    labels: jax.Array,
    max_cells: int = 1024,
    n_rings: int = 4,
    with_moments: bool = True,
    with_zernike: bool = True,
    with_edge: bool = True,
    with_radial: bool = True,
    ring_wedge: jax.Array | None = None,
    pallas_mode: bool | None = None,
):
    """Eager dispatch shell: resolve the Pallas-dispatch mode ONCE (env /
    backend, or an explicit ``pallas_mode``), carry it as a STATIC pjit
    key on the jitted impl, and pin every nested ``use_pallas()`` read to
    it via ``dispatch_override`` for the duration of the trace — mode
    flips between same-shape calls in one process previously collided on
    the mode-blind executable cache entry (VERDICT r4 weak #1)."""
    from saguaro_tpu.kernels.segment_pallas import dispatch_override, use_pallas

    if pallas_mode is None:
        pallas_mode = use_pallas()
    with dispatch_override(bool(pallas_mode)):
        return _fused_object_features(
            image, labels, max_cells, n_rings, with_moments, with_zernike,
            with_edge, with_radial, ring_wedge, bool(pallas_mode),
        )


@partial(
    jax.jit,
    static_argnames=(
        "max_cells",
        "n_rings",
        "with_moments",
        "with_zernike",
        "with_edge",
        "with_radial",
        "pallas_mode",
    ),
)
def _fused_object_features(
    image: jax.Array,
    labels: jax.Array,
    max_cells: int = 1024,
    n_rings: int = 4,
    with_moments: bool = True,
    with_zernike: bool = True,
    with_edge: bool = True,
    with_radial: bool = True,
    ring_wedge: jax.Array | None = None,
    pallas_mode: bool = False,
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

    ``ring_wedge``: optional (H, W) int32 packed CP ring/wedge code from
    `kernels/radial.cp_ring_wedge` (ring*8+wedge; 8*n_rings = excluded).
    When given, the radial/RadialCV lanes bin by CP's normalized
    edge+center distance instead of centroid-distance/rmax.
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

    # CP-exact weighted perimeter (skimage regionprops convention) rides
    # pass A as one extra lane; the plain boundary-pixel COUNT stays the
    # edge-intensity denominator (CP edge stats run over the outline set)
    from saguaro_tpu.kernels.segment_reduce import perimeter_weight_image

    pweight, boundary_2d = perimeter_weight_image(labels)
    boundary_m = boundary_2d.reshape(-1)
    boundary = boundary_m.astype(jnp.float32)
    pweight = pweight.reshape(-1)

    # ---------------- pass A: all linear sums ----------------
    def _cat(cols):
        return jnp.concatenate(
            [c if c.ndim == 2 else c[:, None] for c in cols], axis=1
        )

    a_pairs = [(a, b) for a in range(n_ch) for b in range(a + 1, n_ch)]

    def lanes_a_fn(seg_c, in_c, y_c, x_c, b_c, pw_c, vr_c):
        v_c = vr_c * in_c[:, None]
        cols = [in_c, y_c * in_c, x_c * in_c, b_c, pw_c, v_c,
                y_c[:, None] * v_c, x_c[:, None] * v_c]
        if with_edge:
            cols.append(vr_c * b_c[:, None])
        cols.append(vr_c * v_c)
        if a_pairs:
            cols.append(
                jnp.stack([vr_c[:, a] * v_c[:, b] for a, b in a_pairs], axis=1)
            )
        return _cat(cols)

    lanes_a_fn_t = _make_lanes_a_fn_t(with_edge, n_ch)

    n_lanes_a = 5 + 4 * n_ch + len(a_pairs) + (n_ch if with_edge else 0)
    sums_a = _lane_scan(
        seg, [inside, yf, xf, boundary, pweight, vr], lanes_a_fn, n_lanes_a,
        max_cells, lane_fn_t=lanes_a_fn_t,
    )
    cnt, sy, sx, edge_cnt, perim = (sums_a[:, i] for i in range(5))
    o = 5
    s = sums_a[:, o : o + n_ch]
    wy = sums_a[:, o + n_ch : o + 2 * n_ch]
    wx = sums_a[:, o + 2 * n_ch : o + 3 * n_ch]
    o += 3 * n_ch
    edge_s = sums_a[:, o : o + n_ch] if with_edge else None
    if with_edge:
        o += n_ch
    sum_vv = sums_a[:, o : o + n_ch]  # per-channel sum(v^2)
    sum_vw = sums_a[:, o + n_ch : o + n_ch + len(a_pairs)]  # sum(v_a * v_b)

    denom = jnp.maximum(cnt, 1.0)
    cy, cx = sy / denom, sx / denom
    mean = s / denom[:, None]
    zero = cnt <= 0

    # ---------------- pass B max + combined min (with C0 lanes) --------
    # NOTE: multi-lane (N, K_small) scatter operands tile exactly in THIS
    # per-object-set structure; under an object-set vmap XLA re-lays them
    # out with the K minor dim padded to 128 lanes (64x HBM blowup) —
    # measured, which is why features.py loops object sets instead.
    # Scatter cost is flat in lane count (~75 ms per full-size pass), so
    # the C0 distance/argmax lanes ride the SAME min scatter as the
    # bbox/intensity minima — one fewer scatter per object set.
    big = jnp.float32(3.4e38)
    max_lanes = [
        jnp.where(inside_m, yf, -big)[:, None],
        jnp.where(inside_m, xf, -big)[:, None],
        jnp.where(inside_m[:, None], vr, -big),
    ]
    if with_edge:
        max_lanes.append(jnp.where(boundary_m[:, None], vr, -big))
    maxs = jax.ops.segment_max(
        jnp.concatenate(max_lanes, axis=1), seg, num_segments=max_cells
    )
    ymax, xmax = maxs[:, 0], maxs[:, 1]
    vmax = maxs[:, 2 : 2 + n_ch]
    edge_vmax = maxs[:, 2 + n_ch :] if with_edge else None

    # centroid + vmax lookups as ONE mxu_take matmul scan: full-size XLA
    # gathers run at ~1.7 GB/s on TPU (profiled ~85 ms each; this path
    # held ~1.3 s/batch of them), and a single (N, C) gather also got a
    # T(8,128) layout with the C minor dim padded to 128 (64x HBM blowup).
    # Transposed form: on TPU the Pallas kernel emits (K, N) directly
    # (9.06 -> 2.49 ms/site); only the small vmax block is re-laid (N, C)
    # for the at_max lanes below.
    from saguaro_tpu.kernels.onehot_reduce import mxu_take_t

    g0 = mxu_take_t(
        jnp.concatenate([cy[:, None], cx[:, None], vmax], axis=1), seg, max_cells
    )
    dy = yf - g0[0]
    dx = xf - g0[1]
    dist = jnp.sqrt(dy * dy + dx * dx)
    # tolerant max-pixel test: g0's 3-term bf16 reconstruction of vmax is
    # exact only to ~1-2 f32 ulp, and a reconstruction 1 ulp ABOVE the
    # true max would otherwise match no pixel (the segment_min over an
    # empty candidate set returns the h*w fill -> bottom-right corner).
    # eps = a few ulp of the channel max; for integer-valued (uint16)
    # intensities this is far below one gray level, so no wrong pixel
    # can slip under the tolerance.
    g0v = g0[2:].T  # (N, C)
    at_max = inside_m[:, None] & (vr >= g0v - (jnp.abs(g0v) * 4e-6 + 1e-12))
    idxf = jnp.arange(h * w, dtype=jnp.float32)
    min_lanes = [
        jnp.where(inside_m, yf, big)[:, None],
        jnp.where(inside_m, xf, big)[:, None],
        jnp.where(inside_m[:, None], vr, big),
        # zernike/radial convention: rmax over inside pixels, fill -1
        jnp.where(inside_m, -dist, -(-1.0))[:, None],
        jnp.where(at_max, idxf[:, None], jnp.float32(h * w)),
    ]
    if with_edge:
        min_lanes.append(jnp.where(boundary_m[:, None], vr, big))
    mins = jax.ops.segment_min(
        jnp.concatenate(min_lanes, axis=1), seg, num_segments=max_cells
    )
    ymin, xmin = mins[:, 0], mins[:, 1]
    vmin = mins[:, 2 : 2 + n_ch]
    o_c0 = 2 + n_ch
    rmax = -mins[:, o_c0]
    pick_i = jnp.clip(
        mins[:, o_c0 + 1 : o_c0 + 1 + n_ch], 0, h * w - 1
    ).astype(jnp.int32)
    max_y = (pick_i // w).astype(jnp.float32)
    max_x = (pick_i % w).astype(jnp.float32)
    edge_vmin = mins[:, o_c0 + 1 + n_ch :] if with_edge else None

    # ---------------- pass C2: centered power products ----------------
    # (lanes built in-chunk by _lane_scan: the ~96-lane payload plus its
    # zernike radial intermediates never materialize in HBM)
    central_orders = [pq for pq in _ORDERS if pq != (0, 0)]
    bbox_orders = [pq for pq in _ORDERS if pq != (0, 0)]
    spec_c: list = [("central", len(central_orders))]
    if with_moments:
        spec_c.append(("bbox", len(bbox_orders)))
    if with_zernike:
        spec_c.append(("zernike", 60))
        coeffs_t = jnp.asarray(_radial_coeffs(), jnp.float32).T  # (10, 30)
        ms = jnp.asarray([m for _, m in ZERNIKE_INDEXES], jnp.float32)
    spec_c.append(("var", n_ch))
    pairs = [(a, b) for a in range(n_ch) for b in range(a + 1, n_ch)]
    if pairs:
        spec_c.append(("cross", len(pairs)))
    if with_edge:
        edge_denom = jnp.maximum(edge_cnt, 1.0)
        edge_mean = edge_s / edge_denom[:, None]
        spec_c.append(("edge_var", n_ch))
    if with_radial:
        # radial ring sums ride the C2 scan as ring-masked lanes: ring
        # membership is computable in-chunk from dist and the gathered
        # rmax column, so the former keyed pass D (a ~70 ms/object-set
        # scatter plus its own rmax take-scan) disappears entirely
        spec_c.append(("radial", n_rings * (1 + n_ch)))
        # RadialCV 8-wedge sums (CP's anisotropy measure) share the same
        # ring/centroid arithmetic in-chunk
        spec_c.append(("radialcv", n_rings * 8 * (1 + n_ch)))
    ymin_z = jnp.where(zero, 0.0, ymin)
    xmin_z = jnp.where(zero, 0.0, xmin)

    # per-label tables the C2 lanes need, gathered inside the scan by
    # reusing its label one-hot (see _lane_scan ``tables``); column map:
    cp_rw = ring_wedge is not None
    t_cols = [cy[:, None], cx[:, None]]
    o_bbox = 2
    if with_moments:
        t_cols += [ymin_z[:, None], xmin_z[:, None]]
    o_rmax = 2 + (2 if with_moments else 0)
    need_rmax = with_zernike or (with_radial and not cp_rw)
    if need_rmax:
        t_cols.append(rmax[:, None])
    o_mean = o_rmax + (1 if need_rmax else 0)
    t_cols.append(mean)
    o_emean = o_mean + n_ch
    if with_edge:
        t_cols.append(edge_mean)
    tables_c = jnp.concatenate(t_cols, axis=1)

    def lanes_c_fn(seg_c, g, in_c, y_c, x_c, b_c, vr_c, *rest):
        dy_c = y_c - g[:, 0]
        dx_c = x_c - g[:, 1]
        yc = dy_c * in_c
        xc = dx_c * in_c

        def powers(base):
            b2 = base * base
            return [in_c, base, b2, b2 * base]

        ycp, xcp = powers(yc), powers(xc)
        # shape's second central moments ride the central moment lanes
        cols = [ycp[p] * xcp[q] for p, q in central_orders]
        if with_moments:
            ybl = (y_c - g[:, o_bbox]) * in_c
            xbl = (x_c - g[:, o_bbox + 1]) * in_c
            ybp, xbp = powers(ybl), powers(xbl)
            cols += [ybp[p] * xbp[q] for p, q in bbox_orders]
        if need_rmax:
            dist_c = jnp.sqrt(dy_c * dy_c + dx_c * dx_c)
            inv_rmax = 1.0 / jnp.maximum(g[:, o_rmax], 1e-6)
        if with_zernike:
            rho = jnp.minimum(dist_c * inv_rmax, 1.0)
            theta = jnp.arctan2(dy_c, dx_c)
            rpow = jnp.stack([rho**k for k in range(10)], axis=1)
            radials = jnp.dot(
                rpow, coeffs_t,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (chunk, 30)
            mtheta = theta[:, None] * ms[None, :]
            cols.append(radials * jnp.cos(mtheta) * in_c[:, None])
            cols.append(radials * jnp.sin(mtheta) * in_c[:, None])
        vc = (vr_c - g[:, o_mean : o_mean + n_ch]) * in_c[:, None]
        cols.append(vc * vc)
        if pairs:
            cols.append(jnp.stack([vc[:, a] * vc[:, b] for a, b in pairs], axis=1))
        if with_edge:
            ec = (vr_c - g[:, o_emean : o_emean + n_ch]) * b_c[:, None]
            cols.append(ec * ec)
        if with_radial:
            if cp_rw:
                rw_c = rest[0]
                ring_c = (rw_c * jnp.float32(0.125)).astype(jnp.int32)
                wedge_c = rw_c.astype(jnp.int32) - 8 * ring_c
            else:
                ring_c = jnp.clip(
                    (dist_c * inv_rmax * n_rings).astype(jnp.int32), 0, n_rings - 1
                )
                wedge_c = (
                    (dy_c > 0).astype(jnp.int32)
                    + 2 * (dx_c > 0).astype(jnp.int32)
                    + 4 * (jnp.abs(dy_c) > jnp.abs(dx_c)).astype(jnp.int32)
                )
            v_c = vr_c * in_c[:, None]
            for r in range(n_rings):
                mask = (ring_c == r).astype(jnp.float32)
                cols.append(in_c * mask)
                cols.append(v_c * mask[:, None])
            for r in range(n_rings):
                rm = ring_c == r
                for w8 in range(8):
                    m = (rm & (wedge_c == w8)).astype(jnp.float32)
                    cols.append(in_c * m)
                    cols.append(v_c * m[:, None])
        return _cat(cols)

    lanes_c_fn_t = _make_lanes_c_fn_t(
        with_moments, with_zernike, with_edge, with_radial, n_ch,
        n_rings if with_radial else 0,
        cp_rw,
    )

    n_lanes_c = sum(n for _, n in spec_c)
    consts_c = (coeffs_t.T,) if with_zernike else ()
    base_c_arrays = [inside, yf, xf, boundary, vr]
    if cp_rw:
        base_c_arrays.append(ring_wedge.reshape(-1).astype(jnp.float32))
    sums_c = _lane_scan(
        seg, base_c_arrays, lanes_c_fn, n_lanes_c, max_cells,
        tables=tables_c, lane_fn_t=lanes_c_fn_t, consts=consts_c,
    )
    parts = {}
    off = 0
    for name, n in spec_c:
        parts[name] = sums_c[:, off : off + n]
        off += n

    # ---------------- radial rings (computed in the C2 scan) ----------------
    radial_out = None
    if with_radial:
        ring_sums = parts["radial"].reshape(max_cells, n_rings, 1 + n_ch)
        ring_cnt = ring_sums[..., 0]
        ring_int = ring_sums[..., 1:]
        total_int = jnp.maximum(jnp.sum(ring_int, axis=1, keepdims=True), 1e-12)
        frac_at_d = ring_int / total_int
        # denominator = pixels in ANY ring (CP sums over the good mask —
        # identical to Area for centroid binning, excludes race-lost /
        # unreached pixels for CP binning)
        pix_frac = ring_cnt / jnp.maximum(
            jnp.sum(ring_cnt, axis=1, keepdims=True), 1.0
        )
        mean_frac = frac_at_d / jnp.maximum(pix_frac[:, :, None], 1e-12)
        zr = zero[:, None, None]
        radial_out = {
            "FracAtD": jnp.where(zr, 0.0, frac_at_d),
            "MeanFrac": jnp.where(zr, 0.0, mean_frac),
        }
        # RadialCV: per (object, ring) coefficient of variation of the 8
        # wedges' mean intensities, wedges with no pixels excluded
        # (CP measureobjectintensitydistribution masked-array semantics;
        # population std). Objects/rings with no populated wedge -> 0.
        rcv = parts["radialcv"].reshape(max_cells, n_rings, 8, 1 + n_ch)
        wcnt = rcv[..., 0]
        wsum = rcv[..., 1:]
        present = wcnt > 0
        wmean = jnp.where(
            present[..., None], wsum / jnp.maximum(wcnt[..., None], 1.0), 0.0
        )
        npres = jnp.maximum(jnp.sum(present, axis=2), 1)[..., None]
        mean_w = jnp.sum(wmean, axis=2) / npres
        var_w = (
            jnp.sum(
                jnp.where(
                    present[..., None],
                    (wmean - mean_w[:, :, None, :]) ** 2,
                    0.0,
                ),
                axis=2,
            )
            / npres
        )
        any_w = jnp.sum(present, axis=2)[..., None] > 0
        radial_out["RadialCV"] = jnp.where(
            any_w & (mean_w > 0) & ~zr,
            jnp.sqrt(var_w) / jnp.maximum(mean_w, 1e-30),
            0.0,
        )

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

    # CP MeasureColocalization Overlap / K1 / K2 from the exact
    # uncentered pass-A quadratics (measurecolocalization.py:
    # overlap = sum(fi*si)/sqrt(sum(fi^2)*sum(si^2)), K = sum(fi*si)
    # over each channel's squared sum); scale-invariant, so raw values
    # stand in for CP's [0,1]-scaled pixels
    coloc_quad = {}
    for i, (a, b) in enumerate(pairs):
        pdt = sum_vw[:, i]
        fsq, ssq = sum_vv[:, a], sum_vv[:, b]
        den_o = jnp.sqrt(fsq * ssq)
        coloc_quad[(a, b)] = (
            jnp.where(den_o > 0, pdt / jnp.maximum(den_o, 1e-30), 0.0),
            jnp.where(fsq > 0, pdt / jnp.maximum(fsq, 1e-30), 0.0),
            jnp.where(ssq > 0, pdt / jnp.maximum(ssq, 1e-30), 0.0),
        )

    edge_out = None
    if with_edge:
        e_zero = (edge_cnt <= 0)[:, None]
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
        "coloc_quad": coloc_quad,
        "edge": edge_out,
        "radial": radial_out,
    }

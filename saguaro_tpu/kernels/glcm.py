"""Per-object Haralick texture features from gray-level co-occurrence
matrices — CP MeasureTexture equivalent (SURVEY.md E4, hard part 6).

TPU design: for each direction, the co-occurrence counting for EVERY
object in the image is ONE segment-sum — pixel pairs inside the same
object index into a (max_cells * levels * levels) histogram via
``label * L² + q(p0) * L + q(p1)``. The 13 Haralick statistics are then
closed-form reductions over the (cells, L, L) GLCM stack, fully batched
on the VPU. No per-object loops anywhere.

GLCMs are symmetrized and normalized per object+direction, matching the
mahotas/CellProfiler convention; intensities are quantized to ``levels``
gray levels over the object's own min..max range.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from saguaro_tpu.kernels.segment_reduce import segment_stats

__all__ = ["object_glcm", "haralick_features", "HARALICK_NAMES"]

HARALICK_NAMES = (
    "AngularSecondMoment",
    "Contrast",
    "Correlation",
    "Variance",
    "InverseDifferenceMoment",
    "SumAverage",
    "SumVariance",
    "SumEntropy",
    "Entropy",
    "DifferenceVariance",
    "DifferenceEntropy",
    "InfoMeas1",
    "InfoMeas2",
)

# 4 standard directions (dy, dx) at unit scale; multiply by distance.
_DIRECTIONS = ((0, 1), (1, 1), (1, 0), (1, -1))


@partial(jax.jit, static_argnames=("max_cells", "levels"))
def quantize_channels(image, labels, max_cells, levels, stats=None, ranges=None):
    """(H, W, C) image -> (C, H, W) per-object quantized gray levels
    (channel-major: pixels stay on the lane axes, matching the
    ``mxu_take_t`` row layout of the range lookups).

    All channels' per-pixel (vmin, vrange) lookups ride ONE mxu_take_t
    scan (vs one per channel inside per-channel object_glcm calls).
    ``stats``: (vmin, vmax) each (max_cells, C) — e.g. fused_measure's.
    ``ranges``: optional pregathered per-pixel (pmin, prange) each
    (C, N) lane-major — shared with the quantile kernel's range lookups.
    """
    n_ch = image.shape[-1]
    img = jnp.moveaxis(image.astype(jnp.float32), -1, 0)  # (C, H, W)
    if ranges is not None:
        pmin, prange = ranges
        pmin = pmin.reshape(n_ch, *labels.shape)
        prange = prange.reshape(n_ch, *labels.shape)
    else:
        from saguaro_tpu.kernels.onehot_reduce import mxu_take_t

        if stats is None:
            from saguaro_tpu.kernels.segment_reduce import segment_stats

            per_ch = [
                segment_stats(image[..., c], labels, max_cells)
                for c in range(n_ch)
            ]
            vmin = jnp.stack([s[3] for s in per_ch], axis=1)
            vmax = jnp.stack([s[4] for s in per_ch], axis=1)
        else:
            vmin, vmax = stats
        lab32 = labels.astype(jnp.int32)
        lab = jnp.where((lab32 > 0) & (lab32 < max_cells), lab32, 0)
        vrange = jnp.maximum(vmax - vmin, 1e-12)
        g = mxu_take_t(
            jnp.concatenate([vmin, vrange], axis=1), lab.reshape(-1), max_cells
        ).reshape(2 * n_ch, *lab.shape)
        pmin, prange = g[:n_ch], g[n_ch:]
    return jnp.clip(
        jnp.floor((img - pmin) / prange * levels), 0, levels - 1
    ).astype(jnp.int32)


def _quantize(image, labels, max_cells, levels, stats=None):
    lab32 = labels.astype(jnp.int32)
    # overflow ids map to background (bin 0, ignored downstream)
    lab = jnp.where((lab32 > 0) & (lab32 < max_cells), lab32, 0)
    inside = labels > 0
    if stats is None:
        cnt, s, ss, vmin, vmax = segment_stats(image, labels, max_cells)
    else:
        # precomputed (vmin, vmax) — e.g. from kernels/fused_measure —
        # skip this kernel's own segment_stats passes over the pixels
        vmin, vmax = stats
    vrange = jnp.maximum(vmax - vmin, 1e-12)
    img = image.astype(jnp.float32)
    # per-pixel range lookups as one matmul-take scan (full-size XLA
    # gathers run at ~1.7 GB/s on TPU — see onehot_reduce.mxu_take)
    from saguaro_tpu.kernels.onehot_reduce import mxu_take_t

    g = mxu_take_t(
        jnp.stack([vmin, vrange], axis=1), lab.reshape(-1), max_cells
    ).reshape(2, *lab.shape)
    q = jnp.clip(
        jnp.floor((img - g[0]) / g[1] * levels), 0, levels - 1
    ).astype(jnp.int32)
    return lab, inside, q


def _n_tri(levels: int) -> int:
    return levels * (levels + 1) // 2


def _tri_codes(codes, levels):
    """Per-direction pair codes -> TRIANGULAR pair codes. The deliverable
    GLCM is the symmetrized C + Cᵀ, so (q, q2) and (q2, q) pairs can
    share one histogram column: t = hi(hi+1)/2 + lo with (lo, hi) the
    sorted pair — L(L+1)/2 = 136 columns instead of L² = 256 at L=16,
    ~47% fewer MXU count flops (the count kernel runs AT the int8
    roofline, so fewer columns is the only lever left)."""
    L2 = levels * levels
    out = []
    for c in codes:
        pq = c % L2
        q1 = pq // levels
        q2 = pq % levels
        lo = jnp.minimum(q1, q2)
        hi = jnp.maximum(q1, q2)
        out.append(hi * (hi + 1) // 2 + lo)
    return out


def _tri_expand(h, levels):
    """(max_cells, L(L+1)/2) triangular counts -> (max_cells, L, L)
    symmetrized GLCM: sym[q, q2] = T[tri(q, q2)] off-diagonal (the two
    pair orders landed in one column), 2·T on the diagonal (C + Cᵀ
    doubles it)."""
    import numpy as np

    qq = np.arange(levels)
    lo = np.minimum(qq[:, None], qq[None, :])
    hi = np.maximum(qq[:, None], qq[None, :])
    tri = jnp.asarray(hi * (hi + 1) // 2 + lo, jnp.int32)  # (L, L)
    diag = jnp.asarray((qq[:, None] == qq[None, :]).astype(np.float32))
    sym = jnp.take(h, tri.reshape(-1), axis=1).reshape(
        h.shape[0], levels, levels
    )
    return sym * (1.0 + diag)


def _direction_codes(lab, inside, q, levels, distance):
    """Per pixel, per direction: the (q, q2) pair code and validity.

    Neighbor values come from pad+slice shifts — expressing them as
    ``q[ys_c, xs_c]`` advanced indexing lowered to XLA gathers at
    ~1.7 GB/s (profiled 0.41 s/batch for the 3 shifted images)."""
    h, w = lab.shape
    L2 = levels * levels

    def shifted(a, dy, dx, fill):
        out = jnp.pad(
            a,
            ((max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))),
            constant_values=fill,
        )
        return out[max(-dy, 0) : max(-dy, 0) + h, max(-dx, 0) : max(-dx, 0) + w]

    codes, oks = [], []
    for d, (dy, dx) in enumerate(_DIRECTIONS):
        dy, dx = dy * distance, dx * distance
        # value at (y+dy, x+dx), out-of-range marked invalid via lab2=-1
        q2 = shifted(q, -dy, -dx, 0)
        lab2 = shifted(lab, -dy, -dx, -1)
        inside2 = shifted(inside, -dy, -dx, False)
        pair_ok = inside & inside2 & (lab == lab2)
        codes.append(d * L2 + q * levels + q2)
        oks.append(pair_ok)
    return codes, oks


@partial(jax.jit, static_argnames=("max_cells", "levels", "distance", "chunk"))
def object_glcm(
    image: jax.Array,
    labels: jax.Array,
    max_cells: int = 1024,
    levels: int = 16,
    distance: int = 3,
    chunk: int = 32768,
    stats=None,
    quantized=None,
) -> jax.Array:
    """(H, W) image + labels -> (4, max_cells, levels, levels) normalized
    symmetric GLCMs (one per direction).

    MXU formulation: co-occurrence counting is a one-hot contraction
    G[lab, d*L²+p*L+q] = Σ_pixels 1[lab] · 1[dir-pair code], evaluated as
    chunked (chunk × max_cells)ᵀ @ (chunk × 4L²) matmuls — bf16 inputs are
    exact 0/1, f32 accumulation is exact for any realistic count. ~100x
    the XLA scatter formulation on TPU (scatters serialize).

    ``quantized``: optional precomputed (H, W) gray-level codes (see
    quantize_channels) — skips this call's own range lookup scan.
    """
    if quantized is not None:
        lab32 = labels.astype(jnp.int32)
        lab = jnp.where((lab32 > 0) & (lab32 < max_cells), lab32, 0)
        inside = labels > 0
        q = quantized
    else:
        lab, inside, q = _quantize(image, labels, max_cells, levels, stats)
    codes, oks = _direction_codes(lab, inside, q, levels, distance)

    # all 4 directions' co-occurrence histograms contract against ONE
    # label one-hot per pixel chunk (onehot_reduce.onehot_counts — on a
    # real TPU this dispatches to the Pallas VMEM-resident kernel; the
    # former in-function XLA scan held 1.0 s/batch of scan overhead +
    # 0.78 s of dots at the 5-ch op point, device-profiled)
    from saguaro_tpu.kernels.onehot_reduce import onehot_counts

    hs = onehot_counts(
        lab.reshape(-1),
        [(t.reshape(-1), o.reshape(-1), _n_tri(levels))
         for t, o in zip(_tri_codes(codes, levels), oks)],
        max_cells,
        chunk=chunk,
    )
    sym = jnp.stack(
        [_tri_expand(h, levels) for h in hs], axis=0
    )  # (4, max_cells, L, L)
    total = jnp.sum(sym, axis=(2, 3), keepdims=True)
    return sym / jnp.maximum(total, 1e-12)


@partial(jax.jit, static_argnames=("max_cells", "levels", "distance", "chunk"))
def object_glcm_multichannel(
    image: jax.Array,
    labels: jax.Array,
    max_cells: int = 1024,
    levels: int = 16,
    distance: int = 3,
    chunk: int = 32768,
    quantized=None,
) -> jax.Array:
    """(H, W, C) image + labels -> (C, 4, max_cells, L, L) GLCMs.

    All channels × directions ride ONE ``onehot_counts`` call (shared
    label one-hot per pixel chunk; Pallas VMEM kernel on a real TPU,
    which splits the C·4·L² columns into ≤1024-column launches).

    ``quantized``: optional precomputed (C, H, W) gray-level codes from
    ``quantize_channels`` — skips the per-channel range-lookup scans.
    """
    n_ch = image.shape[-1]
    from saguaro_tpu.kernels.onehot_reduce import onehot_counts

    lab32 = labels.astype(jnp.int32)
    lab = jnp.where((lab32 > 0) & (lab32 < max_cells), lab32, 0)
    entries = []
    for c in range(n_ch):
        if quantized is not None:
            inside, q = labels > 0, quantized[c]
        else:
            _, inside, q = _quantize(image[..., c], labels, max_cells, levels)
        codes, oks = _direction_codes(lab, inside, q, levels, distance)
        entries.extend(
            (t.reshape(-1), o.reshape(-1), _n_tri(levels))
            for t, o in zip(_tri_codes(codes, levels), oks)
        )
    hs = onehot_counts(lab.reshape(-1), entries, max_cells, chunk=chunk)
    sym = jnp.stack(
        [_tri_expand(h, levels) for h in hs], axis=0
    ).reshape(n_ch, 4, max_cells, levels, levels)
    total = jnp.sum(sym, axis=(3, 4), keepdims=True)
    return sym / jnp.maximum(total, 1e-12)


@partial(jax.jit, static_argnames=("max_cells", "levels", "distance"))
def object_glcm_scatter(
    image: jax.Array,
    labels: jax.Array,
    max_cells: int = 1024,
    levels: int = 16,
    distance: int = 3,
) -> jax.Array:
    """Reference scatter formulation (segment-sum); kept for parity tests."""
    L2 = levels * levels
    lab, inside, q = _quantize(image, labels, max_cells, levels)
    codes, oks = _direction_codes(lab, inside, q, levels, distance)

    def one_direction(code, ok):
        idx = lab * L2 + (code % L2)
        counts = jax.ops.segment_sum(
            ok.reshape(-1).astype(jnp.float32),
            idx.reshape(-1),
            num_segments=max_cells * L2,
        ).reshape(max_cells, levels, levels)
        sym = counts + jnp.swapaxes(counts, 1, 2)
        total = jnp.sum(sym, axis=(1, 2), keepdims=True)
        return sym / jnp.maximum(total, 1e-12)

    return jnp.stack([one_direction(c, o) for c, o in zip(codes, oks)])


@jax.jit
def haralick_features(glcm: jax.Array) -> dict[str, jax.Array]:
    """(..., L, L) normalized GLCMs -> dict of 13 Haralick stats (...)."""
    L = glcm.shape[-1]
    p = glcm
    eps = 1e-12
    i = jnp.arange(L, dtype=jnp.float32)
    ii = i[:, None]
    jj = i[None, :]

    px = jnp.sum(p, axis=-1)          # (..., L)
    py = jnp.sum(p, axis=-2)
    mux = jnp.sum(px * i, axis=-1)
    muy = jnp.sum(py * i, axis=-1)
    sigx = jnp.sqrt(jnp.maximum(jnp.sum(px * i**2, axis=-1) - mux**2, 0.0))
    sigy = jnp.sqrt(jnp.maximum(jnp.sum(py * i**2, axis=-1) - muy**2, 0.0))

    asm = jnp.sum(p * p, axis=(-2, -1))
    contrast = jnp.sum(p * (ii - jj) ** 2, axis=(-2, -1))
    corr_num = jnp.sum(p * ii * jj, axis=(-2, -1)) - mux * muy
    correlation = corr_num / jnp.maximum(sigx * sigy, eps)
    # Haralick "Variance" (sum of squares) uses the overall GLCM mean
    mu = jnp.sum(p * ii, axis=(-2, -1))
    variance = jnp.sum(p * (ii - mu[..., None, None]) ** 2, axis=(-2, -1))
    idm = jnp.sum(p / (1.0 + (ii - jj) ** 2), axis=(-2, -1))

    # p_{x+y}(k), k = i+j in [0, 2L-2]; p_{x-y}(k), k = |i-j| in [0, L-1]
    ksum = (ii + jj).astype(jnp.int32)
    kdiff = jnp.abs(ii - jj).astype(jnp.int32)
    batch = p.shape[:-2]
    p2 = p.reshape((-1, L, L))

    def sum_hist(pp):
        ps = jax.ops.segment_sum(pp.reshape(-1), ksum.reshape(-1), num_segments=2 * L - 1)
        pd = jax.ops.segment_sum(pp.reshape(-1), kdiff.reshape(-1), num_segments=L)
        return ps, pd

    ps, pd = jax.vmap(sum_hist)(p2)
    ps = ps.reshape(batch + (2 * L - 1,))
    pd = pd.reshape(batch + (L,))
    ks = jnp.arange(2 * L - 1, dtype=jnp.float32)
    kd = jnp.arange(L, dtype=jnp.float32)

    sum_avg = jnp.sum(ps * ks, axis=-1)
    sum_ent = -jnp.sum(ps * jnp.log2(ps + eps), axis=-1)
    sum_var = jnp.sum(ps * (ks - sum_avg[..., None]) ** 2, axis=-1)
    ent = -jnp.sum(p * jnp.log2(p + eps), axis=(-2, -1))
    diff_avg = jnp.sum(pd * kd, axis=-1)
    diff_var = jnp.sum(pd * (kd - diff_avg[..., None]) ** 2, axis=-1)
    diff_ent = -jnp.sum(pd * jnp.log2(pd + eps), axis=-1)

    hx = -jnp.sum(px * jnp.log2(px + eps), axis=-1)
    hy = -jnp.sum(py * jnp.log2(py + eps), axis=-1)
    pxy = px[..., :, None] * py[..., None, :]
    hxy1 = -jnp.sum(p * jnp.log2(pxy + eps), axis=(-2, -1))
    hxy2 = -jnp.sum(pxy * jnp.log2(pxy + eps), axis=(-2, -1))
    infomeas1 = (ent - hxy1) / jnp.maximum(jnp.maximum(hx, hy), eps)
    infomeas2 = jnp.sqrt(
        jnp.maximum(1.0 - jnp.exp(-2.0 * jnp.log(2.0) * (hxy2 - ent)), 0.0)
    )

    return {
        "AngularSecondMoment": asm,
        "Contrast": contrast,
        "Correlation": correlation,
        "Variance": variance,
        "InverseDifferenceMoment": idm,
        "SumAverage": sum_avg,
        "SumVariance": sum_var,
        "SumEntropy": sum_ent,
        "Entropy": ent,
        "DifferenceVariance": diff_var,
        "DifferenceEntropy": diff_ent,
        "InfoMeas1": infomeas1,
        "InfoMeas2": infomeas2,
    }

"""CP 4.2.8 threshold-module semantics for secondary-object identification.

The reference's IdentifySecondaryObjects runs inside CellProfiler with a
.cppipe that is not in the repo (Feature_extraction_opt.py:60,166-167),
so the exact knob settings are unknowable — but the MODULE's knob set is
standard (cellprofiler/modules/threshold.py): global threshold by
two-class Otsu / three-class Otsu / Minimum Cross-Entropy (Li), an
optional log transform, a correction factor, lower/upper bounds, and a
smoothing scale applied when BINARIZING (not when computing the
threshold). This module transcribes that knob set so a real pipeline's
settings can be dialed in (docs/PARITY.md E4 ceiling — previously a
fixed global 256-bin Otsu).

Grid notes: skimage's threshold_otsu uses a 256-bin histogram over the
data range and returns the argmax bin CENTER; threshold_multiotsu uses
128 bins and returns the two dividing bin centers; threshold_li iterates
t <- (mean_below - mean_above)/(log mean_below - log mean_above) from
the image mean to a half-grid tolerance. All three are transcribed
against numpy oracles in tests/test_thresholding.py (skimage itself is
not installed in this environment).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["global_threshold", "adaptive_threshold", "smooth_for_binarize"]


def _hist(data: jax.Array, valid: jax.Array, nbins: int):
    """Histogram over [min, max] of the valid data; returns (counts,
    centers). Uses the one-hot MXU count (scatters serialize on TPU)."""
    from saguaro_tpu.kernels.onehot_reduce import onehot_counts

    big = jnp.float32(3.4e38)
    lo = jnp.min(jnp.where(valid, data, big))
    hi = jnp.max(jnp.where(valid, data, -big))
    span = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip(((data - lo) / span * nbins), 0, nbins - 1).astype(jnp.int32)
    (hist,) = onehot_counts(
        q.reshape(-1),
        [(jnp.zeros(data.size, jnp.int32), valid.reshape(-1), 1)],
        nbins,
    )
    centers = (jnp.arange(nbins, dtype=jnp.float32) + 0.5) / nbins * span + lo
    return hist[:, 0], centers


def _otsu_from_hist(hist, centers):
    """skimage threshold_otsu on a precomputed histogram: maximize
    w0*w1*(mu0-mu1)^2 over split points, return the argmax bin center
    (the split bin belongs to the LOWER class, skimage convention)."""
    w = hist
    c1 = jnp.cumsum(w)
    m1 = jnp.cumsum(w * centers)
    tot_w = c1[-1]
    tot_m = m1[-1]
    w0, w1 = c1, tot_w - c1
    mu0 = m1 / jnp.maximum(w0, 1e-12)
    mu1 = (tot_m - m1) / jnp.maximum(w1, 1e-12)
    var_b = w0 * w1 * (mu0 - mu1) ** 2
    # skimage: variance12 computed for splits 0..nbins-2 (last bin can't
    # be a split)
    var_b = var_b.at[-1].set(-1.0)
    return centers[jnp.argmax(var_b)]


def _multiotsu3_from_hist(hist, centers):
    """skimage threshold_multiotsu(classes=3): maximize
    sum_k w_k * mu_k^2 over the two split points; returns the two
    dividing bin centers (each split bin belongs to the lower class)."""
    nbins = hist.shape[0]
    p = hist / jnp.maximum(jnp.sum(hist), 1.0)
    cw = jnp.concatenate([jnp.zeros(1), jnp.cumsum(p)])           # (nb+1,)
    cm = jnp.concatenate([jnp.zeros(1), jnp.cumsum(p * centers)])  # (nb+1,)

    def seg_score(lo, hi):  # classes are bins [lo, hi)
        w = cw[hi] - cw[lo]
        m = cm[hi] - cm[lo]
        return jnp.where(w > 0, m * m / jnp.maximum(w, 1e-30), 0.0)

    ii = jnp.arange(nbins)[:, None]
    jj = jnp.arange(nbins)[None, :]
    # splits (i, j): classes [0, i+1), [i+1, j+1), [j+1, nbins)
    s = (
        seg_score(jnp.zeros_like(ii), ii + 1)
        + seg_score(ii + 1, jj + 1)
        + seg_score(jj + 1, jnp.full_like(jj, nbins))
    )
    valid = (ii < jj) & (jj < nbins - 1)
    s = jnp.where(valid, s, -1.0)
    flat = jnp.argmax(s)
    i, j = flat // nbins, flat % nbins
    return centers[i], centers[j]


def _li_threshold(data, valid, tolerance):
    """skimage threshold_li (CP's Minimum Cross-Entropy): iterate
    t <- (mean_below - mean_above)/(ln mean_below - ln mean_above) on the
    min-shifted image, starting from the mean."""
    big = jnp.float32(3.4e38)
    validf = valid.astype(jnp.float32)
    vmin = jnp.min(jnp.where(valid, data, big))
    img = (data - vmin) * validf
    n = jnp.maximum(jnp.sum(validf), 1.0)
    t0 = jnp.sum(img * validf) / n

    def cond(st):
        t_curr, t_next, it = st
        return (jnp.abs(t_next - t_curr) > tolerance) & (it < 256)

    def body(st):
        _, t, it = st
        fore = (img > t) & valid
        foref = fore.astype(jnp.float32)
        n_fore = jnp.sum(foref)
        n_back = jnp.maximum(n - n_fore, 1e-12)
        mean_fore = jnp.sum(img * foref) / jnp.maximum(n_fore, 1e-12)
        mean_back = jnp.sum(img * (validf - foref)) / n_back
        # skimage guards mean_back == 0 by nudging with the tolerance
        mean_back = jnp.where(mean_back == 0, tolerance, mean_back)
        t_next = (mean_back - mean_fore) / (
            jnp.log(mean_back) - jnp.log(mean_fore)
        )
        return (t, t_next, it + 1)

    _, t_fin, _ = jax.lax.while_loop(cond, body, (t0 - 2 * tolerance - 1.0, t0, 0))
    return t_fin + vmin


@partial(
    jax.jit,
    static_argnames=("method", "log_transform", "middle_foreground", "nbins"),
)
def global_threshold(
    image: jax.Array,
    method: str = "otsu",
    log_transform: bool = False,
    middle_foreground: bool = True,
    correction: float = 1.0,
    lower_bound: float = 0.0,
    upper_bound: float = 3.0e38,
    li_tolerance: float = 0.5,
    nbins: int = 256,
):
    """CP 4.2.8 Threshold.get_global_threshold + bounds/correction.

    method: 'otsu' (two-class, 256 bins) | 'otsu3' (three-class,
    128 bins, ``middle_foreground`` picks which split is the threshold) |
    'li' (Minimum Cross-Entropy). ``log_transform`` computes the
    threshold on log1p(values) and maps back with expm1 (CP 4.2's
    "Log transform before thresholding?"). Returns (final, orig):
    final = clip(orig * correction, lower, upper).
    """
    data = image.astype(jnp.float32)
    valid = jnp.isfinite(data)
    if log_transform:
        data = jnp.log1p(jnp.maximum(data, 0.0))
    if method == "otsu":
        hist, centers = _hist(data, valid, nbins)
        thr = _otsu_from_hist(hist, centers)
    elif method == "otsu3":
        hist, centers = _hist(data, valid, 128)
        t_lo, t_hi = _multiotsu3_from_hist(hist, centers)
        # CP: middle class to foreground -> threshold at the LOWER split
        thr = t_lo if middle_foreground else t_hi
    elif method == "li":
        tol = li_tolerance
        if log_transform:
            # the half-grid tolerance lives in log space too
            tol = jnp.log1p(jnp.asarray(li_tolerance, jnp.float32)) * 0.5 + 1e-6
        thr = _li_threshold(data, valid, tol)
    else:
        raise ValueError(f"unknown threshold method {method!r}")
    if log_transform:
        thr = jnp.expm1(thr)
    final = jnp.clip(thr * correction, lower_bound, upper_bound)
    return final, thr


def _block_bounds(n: int, nblocks: int) -> list[int]:
    """CP block boundaries: int(i * n/nblocks) for i in 0..nblocks —
    float increment truncated per block (threshold.py adaptive grid)."""
    inc = n / nblocks
    return [int(i * inc) for i in range(nblocks)] + [n]


@partial(
    jax.jit,
    static_argnames=(
        "method", "window_size", "log_transform", "middle_foreground", "nbins",
    ),
)
def adaptive_threshold(
    image: jax.Array,
    method: str = "otsu",
    window_size: int = 50,
    log_transform: bool = False,
    middle_foreground: bool = True,
    correction: float = 1.0,
    lower_bound: float = 0.0,
    upper_bound: float = 3.0e38,
    li_tolerance: float = 0.5,
    nbins: int = 256,
):
    """CP 4.2.8 Threshold module, adaptive scope (threshold_scope =
    'Adaptive', cellprofiler/modules/threshold.py get_local_threshold):

    * the image is split into a grid of ``image_size // window_size``
      blocks per axis (float increment, int-truncated boundaries); fewer
      than 2 blocks on either axis is a config error (CP: "Adaptive
      window cannot exceed 50%% of an image dimension");
    * the selected method runs per block exactly as the global scope
      runs on the whole image, filling each block of the threshold map
      with its block's value (CP 4 dropped centrosome's spline
      interpolation — the map is block-constant);
    * a degenerate block (constant values) takes that constant; an
      empty block takes the global guide threshold;
    * the per-pixel map is corrected then CLIPPED to
      [0.7, 1.5] x (global guide threshold x correction) — the CP
      bound that keeps local outliers near the global estimate — and
      finally to [lower_bound, upper_bound].

    Returns ``(final_map (H, W), guide_final scalar, orig_map (H, W))``;
    CP's scalar Threshold_FinalThreshold/OrigThreshold measurements for
    adaptive scope are the MEANS of the returned maps.

    TPU shape: the per-block histograms ride ONE fused one-hot MXU
    contraction (labels = static block ids — kernels/onehot_reduce), the
    split-point searches are vmapped closed forms over blocks, and the
    block map is a small-table row gather; no scatters, static shapes.
    """
    h, w = image.shape
    nb_i, nb_j = h // window_size, w // window_size
    if nb_i < 2 or nb_j < 2:
        raise ValueError(
            f"Adaptive window {window_size} cannot exceed 50% of an image"
            f" dimension (image {h}x{w})"
        )
    bounds_i = _block_bounds(h, nb_i)
    bounds_j = _block_bounds(w, nb_j)
    nb = nb_i * nb_j

    # global guide (same knobs, no correction/bounds yet — CP corrects
    # and bounds the guide alongside the local values)
    _, guide_orig = global_threshold(
        image, method=method, log_transform=log_transform,
        middle_foreground=middle_foreground, correction=1.0,
        lower_bound=0.0, upper_bound=3.0e38, li_tolerance=li_tolerance,
        nbins=nbins,
    )

    data = image.astype(jnp.float32)
    valid = jnp.isfinite(data)
    if log_transform:
        data = jnp.log1p(jnp.maximum(data, 0.0))

    # static (H, W) block-id map: searchsorted over static boundaries
    import numpy as np

    row_blk = np.searchsorted(np.asarray(bounds_i[1:-1]), np.arange(h), "right")
    col_blk = np.searchsorted(np.asarray(bounds_j[1:-1]), np.arange(w), "right")
    block_id = jnp.asarray(row_blk[:, None] * nb_j + col_blk[None, :])

    big = jnp.float32(3.4e38)
    validf = valid.astype(jnp.float32)
    n_valid = jnp.zeros(nb).at[block_id.reshape(-1)].add(validf.reshape(-1))

    use_blocks = method in ("otsu", "otsu3")
    if use_blocks:
        blk_bins = nbins if method == "otsu" else 128
        # per-block min/max (min/max reductions stay scatters — CLAUDE.md)
        vmin = (
            jnp.full(nb, big)
            .at[block_id.reshape(-1)]
            .min(jnp.where(valid, data, big).reshape(-1))
        )
        vmax = (
            jnp.full(nb, -big)
            .at[block_id.reshape(-1)]
            .max(jnp.where(valid, data, -big).reshape(-1))
        )
        span = jnp.maximum(vmax - vmin, 1e-12)
        from saguaro_tpu.kernels.onehot_reduce import mxu_take, onehot_counts

        per_px = mxu_take(
            jnp.stack([vmin, span], axis=1), block_id.reshape(-1), nb
        )
        q = jnp.clip(
            (data.reshape(-1) - per_px[:, 0]) / per_px[:, 1] * blk_bins,
            0,
            blk_bins - 1,
        ).astype(jnp.int32)
        (hist,) = onehot_counts(
            block_id.reshape(-1), [(q, valid.reshape(-1), blk_bins)], nb
        )
        centers = (
            (jnp.arange(blk_bins, dtype=jnp.float32)[None, :] + 0.5)
            / blk_bins * span[:, None]
            + vmin[:, None]
        )
        if method == "otsu":
            thr_blocks = jax.vmap(_otsu_from_hist)(hist, centers)
        else:
            t_lo, t_hi = jax.vmap(_multiotsu3_from_hist)(hist, centers)
            thr_blocks = t_lo if middle_foreground else t_hi
        # constant block: skimage returns the constant value
        thr_blocks = jnp.where(vmax - vmin <= 0, vmin, thr_blocks)
    elif method == "li":
        tol = li_tolerance
        if log_transform:
            tol = jnp.log1p(jnp.asarray(li_tolerance, jnp.float32)) * 0.5 + 1e-6
        # pad blocks to a common shape and vmap the global Li iteration
        bh = max(b - a for a, b in zip(bounds_i, bounds_i[1:]))
        bw = max(b - a for a, b in zip(bounds_j, bounds_j[1:]))
        blocks, bvalid = [], []
        for i in range(nb_i):
            i0, i1 = bounds_i[i], bounds_i[i + 1]
            for j in range(nb_j):
                j0, j1 = bounds_j[j], bounds_j[j + 1]
                pad = ((0, bh - (i1 - i0)), (0, bw - (j1 - j0)))
                blocks.append(jnp.pad(data[i0:i1, j0:j1], pad))
                bvalid.append(
                    jnp.pad(valid[i0:i1, j0:j1], pad, constant_values=False)
                )
        blocks = jnp.stack(blocks)
        bvalid = jnp.stack(bvalid)
        thr_blocks = jax.vmap(lambda d, v: _li_threshold(d, v, tol))(
            blocks, bvalid
        )
    else:
        raise ValueError(f"unknown threshold method {method!r}")

    # empty block -> global guide (still in transformed space)
    guide_t = jnp.log1p(jnp.maximum(guide_orig, 0.0)) if log_transform else guide_orig
    thr_blocks = jnp.where(n_valid > 0, thr_blocks, guide_t)
    if log_transform:
        thr_blocks = jnp.expm1(thr_blocks)

    orig_map = thr_blocks[block_id]  # small-table gather (nb rows)
    guide_corr = guide_orig * correction
    bounded = jnp.clip(orig_map * correction, 0.7 * guide_corr, 1.5 * guide_corr)
    final_map = jnp.clip(bounded, lower_bound, upper_bound)
    guide_final = jnp.clip(guide_corr, lower_bound, upper_bound)
    return final_map, guide_final, orig_map


@partial(jax.jit, static_argnames=("truncate",))
def smooth_for_binarize(
    image: jax.Array, sigma: jax.Array | float, truncate: float = 4.0
):
    """CP Threshold.apply_threshold smoothing: gaussian_filter(x, sigma,
    mode='constant', cval=0) normalized by the blurred all-ones mask
    (centrosome smooth_with_function) — edge-corrected separable blur.
    CP derives sigma from the smoothing-scale knob as
    ``scale / 0.6744 / 2``; callers pass sigma directly.
    """
    h, w = image.shape
    sigma = jnp.maximum(jnp.asarray(sigma, jnp.float32), 1e-6)
    # static kernel radius from a conservative sigma bound (jit-static):
    # smoothing scales are O(1) in CP pipelines; cap radius at 32
    radius = 32
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    # scipy truncates the kernel at truncate*sigma; zero taps beyond it
    k = jnp.where(jnp.abs(x) <= truncate * sigma + 0.5, k, 0.0)
    k = k / jnp.sum(k)

    def blur1d(a, axis):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (radius, radius)
        ap = jnp.pad(a, pad)
        if axis == 0:
            win = jnp.stack(
                [ap[i : i + h, :] for i in range(2 * radius + 1)], axis=0
            )
            return jnp.tensordot(k, win, axes=1)
        win = jnp.stack(
            [ap[:, i : i + w] for i in range(2 * radius + 1)], axis=0
        )
        return jnp.tensordot(k, win, axes=1)

    num = blur1d(blur1d(image.astype(jnp.float32), 0), 1)
    ones = jnp.ones_like(image, jnp.float32)
    den = blur1d(blur1d(ones, 0), 1)
    return num / jnp.maximum(den, 1e-12)

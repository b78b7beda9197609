"""Per-object colocalization statistics — CP 4.2.8 MeasureColocalization.

The reference's CellProfiler engine emits the full colocalization set per
channel pair (Correlation, Slope, Overlap, K, Manders, RWC, Costes) and
the downstream profile stages consume every numeric column
(Normalize_CP_ami.py:47-64, Pycyto_pertime.py:61-75). The Pearson
correlation and slope already ride the fused C2 lane scan
(kernels/fused_measure.py); Overlap/K derive algebraically from the same
sums. This module supplies the three THRESHOLDED families, which need
machinery of their own:

  Manders M1/M2   per-object 15 %-of-max thresholds on both channels,
                  masked sums over the "combined" (both-above) pixel set
  RWC             the Manders sums weighted by (R - |rank_f - rank_s|)/R
                  where rank_* are DENSE ranks of the pixel intensities
                  over the whole masked pixel vector (CP lexsort/cumsum
                  semantics) and R = max rank + 1
  Costes C1/C2    image-wide automated thresholds from CP's
                  linear_costes descent (orthogonal regression line,
                  Pearson of below-threshold pixels stepped to <= 0),
                  then per-object masked sums

TPU formulation (no scatters, no per-element gathers):

  * dense ranks: two-level (hi, lo) byte decomposition of the 16-bit
    intensity code. A (256, 256) presence table per channel comes from
    ONE onehot_counts contraction; exclusive cumsums turn it into a
    dense-rank lookup table; per-pixel ranks are recovered by a chunked
    one-hot row-pick (matmul against the table, elementwise lo select) —
    exact for integer-grid (uint16) inputs, 16-bit-quantized tie
    structure for float inputs.
  * Costes: per-pair joint (code_f, code_s) COUNT tables at the CP
    threshold grid (1/costes_scale steps; CP's own default scale is
    255), double suffix-cumsums giving O(1) rectangle sums of
    (n, Sf, Ss, Sff, Sss, Sfs), and a vmapped lax.while_loop stepping
    the threshold down exactly as CP's linear_costes (fast or accurate
    stepping). Thresholds and region sums are exact when pixel values
    lie on the grid (e.g. 8-bit-scaled data at scale 255); off-grid
    values bin to the floor code — documented in docs/PARITY.md.
  * the masked per-object sums for all three families ride ONE
    fused_measure._lane_scan pass (pass E) whose lanes are built
    in-chunk from the raw values, the rank images, and the per-object
    thresholds gathered from a (max_cells, C) table.

Scale invariance lets every lane run on RAW intensity values (all ten
statistics are ratios); only the Costes threshold search normalizes to
CP's [0, 1] convention (uint16 -> /65535; floats -> /global max).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

__all__ = [
    "dense_rank_images",
    "costes_thresholds",
    "costes_fine_refine",
    "coloc_threshold_sums",
    "colocalization_features",
    "colocalization_features_multiset",
]


def _exclusive_cumsum(x, axis):
    c = jnp.cumsum(x, axis=axis)
    return c - x


def _pick_rows_mc(hi, lo, tables, chunk=32768):
    """Per-pixel 2-level table lookups, every table sharing each pixel's
    one-hot: out[i, k] = tables[g(k)][hi[i, c(k)], lo[i, c(k)], k'].

    hi/lo: (N, C) int32 byte codes; tables: (C, 256, 256, K) f32 of
    16-bit integer values (dense ranks; K tables per channel — e.g. one
    per object set). Each table splits EXACTLY into two byte planes
    t = 256*t_hi + t_lo with both planes in [0, 256); shifting by -128
    puts them in int8 range, so the row gather runs as s8 x s8 -> s32
    MXU dots (2x the bf16 rate, exact) with the +128 offset restored in
    closed form (the one-hot row sums to 1). The column pick is an
    elementwise one-hot multiply-sum. 15 separate f32 scans held
    ~1.3 s/batch-8 of the device profile; the merged s8 scan leaves
    only the (irreducible) 2-level dot FLOPs.

    On a real TPU this dispatches to ``segment_pallas.pick2_pallas``:
    XLA runs these int8 one-hot dots EMULATED at ~5% of the s8 MXU rate
    (233 ms/site at the 5-ch op point, device-measured); the Mosaic form
    keeps the one-hots in VMEM and hits the int8 roofline.
    """
    from saguaro_tpu.kernels.segment_pallas import pick2_pallas, use_pallas

    if use_pallas():
        return pick2_pallas(hi, lo, tables)
    n, n_ch = hi.shape
    k_tab = tables.shape[-1]
    n_pad = (-n) % chunk
    hi_f = jnp.pad(hi, ((0, n_pad), (0, 0)))
    lo_f = jnp.pad(lo, ((0, n_pad), (0, 0)))
    n_chunks = (n + n_pad) // chunk
    t_hi_plane = jnp.floor(tables / 256.0)
    t_lo_plane = tables - t_hi_plane * 256.0
    # (C, 256, 256*K) s8 with the -128 shift
    t_hi8 = (t_hi_plane - 128.0).astype(jnp.int8).reshape(n_ch, 256, 256 * k_tab)
    t_lo8 = (t_lo_plane - 128.0).astype(jnp.int8).reshape(n_ch, 256, 256 * k_tab)

    def body(_, idx):
        sl = idx * chunk
        hi_c = jax.lax.dynamic_slice_in_dim(hi_f, sl, chunk)
        lo_c = jax.lax.dynamic_slice_in_dim(lo_f, sl, chunk)
        outs = []
        for c in range(n_ch):
            hi_oh = jax.nn.one_hot(hi_c[:, c], 256, dtype=jnp.int8)
            dot = lambda t: jax.lax.dot_general(
                hi_oh, t,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            r_hi, r_lo = jax.lax.optimization_barrier(
                (dot(t_hi8[c]), dot(t_lo8[c]))
            )  # (chunk, 256*K) s32, offset by -128
            rows = (
                256.0 * (r_hi.astype(jnp.float32) + 128.0)
                + (r_lo.astype(jnp.float32) + 128.0)
            ).reshape(hi_oh.shape[0], 256, k_tab)
            lo_oh = jax.nn.one_hot(lo_c[:, c], 256, dtype=jnp.float32)
            outs.append(jnp.sum(rows * lo_oh[:, :, None], axis=1))  # (chunk, K)
        return None, jnp.stack(outs, axis=1)  # (chunk, C, K)

    _, ys = jax.lax.scan(body, None, jnp.arange(n_chunks))
    return ys.reshape(-1, n_ch, k_tab)[:n]


def _rank_table(cnt2: jax.Array):
    """(256, 256) value-count table -> (dense-rank lookup table,
    n_distinct). rank[v] = number of DISTINCT present values < v."""
    presence = (cnt2 > 0).astype(jnp.float32)
    lo_excl = _exclusive_cumsum(presence, axis=1)
    row_tot = jnp.sum(presence, axis=1)
    hi_off = _exclusive_cumsum(row_tot, axis=0)
    return hi_off[:, None] + lo_excl, jnp.sum(presence)


def _value_count_tables(hi, lo, insides):
    """Per (channel, mask) joint byte-count tables, each channel's masks
    sharing ONE label one-hot per chunk: returns (C, 256, 256, M)."""
    from saguaro_tpu.kernels.onehot_reduce import onehot_counts

    n_ch = hi.shape[1]
    out = []
    for c in range(n_ch):
        cnts = onehot_counts(
            hi[:, c], [(lo[:, c], m, 256) for m in insides], 256
        )
        out.append(jnp.stack(cnts, axis=-1))
    return jnp.stack(out)  # (C, 256, 256, M)


def dense_rank_images(codes: jax.Array, inside: jax.Array):
    """Dense intensity ranks over the masked pixel vector, per channel.

    codes: (N, C) int32 16-bit intensity codes; inside: (N,) bool mask
    (the object set's ``labels > 0``). Returns (ranks (N, C) f32 — dense
    rank of each pixel's value among the DISTINCT values present inside
    the mask, 0-based; n_distinct (C,) f32). Matches CP's
    lexsort/cumsum dense ranking (measurecolocalization.py RWC block)
    exactly for integer-grid inputs; outside-mask pixels get rank 0
    (they never enter a masked sum).
    """
    n, n_ch = codes.shape
    hi = (codes >> 8).astype(jnp.int32)
    lo = (codes & 0xFF).astype(jnp.int32)
    cnts = _value_count_tables(hi, lo, [inside])  # (C, 256, 256, 1)
    tables = []
    n_distinct = []
    for c in range(n_ch):
        t, nd = _rank_table(cnts[c, :, :, 0])
        tables.append(t[:, :, None])
        n_distinct.append(nd)
    ranks = _pick_rows_mc(hi, lo, jnp.stack(tables))[:, :, 0]
    return ranks, jnp.stack(n_distinct)


# ---------------------------------------------------------------------------
# Costes automated thresholds (CP linear_costes transcription)
# ---------------------------------------------------------------------------


def _suffix2(table):
    """S[i, j] = sum_{a>=i, b>=j} table[a, b], padded so index S -> 0."""
    s = jnp.flip(jnp.cumsum(jnp.flip(table, 0), axis=0), 0)
    s = jnp.flip(jnp.cumsum(jnp.flip(s, 1), axis=1), 1)
    return jnp.pad(s, ((0, 1), (0, 1)))


def costes_thresholds(
    values: jax.Array,
    inside: jax.Array,
    pairs: tuple[tuple[int, int], ...],
    scale: int = 255,
    fast: bool = True,
    joint: dict[tuple[int, int], jax.Array] | None = None,
    return_bracket: bool = False,
):
    """CP 4.2.8 linear_costes for every channel pair at once.

    values: (N, C) f32 intensities NORMALIZED to CP's [0, 1] convention;
    inside: (N,) bool. Returns (thr_f (P,), thr_s (P,)) in the same
    normalized units. Thresholds step on the 1/scale grid exactly as
    CP's descent; region counts/moments come from per-pair joint count
    tables, so the Pearson stopping criterion is exact for values on
    the grid and bin-floor-approximated otherwise.

    ``return_bracket=True`` additionally returns ``(regs (P, 2),
    thr_k (P,), prev_k (P,))`` — the regression coefficients, the
    stopping grid index, and the previously VISITED grid index (where
    the descent still saw a positive Pearson). ``[thr_k, prev_k]``
    brackets the true stopping point for ``costes_fine_refine``.
    """
    from saguaro_tpu.kernels.onehot_reduce import onehot_counts

    n_ch = values.shape[1]
    s_codes = scale + 1
    code = jnp.clip((values * scale).astype(jnp.int32), 0, scale)

    # joint count tables, fused by leading channel (one label one-hot
    # per chunk serves every partner's histogram); callers with several
    # object sets pass precomputed/summed tables instead
    if joint is None:
        by_a: dict[int, list[int]] = {}
        for a, b in pairs:
            by_a.setdefault(a, []).append(b)
        joint = {}
        for a, bs in by_a.items():
            outs = onehot_counts(
                code[:, a],
                [(code[:, b], inside, s_codes) for b in bs],
                s_codes,
            )
            for b, t in zip(bs, outs):
                joint[(a, b)] = t

    insf = inside.astype(jnp.float32)
    i_step = 1.0 / scale
    val = jnp.arange(s_codes, dtype=jnp.float32) * i_step

    suf_list = []
    reg_ab = []
    maxes = []
    k0s = []
    for a, b in pairs:
        cnt2 = joint[(a, b)]
        va2 = val[:, None]
        vb2 = val[None, :]
        suf = jnp.stack(
            [
                _suffix2(cnt2),
                _suffix2(cnt2 * va2),
                _suffix2(cnt2 * vb2),
                _suffix2(cnt2 * va2 * va2),
                _suffix2(cnt2 * vb2 * vb2),
                _suffix2(cnt2 * va2 * vb2),
            ],
            axis=0,
        )  # (6, S+1, S+1)
        suf_list.append(suf)

        fa, fb = values[:, a], values[:, b]
        nz = insf * ((fa > 0) | (fb > 0)).astype(jnp.float32)
        m = jnp.maximum(jnp.sum(nz), 1.0)
        xm = jnp.sum(fa * nz) / m
        ym = jnp.sum(fb * nz) / m
        dd = jnp.maximum(m - 1.0, 1.0)
        xvar = jnp.sum((fa - xm) ** 2 * nz) / dd
        yvar = jnp.sum((fb - ym) ** 2 * nz) / dd
        zm = xm + ym
        zvar = jnp.sum((fa + fb - zm) ** 2 * nz) / dd
        covar = 0.5 * (zvar - (xvar + yvar))
        denom = 2.0 * covar
        num = (yvar - xvar) + jnp.sqrt((yvar - xvar) ** 2 + 4.0 * covar**2)
        slope_a = num / denom
        slope_b = ym - slope_a * xm
        reg_ab.append(jnp.stack([slope_a, slope_b]))

        big = jnp.float32(3.4e38)
        fa_max = jnp.max(jnp.where(inside, fa, -big))
        fb_max = jnp.max(jnp.where(inside, fb, -big))
        maxes.append(jnp.stack([fa_max, fb_max]))
        img_max = jnp.maximum(fa_max, fb_max)
        # i = i_step * ((img_max // i_step) + 1); track k = i / i_step
        k0s.append(jnp.floor(img_max / i_step) + 1.0)

    sufs = jnp.stack(suf_list)          # (P, 6, S+1, S+1)
    regs = jnp.stack(reg_ab)            # (P, 2)
    mx = jnp.stack(maxes)               # (P, 2)
    k0 = jnp.stack(k0s)                 # (P,)

    def pearson_below(suf, ia, jb):
        """Pearson over the complement of the [ia:, jb:] rectangle."""
        rect = jax.lax.dynamic_slice(suf, (0, ia, jb), (6, 1, 1))[:, 0, 0]
        tot = suf[:, 0, 0]
        n, sf, ss, sff, sss, sfs = tuple(tot - rect)
        num = n * sfs - sf * ss
        den = jnp.sqrt(
            jnp.maximum(n * sff - sf * sf, 0.0)
            * jnp.maximum(n * sss - ss * ss, 0.0)
        )
        # scipy.pearsonr on constant input returns nan (CP then keeps
        # stepping: nan fails every <=/> branch and falls to step 1)
        return jnp.where(den > 0, num / den, jnp.nan), n

    def one_pair(suf, reg, mxp, k_init):
        a, b = reg[0], reg[1]
        fa_max, fb_max = mxp[0], mxp[1]

        # skip-loop: while i > fi_max and a*i+b > si_max: i -= i_step
        def skip_cond(k):
            i = k * i_step
            return (i > fa_max) & (a * i + b > fb_max)

        k = jax.lax.while_loop(skip_cond, lambda k: k - 1.0, k_init)

        # main loop over (k, thr_k, prev_k, done); thr assigned at loop
        # TOP; prev_k trails one visited step behind (bracket for the
        # fine refinement)
        def cond(st):
            k, thr_k, prev_k, done = st
            return (k > 1.0) & ~done

        def body(st):
            k, thr_prev, _, done = st
            thr_f = k * i_step
            thr_s = a * thr_f + b
            ia = jnp.clip(k, 0, s_codes).astype(jnp.int32)
            jb = jnp.clip(jnp.ceil(thr_s * scale), 0, s_codes).astype(jnp.int32)
            cost_reg, n_below = pearson_below(suf, ia, jb)
            # CP: pearsonr raises on < 2 points -> break (thr keeps this i)
            stop = (cost_reg <= 0) | (n_below < 2.0)
            step = jnp.where(
                (~jnp.asarray(fast)) | (k < 10.0),
                1.0,
                jnp.where(
                    cost_reg > 0.45, 10.0,
                    jnp.where(cost_reg > 0.35, 5.0,
                              jnp.where(cost_reg > 0.25, 2.0, 1.0)),
                ),
            )
            return (k - step, k, thr_prev, stop)

        k_fin, thr_k, prev_k, _ = jax.lax.while_loop(
            cond, body, (k, k_init, k_init, False)
        )
        # if the main loop never ran, CP returns the pre-skip start i
        thr_f = thr_k * i_step
        return thr_f, a * thr_f + b, thr_k, prev_k

    thr_f, thr_s, thr_k, prev_k = jax.vmap(one_pair)(sufs, regs, mx, k0)
    if return_bracket:
        return thr_f, thr_s, (regs, thr_k, prev_k)
    return thr_f, thr_s


def costes_fine_refine(
    values: jax.Array,
    inside: jax.Array,
    pairs: tuple[tuple[int, int], ...],
    regs: jax.Array,
    prev_k: jax.Array,
    scale: int = 255,
    fine: int = 65535,
    fast: bool = True,
):
    """Second-level Costes descent at the data's own resolution.

    CP's linear_costes runs at ``scale_max`` = the image bit depth
    (1/65535 steps for uint16), which a 65536^2 joint table cannot
    realize on-device. Instead: the coarse pass brackets the stopping
    point between its last two visited grid cells ([thr_k, prev_k],
    ``return_bracket``), and this pass evaluates the EXACT Pearson
    stopping statistic at every fine candidate inside the bracket.

    TPU shape: for descending fine candidates t, the above-threshold
    rectangle {v_a >= ta_t} & {v_b >= tb_t} only ever GROWS (tb_t moves
    monotonically with ta_t since tb = slope*ta + b), so each pixel
    ENTERS the rectangle at one candidate index (and EXITS at one, when
    slope < 0). Rectangle moments per candidate are therefore cumulative
    sums over a per-candidate-index entry/exit histogram — ONE
    ``segment_matmul_sums`` pass over the pixels per pair (labels =
    entry/exit index, 6 moment lanes), no 2D fine table. CP's stepping
    rules then walk the precomputed (M,) Pearson vector.

    Exactness: thresholds land on CP's 1/fine grid; the stopping
    statistic is exact for values on the grid (uint16 data). Assumes the
    Pearson sign does not dip negative and recover INSIDE one coarse
    step — the same class of assumption CP's own 'Fast' mode makes when
    it steps by 2/5/10.

    values: (N, C) normalized to [0, 1]; regs/prev_k from the coarse
    pass. Returns (thr_f (P,), thr_s (P,)) in normalized units.
    """
    from saguaro_tpu.kernels.onehot_reduce import segment_matmul_sums

    assert fine % scale == 0, (fine, scale)
    r_ratio = fine // scale
    m_cand = ((10 if fast else 1) + 1) * r_ratio + 2  # bracket + skip margin
    i_f = 1.0 / fine
    n_px = values.shape[0]
    insf = inside.astype(jnp.float32)
    big = jnp.float32(3.4e38)

    # fine integer codes: grid data (v = k/fine) rounds back exactly
    codes_f = jnp.clip(
        jnp.round(values * fine), 0, fine
    ).astype(jnp.int32)
    vals_f = codes_f.astype(jnp.float32) * i_f

    # Pearson is shift-invariant: CENTER the values by their inside
    # means before building moments — uncentered f32 products cancel
    # catastrophically near the costReg ~ 0 crossing (measured: the
    # stopping index wandered ~20 fine steps; centered it is exact to a
    # couple of steps of the f64 oracle)
    n_tot = jnp.sum(insf)
    mu = jnp.sum(vals_f * insf[:, None], axis=0) / jnp.maximum(n_tot, 1.0)
    vals_c = vals_f - mu[None, :]
    vin = vals_c * insf[:, None]
    ch_sum = jnp.sum(vin, axis=0)                         # (C,) ~ 0
    gram = jnp.dot(
        vin.T, vals_c, precision=jax.lax.Precision.HIGHEST
    )                                                     # (C, C) centered products

    a_idx = jnp.asarray([a for a, _ in pairs])
    b_idx = jnp.asarray([b for _, b in pairs])

    def one_pair(carry, p):
        slope, icept = regs[p, 0], regs[p, 1]
        ca_ch, cb_ch = a_idx[p], b_idx[p]
        code_a = jnp.take(codes_f, ca_ch, axis=1)
        code_b = jnp.take(codes_f, cb_ch, axis=1)
        va = jnp.take(vals_c, ca_ch, axis=1)   # centered (moments only)
        vb = jnp.take(vals_c, cb_ch, axis=1)
        fa_max = jnp.max(
            jnp.where(inside, jnp.take(vals_f, ca_ch, axis=1), -big)
        )
        fb_max = jnp.max(
            jnp.where(inside, jnp.take(vals_f, cb_ch, axis=1), -big)
        )
        k0f = jnp.floor(jnp.maximum(fa_max, fb_max) / i_f) + 1.0

        # CP's fine skip loop: while i > fa_max and slope*i+b > fb_max
        def skip_cond(k):
            i = k * i_f
            return (i > fa_max) & (slope * i + icept > fb_max)

        k_skip = jax.lax.while_loop(skip_cond, lambda k: k - 1.0, k0f)
        k_hi = jnp.minimum(prev_k[p] * r_ratio, k_skip)

        t_idx = jnp.arange(m_cand, dtype=jnp.float32)
        kf = k_hi - t_idx                                  # descending
        jb_t = jnp.clip(
            jnp.ceil(slope * kf + icept * fine), 0, fine + 1
        )                                                  # (M,) f32

        # entry candidate per pixel: a-cond code_a >= kf(t) <=> t >= ca
        ca = jnp.clip(k_hi - code_a.astype(jnp.float32), 0.0, float(m_cand))
        pos = slope >= 0
        # slope>=0: jb_t non-increasing -> b-cond true for t >= cb
        cb_pos = m_cand - jnp.searchsorted(
            jb_t[::-1], code_b.astype(jnp.float32), side="right"
        ).astype(jnp.float32)
        # slope<0: jb_t non-decreasing -> b-cond true for t < exit
        exit_neg = jnp.searchsorted(
            jb_t, code_b.astype(jnp.float32), side="right"
        ).astype(jnp.float32)
        enter = jnp.where(pos, jnp.maximum(ca, cb_pos), ca)
        exit_ = jnp.where(pos, float(m_cand), exit_neg)
        dead = (~inside) | (exit_ <= enter)
        enter = jnp.where(dead, float(m_cand), enter).astype(jnp.int32)
        exit_ = jnp.where(dead | (exit_ >= m_cand), float(m_cand), exit_)
        exit_ = exit_.astype(jnp.int32)

        lanes = jnp.stack(
            [jnp.ones_like(va), va, vb, va * va, vb * vb, va * vb], axis=1
        )
        labels2 = jnp.concatenate([enter, exit_])
        vals2 = jnp.concatenate([lanes, -lanes])
        tbl = segment_matmul_sums(labels2, vals2, m_cand + 1)  # (M+1, 6)
        rect = jnp.cumsum(tbl[:m_cand], axis=0)               # (M, 6)

        tot = jnp.stack(
            [
                n_tot,
                ch_sum[ca_ch],
                ch_sum[cb_ch],
                gram[ca_ch, ca_ch],
                gram[cb_ch, cb_ch],
                gram[ca_ch, cb_ch],
            ]
        )
        below = tot[None, :] - rect
        n_b, sf, ss, sff, sss, sfs = (below[:, i] for i in range(6))
        num = n_b * sfs - sf * ss
        den = jnp.sqrt(
            jnp.maximum(n_b * sff - sf * sf, 0.0)
            * jnp.maximum(n_b * sss - ss * ss, 0.0)
        )
        pear = jnp.where(den > 0, num / den, jnp.nan)          # (M,)

        # CP's walk over the candidates (thr assigned at loop top)
        def cond(st):
            t, thr_t, done = st
            return (k_hi - t > 1.0) & ~done & (t < m_cand)

        def body(st):
            t, _, done = st
            ti = t.astype(jnp.int32)
            cost = pear[ti]
            nb = n_b[ti]
            stop = (cost <= 0) | (nb < 2.0)
            k_here = k_hi - t
            step = jnp.where(
                (~jnp.asarray(fast)) | (k_here < 10.0),
                1.0,
                jnp.where(
                    cost > 0.45, 10.0,
                    jnp.where(cost > 0.35, 5.0,
                              jnp.where(cost > 0.25, 2.0, 1.0)),
                ),
            )
            return (t + step, t, stop)

        t_end, t_thr, _ = jax.lax.while_loop(
            cond, body, (jnp.float32(0.0), jnp.float32(0.0), False)
        )
        # loop never ran (k_hi <= 1): CP keeps its pre-skip start
        thr_k_fine = jnp.where(k_hi > 1.0, k_hi - t_thr, k0f)
        thr_f = thr_k_fine * i_f
        return carry, (thr_f, slope * thr_f + icept)

    _, (thr_f, thr_s) = jax.lax.scan(
        one_pair, 0, jnp.arange(len(pairs))
    )
    return thr_f, thr_s


# ---------------------------------------------------------------------------
# pass E: the thresholded masked sums (one lane scan per object set)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _make_lanes_e_fn_t(n_ch: int, pairs: tuple[tuple[int, int], ...]):
    def lanes_e_fn_t(lab_row, g, consts, in_c, vr_c, rk_c):
        # lane-major twin: vr_c/rk_c are (C, TILE), g (C, TILE) gathered
        # tff rows; consts = (costes thr_f (P,1-ish), thr_s, invR) ride
        # as (1, P) kernel inputs
        thr_a2, thr_b2, inv_r2 = consts
        above = (vr_c > g).astype(jnp.float32) * in_c[None]
        rows = [vr_c * above]
        mand, rwcs, cots = [], [], []
        for p, (a, b) in enumerate(pairs):
            cmb = above[a] * above[b]
            mand.append((vr_c[a] * cmb)[None])
            mand.append((vr_c[b] * cmb)[None])
            w = (1.0 - jnp.abs(rk_c[a] - rk_c[b]) * inv_r2[0, p])
            rwcs.append((vr_c[a] * w * cmb)[None])
            rwcs.append((vr_c[b] * w * cmb)[None])
            ca = (vr_c[a] > thr_a2[0, p]).astype(jnp.float32) * in_c
            cb = (vr_c[b] > thr_b2[0, p]).astype(jnp.float32) * in_c
            cc = ca * cb
            cots.append((vr_c[a] * cc)[None])
            cots.append((vr_c[b] * cc)[None])
            cots.append((vr_c[a] * ca)[None])
            cots.append((vr_c[b] * cb)[None])
        return jnp.concatenate(rows + mand + rwcs + cots, axis=0)

    return lanes_e_fn_t


def coloc_threshold_sums(
    seg: jax.Array,
    inside: jax.Array,
    vr: jax.Array,
    ranks: jax.Array,
    tff: jax.Array,
    thr_f: jax.Array,
    thr_s: jax.Array,
    inv_r: jax.Array,
    pairs: tuple[tuple[int, int], ...],
    max_cells: int,
):
    """Pass E: every thresholded masked sum in one lane scan.

    seg: (N,) int32 compact labels; inside: (N,) f32; vr: (N, C) raw
    values; ranks: (N, C) dense ranks; tff: (max_cells, C) per-object
    Manders thresholds (gathered in-scan); thr_f/thr_s: (P,) Costes
    thresholds in RAW units; inv_r: (P,) 1/R rank normalizers.
    Returns (max_cells, C + 8P) sums ordered
    [tot_thr (C) | Manders fa,fb per pair | RWC fa,fb | Costes fa,fb,
    denom_a, denom_b].
    """
    from saguaro_tpu.kernels.fused_measure import _lane_scan

    n_ch = vr.shape[1]
    p = len(pairs)

    def lanes_e_fn(seg_c, g, in_c, vr_c, rk_c):
        above = (vr_c > g).astype(jnp.float32) * in_c[:, None]
        cols = [vr_c * above]
        mand, rwcs, cots = [], [], []
        for i, (a, b) in enumerate(pairs):
            cmb = above[:, a] * above[:, b]
            mand.append(vr_c[:, a] * cmb)
            mand.append(vr_c[:, b] * cmb)
            w = 1.0 - jnp.abs(rk_c[:, a] - rk_c[:, b]) * inv_r[i]
            rwcs.append(vr_c[:, a] * w * cmb)
            rwcs.append(vr_c[:, b] * w * cmb)
            ca = (vr_c[:, a] > thr_f[i]).astype(jnp.float32) * in_c
            cb = (vr_c[:, b] > thr_s[i]).astype(jnp.float32) * in_c
            cc = ca * cb
            cots.append(vr_c[:, a] * cc)
            cots.append(vr_c[:, b] * cc)
            cots.append(vr_c[:, a] * ca)
            cots.append(vr_c[:, b] * cb)
        cols2 = [c[:, None] for c in mand + rwcs + cots]
        return jnp.concatenate(cols + cols2, axis=1)

    lanes_e_fn_t = _make_lanes_e_fn_t(n_ch, pairs)
    n_lanes = n_ch + 8 * p
    return _lane_scan(
        seg, [inside, vr, ranks], lanes_e_fn, n_lanes, max_cells,
        tables=tff, lane_fn_t=lanes_e_fn_t,
        consts=(thr_f, thr_s, inv_r),
    )


def _intensity_codes(vr, inside_m, integer_grid: bool):
    """16-bit intensity codes + the CP [0,1] normalizer: raw uint16
    values ARE the code (exact CP tie structure); floats quantize on the
    global range (ranks keep ordering, ties at 16-bit resolution)."""
    if integer_grid:
        return jnp.clip(vr.astype(jnp.int32), 0, 65535), jnp.float32(65535.0)
    big = jnp.float32(3.4e38)
    vmin_g = jnp.min(jnp.where(inside_m[:, None], vr, big), axis=0)
    vmax_g = jnp.max(jnp.where(inside_m[:, None], vr, -big), axis=0)
    span = jnp.maximum(vmax_g - vmin_g, 1e-12)
    codes = jnp.clip(
        ((vr - vmin_g) / span * 65535.0).astype(jnp.int32), 0, 65535
    )
    norm = jnp.maximum(jnp.max(jnp.where(inside_m[:, None], vr, 0.0)), 1e-12)
    return codes, norm


def colocalization_features_multiset(
    image: jax.Array,
    labels_by_set: dict[str, jax.Array],
    vmax_by_set: dict[str, jax.Array],
    max_cells: int,
    thr_pct: float = 15.0,
    costes_scale: int = 255,
    costes_fast: bool = True,
    integer_grid: bool = True,
    additive: tuple[str, str, str] | None = ("Cells", "Nuclei", "Cytoplasm"),
    costes_fine_scale: int | None = None,
):
    """Thresholded colocalization statistics for SEVERAL object sets at
    once, sharing the per-pixel work:

      * one set of 16-bit intensity codes;
      * value-count AND Costes joint tables for the two DISJOINT sets
        only (``additive`` = (whole, part1, part2) with
        whole = part1 (+) part2 — Cells = Nuclei ∪ Cytoplasm by
        construction in pipeline/features.py) — the whole set's tables
        are the SUM, saving a third of the counting contractions;
      * ONE merged s8 rank-pick scan across sets x channels.

    Returns {set_name: single-set result dict} (same shape as
    ``colocalization_features``).
    """
    h, w, n_ch = image.shape
    names = list(labels_by_set)
    pairs = tuple((a, b) for a in range(n_ch) for b in range(a + 1, n_ch))
    if not pairs:
        return {nm: {"costes_thr": (jnp.zeros((0,)), jnp.zeros((0,)))}
                for nm in names}
    vr = image.reshape(-1, n_ch).astype(jnp.float32)
    flats = {nm: labels_by_set[nm].reshape(-1).astype(jnp.int32) for nm in names}
    insides = {nm: flats[nm] > 0 for nm in names}
    any_inside = insides[names[0]]
    for nm in names[1:]:
        any_inside = any_inside | insides[nm]
    codes, norm = _intensity_codes(vr, any_inside, integer_grid)
    hi = (codes >> 8).astype(jnp.int32)
    lo = (codes & 0xFF).astype(jnp.int32)

    if additive is not None and all(nm in labels_by_set for nm in additive):
        whole, p1, p2 = additive
        count_names = [p1, p2]
        derive = {whole: (p1, p2)}
    else:
        count_names = names
        derive = {}

    # ---- rank tables: counted sets share one label one-hot per channel
    cnts = _value_count_tables(hi, lo, [insides[nm] for nm in count_names])
    cnt_by = {nm: cnts[..., i] for i, nm in enumerate(count_names)}
    for whole, (p1, p2) in derive.items():
        cnt_by[whole] = cnt_by[p1] + cnt_by[p2]
    tables = []      # (C, 256, 256, n_sets) in `names` order
    n_distinct = {}
    for c in range(n_ch):
        per_set = []
        for nm in names:
            t, nd = _rank_table(cnt_by[nm][c])
            per_set.append(t)
            n_distinct.setdefault(nm, []).append(nd)
        tables.append(jnp.stack(per_set, axis=-1))
    ranks_all = _pick_rows_mc(hi, lo, jnp.stack(tables))  # (N, C, n_sets)

    # ---- Costes joint tables: same disjoint-union sharing
    from saguaro_tpu.kernels.onehot_reduce import onehot_counts

    s_codes = costes_scale + 1
    code_s = jnp.clip((vr / norm * costes_scale).astype(jnp.int32), 0, costes_scale)
    by_a: dict[int, list[int]] = {}
    for a, b in pairs:
        by_a.setdefault(a, []).append(b)
    joint_by: dict[str, dict] = {nm: {} for nm in count_names}
    for a, bs in by_a.items():
        outs = onehot_counts(
            code_s[:, a],
            [(code_s[:, b], insides[nm], s_codes) for b in bs for nm in count_names],
            s_codes,
        )
        i = 0
        for b in bs:
            for nm in count_names:
                joint_by[nm][(a, b)] = outs[i]
                i += 1
    for whole, (p1, p2) in derive.items():
        joint_by[whole] = {
            k: joint_by[p1][k] + joint_by[p2][k] for k in joint_by[p1]
        }

    out = {}
    for k_set, nm in enumerate(names):
        inside_m = insides[nm]
        inside = inside_m.astype(jnp.float32)
        seg = jnp.where((flats[nm] > 0) & (flats[nm] < max_cells), flats[nm], 0)
        ranks = ranks_all[:, :, k_set]
        nd = n_distinct[nm]
        inv_r = jnp.stack(
            [1.0 / jnp.maximum(jnp.maximum(nd[a], nd[b]), 1.0) for a, b in pairs]
        )
        if costes_fine_scale is not None:
            # two-level: coarse bracket, then the exact fine descent at
            # the data's own resolution (CP runs linear_costes at
            # scale_max = bit depth — 1/65535 for uint16)
            _, _, (c_regs, _c_thr, c_prev) = costes_thresholds(
                vr / norm, inside_m, pairs, scale=costes_scale,
                fast=costes_fast, joint=joint_by[nm], return_bracket=True,
            )
            thr_f_n, thr_s_n = costes_fine_refine(
                vr / norm, inside_m, pairs, c_regs, c_prev,
                scale=costes_scale, fine=costes_fine_scale, fast=costes_fast,
            )
        else:
            thr_f_n, thr_s_n = costes_thresholds(
                vr / norm, inside_m, pairs, scale=costes_scale,
                fast=costes_fast, joint=joint_by[nm],
            )
        thr_f = thr_f_n * norm
        thr_s = thr_s_n * norm
        vmax = vmax_by_set[nm]
        tff = (thr_pct / 100.0) * jnp.where(
            jnp.isfinite(vmax) & (jnp.abs(vmax) < 3.38e38), vmax, 0.0
        )
        sums = coloc_threshold_sums(
            seg, inside, vr, ranks, tff, thr_f, thr_s, inv_r, pairs, max_cells
        )
        tot_thr = sums[:, :n_ch]
        p = len(pairs)
        o = n_ch
        mand = sums[:, o : o + 2 * p]
        rwcs = sums[:, o + 2 * p : o + 4 * p]
        cots = sums[:, o + 4 * p :]

        def safe(num, den):
            return jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 0.0)

        res = {}
        for i, (a, b) in enumerate(pairs):
            res[(a, b)] = {
                "M1": safe(mand[:, 2 * i], tot_thr[:, a]),
                "M2": safe(mand[:, 2 * i + 1], tot_thr[:, b]),
                "RWC1": safe(rwcs[:, 2 * i], tot_thr[:, a]),
                "RWC2": safe(rwcs[:, 2 * i + 1], tot_thr[:, b]),
                "C1": safe(cots[:, 4 * i], cots[:, 4 * i + 2]),
                "C2": safe(cots[:, 4 * i + 1], cots[:, 4 * i + 3]),
            }
        res["costes_thr"] = (thr_f_n, thr_s_n)
        out[nm] = res
    return out


def colocalization_features(
    image: jax.Array,
    labels: jax.Array,
    vmax: jax.Array,
    max_cells: int,
    thr_pct: float = 15.0,
    costes_scale: int = 255,
    costes_fast: bool = True,
    integer_grid: bool = True,
    costes_fine_scale: int | None = None,
):
    """All thresholded colocalization statistics for ONE object set.

    image: (H, W, C) raw intensities; labels: (H, W) int32; vmax:
    (max_cells, C) per-object channel maxima (from the fused pass B).
    Returns {(a, b): {"M1", "M2", "RWC1", "RWC2", "C1", "C2"}} of
    (max_cells,) arrays plus {"costes_thr": (thr_f, thr_s)} in
    normalized units (Image-table deliverable). Empty denominators
    yield 0 (framework convention; CP emits nan there).
    """
    return colocalization_features_multiset(
        image, {"obj": labels}, {"obj": vmax}, max_cells,
        thr_pct=thr_pct, costes_scale=costes_scale, costes_fast=costes_fast,
        integer_grid=integer_grid, additive=None,
        costes_fine_scale=costes_fine_scale,
    )["obj"]

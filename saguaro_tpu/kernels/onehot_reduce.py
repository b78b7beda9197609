"""One-hot matmul segment reductions — the TPU-fast scatter replacement.

XLA scatters (jax.ops.segment_sum) serialize on TPU; any reduction of the
form  G[label, code] = Σ_i w_i · 1[label_i = l] · 1[code_i = c]  is a
contraction of two one-hot matrices and runs on the MXU instead:

    G = onehot(labels)ᵀ @ (onehot(codes) * w)

evaluated over pixel chunks. Counting reductions (w ∈ {0,1}) use bf16
one-hots (exact 0/1 products, f32 accumulation — bit-exact counts);
real-valued sums use f32 at HIGHEST precision.

The multi-code form fuses several histograms against ONE label one-hot
per chunk — the label matrix is the dominant HBM traffic.

Measured guidance (v5e, 1080² images, 512-cell bound, device-profiled):
EVERY full-size scalar scatter (segment_sum of 9.3M keys) and every
full-size table gather (jnp.take by 9.3M keys) runs at ~1.7 GB/s
effective — ~82-87 ms each — while the equivalent chunked one-hot
matmul scan does the same reduction/lookup in ~13-38 ms on the MXU with
all lanes/columns riding one scan. Consequently the measurement stack
routes ALL of: per-object sums (segment_matmul_sums), histograms /
pair counts (onehot_counts), and per-pixel table lookups (mxu_take,
plus fused_measure._lane_scan's in-scan variant) through this module.
Only min/max reductions remain XLA scatters (no matmul form).

An earlier round measured the scatter forms FASTER for medium keyed
histograms — that conclusion predated the int16 -1-coded validity
layout and per-chunk lane building; with those, the matmul form wins
everywhere it applies (bisected: quantiles 0.45 -> 0.01 s/site,
neighbors 0.29 -> 0.16, texture 0.47 -> 0.24).

On a real TPU, ``onehot_counts`` and ``mxu_take_t`` dispatch to the
Pallas kernels in ``kernels/segment_pallas`` — same contracts, but the
one-hots live only in VMEM (XLA materializes them to HBM per chunk).
Amortized device measurements at the op point (8x 1080² sites, 512-cell
bound, 10 passes in-program): hist 80 cols 2.38 -> 1.19 ms/site,
hist 1280 cols 11.3 -> 9.4, 25-col table take 9.06 -> 2.49. The XLA
scans remain the CPU/test path and the numerical reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["onehot_counts", "segment_matmul_sums", "mxu_take", "mxu_take_t"]


def _bf16_split3(table: jax.Array):
    """v = hi + mid + lo with all three bf16 — covers ~24 mantissa bits,
    so hi+mid+lo reconstructs the f32 value to the last ulp or two.

    Non-finite entries AND magnitudes above the bf16 max (~3.39e38 —
    the 3.4e38 empty-label sentinel of segment min/max overflows the hi
    term to inf, making the residual NaN) are replaced by 0: in a
    one-hot matmul-gather EVERY row participates with weight 0 or 1, and
    0 * inf/NaN poisons all pixels — unlike jnp.take, which only touches
    indexed rows. Rows of absent labels are masked downstream anyway."""
    t = table.astype(jnp.float32)
    t = jnp.where(jnp.isfinite(t) & (jnp.abs(t) < 3.38e38), t, 0.0)
    # CRITICAL: every bf16 rounding step hides behind an optimization
    # barrier. This environment's forced --xla_allow_excess_precision
    # lets XLA:TPU treat f32(bf16(t)) as t in fused contexts, so the
    # residual r1 = t - f32(bf16(t)) simplifies to 0 and the gather
    # degrades to bf16(t). Device-reproduced: a fused measure program
    # gathered 2112.0 from a table row holding 2119.0 (= bf16(2119)),
    # emptying every at_max candidate set and returning corner
    # coordinates for Location_MaxIntensity; standalone jits of the same
    # code were exact (the rewrite fires only in larger fusions).
    hi = jax.lax.optimization_barrier(t.astype(jnp.bfloat16))
    r1 = t - hi.astype(jnp.float32)
    mid = jax.lax.optimization_barrier(r1.astype(jnp.bfloat16))
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _summed_dots(dot, *terms):
    """Σ_i dot(term_i) with each partial kept behind an optimization
    barrier. CRITICAL: XLA:TPU's algebraic simplifier merges shared-lhs
    dots A@B + A@C into A@(B+C) with the add computed IN BF16 —
    collapsing the hi/mid/lo split back to bf16(t). Device-reproduced: a
    fused measure program gathered 2112.0 from a table row holding
    2119.0 (= bf16(2119)), emptying every at_max candidate set and
    returning corner coordinates for Location_MaxIntensity (standalone
    jits were unaffected — the rewrite fires in larger fusion contexts).
    Barriers on the dot RESULTS block the pattern; barriers on the split
    terms do not (the simplifier builds the bf16 add fresh)."""
    parts = jax.lax.optimization_barrier(tuple(dot(t) for t in terms))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


@partial(jax.jit, static_argnames=("max_cells", "chunk"))
def mxu_take(
    table: jax.Array,
    seg: jax.Array,
    max_cells: int,
    chunk: int = 32768,
) -> jax.Array:
    """Row-gather of a small per-label table as one-hot MXU matmuls.

    table: (max_cells, K) f32; seg: (N,) int32 in [0, max_cells).
    Returns (N, K) f32 — the same values as ``jnp.take(table, seg,
    axis=0)`` up to ~1 f32 ulp (3-term bf16 split).

    A native XLA gather of N keys from a (cells, K) table runs at
    ~1.7 GB/s effective on TPU (profiled: ~85 ms per 9.3M keys); the
    chunked one-hot contraction does the same lookup on the MXU in
    ~13 ms, and K columns ride one scan.
    """
    if table.ndim == 1:
        return mxu_take(table[:, None], seg, max_cells, chunk)[:, 0]
    n = seg.shape[0]
    n_pad = (-n) % chunk
    seg_f = jnp.pad(seg.astype(jnp.int32), (0, n_pad))
    n_chunks = (n + n_pad) // chunk
    hi, mid, lo = _bf16_split3(table)

    def body(_, idx):
        sl = idx * chunk
        lab_oh = jax.nn.one_hot(
            jax.lax.dynamic_slice_in_dim(seg_f, sl, chunk), max_cells, dtype=jnp.bfloat16
        )
        dot = lambda t: jax.lax.dot_general(
            lab_oh,
            t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return None, _summed_dots(dot, hi, mid, lo)

    _, ys = jax.lax.scan(body, None, jnp.arange(n_chunks))
    return ys.reshape(n + n_pad, table.shape[1])[:n]


def mxu_take_t(
    table: jax.Array,
    seg: jax.Array,
    max_cells: int,
    chunk: int = 32768,
) -> jax.Array:
    """TRANSPOSED row-gather: (max_cells, K) table + (N,) labels ->
    (K, N) — ``jnp.take(table, seg, axis=0).T`` up to ~1 f32 ulp.

    Pixels ride the LANE axis of the result, the TPU-compact orientation
    for narrow per-pixel data: on a real TPU this dispatches to the
    Pallas kernel (one-hots VMEM-only, canonical MXU dots — 9.06 -> 2.49
    ms/site at the 25-col op point) and the full-size (N, K) -> (K, N)
    transpose never exists. Downstream elementwise consumers broadcast
    (N,) per-pixel arrays against the (K, N) rows for free. CPU/tests
    fall back to the XLA scan + transpose (small fixtures).
    """
    from saguaro_tpu.kernels.segment_pallas import seg_take_t_pallas, use_pallas

    if table.ndim == 1:
        table = table[:, None]
    if use_pallas():
        return seg_take_t_pallas(table, seg, max_cells)
    return mxu_take(table, seg, max_cells, chunk).T


def onehot_counts(
    labels: jax.Array,
    codes: list[tuple[jax.Array, jax.Array, int]],
    max_cells: int,
    chunk: int = 32768,
) -> list[jax.Array]:
    """Fused per-label histograms.

    labels: (N,) int32; codes: list of (code (N,), valid (N,) bool,
    n_codes). Returns [(max_cells, n_codes_i), ...] counting valid pixels
    per (label, code). All histograms contract against one label one-hot
    per chunk.

    Invalid pixels are encoded as code -1 (``one_hot`` of an
    out-of-range index is a zero row) and codes are stored int16 —
    the (N, n_codes) code stack is the formulation's HBM peak, and the
    int32-codes + bool-valid layout OOM'd the batch-8 measurement
    program (code sizes must fit int16; all callers bin to <= 32k).
    """
    sizes = tuple(n for _, _, n in codes)
    if any(n > 32768 for n in sizes):
        # int16 code storage: a code >= 32768 would wrap negative and its
        # one-hot row silently become zero, dropping counts — fail loudly
        raise ValueError(
            f"onehot_counts code spaces must fit int16 (<= 32768), got {sizes}"
        )
    from saguaro_tpu.kernels.segment_pallas import seg_counts_pallas, use_pallas

    if use_pallas():
        return seg_counts_pallas(labels, codes, max_cells)
    code_arr = jnp.stack(
        [
            jnp.where(v, c.astype(jnp.int32), -1).astype(jnp.int16)
            for c, v, _ in codes
        ],
        axis=1,
    )
    g = _onehot_counts_impl(labels.astype(jnp.int32), code_arr, max_cells, sizes, chunk)
    outs = []
    off = 0
    for n in sizes:
        outs.append(g[:, off : off + n])
        off += n
    return outs


@partial(jax.jit, static_argnames=("max_cells", "sizes", "chunk"))
def _onehot_counts_impl(labels, code_arr, max_cells, sizes, chunk):
    n = labels.shape[0]
    n_pad = (-n) % chunk
    lab_f = jnp.pad(labels, (0, n_pad))
    code_f = jnp.pad(code_arr, ((0, n_pad), (0, 0)), constant_values=-1)
    n_chunks = (n + n_pad) // chunk
    total = sum(sizes)

    def body(g, idx):
        sl = idx * chunk
        lab_oh = jax.nn.one_hot(
            jax.lax.dynamic_slice_in_dim(lab_f, sl, chunk), max_cells, dtype=jnp.bfloat16
        )
        code_c = jax.lax.dynamic_slice_in_dim(code_f, sl, chunk).astype(jnp.int32)
        cols = []
        for k, nk in enumerate(sizes):
            # invalid pixels carry code -1 -> all-zero one-hot row
            cols.append(jax.nn.one_hot(code_c[:, k], nk, dtype=jnp.bfloat16))
        code_oh = jnp.concatenate(cols, axis=1)
        g = g + jax.lax.dot_general(
            lab_oh,
            code_oh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return g, None

    g0 = jnp.zeros((max_cells, total), jnp.float32)
    g, _ = jax.lax.scan(body, g0, jnp.arange(n_chunks))
    return g


def segment_matmul_sums(
    labels: jax.Array,
    values: jax.Array,
    max_cells: int,
    chunk: int = 32768,
) -> jax.Array:
    """(N,) labels + (N, K) real values -> (max_cells, K) per-label sums.

    The label one-hot stays bf16 (exact 0/1 — XLA fuses bf16 one-hot
    construction into the matmul; f32 one-hots defeat the fusion and
    materialize to HBM). f32 value precision is preserved by the hi/lo
    bf16 split: v = hi + lo with both halves summed separately.

    On a real TPU this dispatches to the Pallas VMEM-resident kernel
    (``segment_pallas.seg_sums_pallas`` — same hi/lo split and scan
    order; equality-tested in interpreter mode). The dispatch branch
    lives OUTSIDE the jit so the pjit cache never keys a mode-dependent
    trace on mode-blind statics.
    """
    from saguaro_tpu.kernels.segment_pallas import seg_sums_pallas, use_pallas

    if use_pallas():
        return seg_sums_pallas(labels, values, max_cells)
    return _segment_matmul_sums_xla(labels, values, max_cells, chunk)


@partial(jax.jit, static_argnames=("max_cells", "chunk"))
def _segment_matmul_sums_xla(
    labels: jax.Array,
    values: jax.Array,
    max_cells: int,
    chunk: int = 32768,
) -> jax.Array:
    n, k = values.shape
    n_pad = (-n) % chunk
    lab_f = jnp.pad(labels.astype(jnp.int32), (0, n_pad))
    val_f = jnp.pad(values.astype(jnp.float32), ((0, n_pad), (0, 0)))
    # barrier: the forced --xla_allow_excess_precision would otherwise
    # simplify the residual to 0 (see _bf16_split3), degrading sums to
    # bf16 precision
    hi = jax.lax.optimization_barrier(val_f.astype(jnp.bfloat16))
    lo = (val_f - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    n_chunks = (n + n_pad) // chunk

    def body(s, idx):
        sl = idx * chunk
        lab_oh = jax.nn.one_hot(
            jax.lax.dynamic_slice_in_dim(lab_f, sl, chunk), max_cells, dtype=jnp.bfloat16
        )
        dot = lambda v: jax.lax.dot_general(
            lab_oh,
            jax.lax.dynamic_slice_in_dim(v, sl, chunk),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + _summed_dots(dot, hi, lo)
        return s, None

    s0 = jnp.zeros((max_cells, k), jnp.float32)
    s, _ = jax.lax.scan(body, s0, jnp.arange(n_chunks))
    return s

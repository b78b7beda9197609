"""Pallas fused one-hot segment reductions — VMEM-resident one-hots.

The XLA formulation in ``kernels/onehot_reduce`` routes per-object
histograms / lookups through chunked one-hot matmuls, but XLA
materializes the one-hot operands to HBM per chunk (device-profiled:
a histogram pass costs ~8.1 ms/site FIXED at the measurement op point
regardless of histogram columns or chunk size, and a chunk=N variant
OOM'd on a 60 GB ``pred[8,1166400,6400]`` buffer — the one-hot compare
output). The arithmetic itself is small: the label one-hot of a pixel
tile is (max_cells, TILE) and never needs to exist outside VMEM.

These kernels build BOTH one-hots in VMEM per pixel tile and contract
them on the MXU, so HBM traffic is just labels + codes (a few MB per
site instead of ~15 GB per pass).

Mosaic requires the last two block dims to be (8k, 128k)-aligned, so
pixels are blocked as ROWS=8 sublane rows of TILE lanes per grid step;
the kernel unrolls the 8 rows into 8 MXU dots of contraction depth TILE.
Every dot is kept in the canonical ``(m,k)×(k,n)`` MXU orientation: the
histogram/sum kernels transpose only the tiny (ROWS, TILE) label tile
per step (putting labels on sublanes for the one-hot rhs) and emit the
TRANSPOSED (cols, max_cells) accumulator, which the wrappers flip back —
a trivial XLA transpose of a per-object-sized array. Pixels otherwise
stay on the lane axis, the TPU-compact orientation for narrow per-pixel
data, which is also why ``seg_take_t_pallas`` returns the TRANSPOSED
(K, N) gather.

* ``seg_counts_pallas``  — fused per-label histograms
  (= ``onehot_reduce.onehot_counts``; exact 0/1 bf16 products, f32
  accumulation — bit-exact counts)
* ``seg_take_t_pallas``  — per-pixel row gather of a small per-label
  table (= ``onehot_reduce.mxu_take`` with output transposed)
* ``seg_sums_pallas``    — per-label sums of real-valued lanes
  (= ``onehot_reduce.segment_matmul_sums``) with the same bf16 hi/lo
  split (f32-exact to the last ulp or two)

Padding pixels carry label -1 (matches no one-hot row), so they
contribute nothing.

All wrappers carry a ``jax.custom_batching.custom_vmap`` rule: the
measurement stack vmaps per-site programs over the site batch, and the
rule maps that onto an explicit leading grid axis (Pallas' default
batching of a revisited-accumulator grid would otherwise thread the
accumulator state across batch elements).

Dispatch: ``onehot_reduce`` routes here when running on a real TPU
(``use_pallas()``); the XLA scan remains the CPU/test path, and
``tests/test_segment_pallas.py`` pins Pallas-vs-XLA equality in
interpreter mode.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl

__all__ = [
    "use_pallas",
    "dispatch_override",
    "seg_counts_pallas",
    "seg_take_t_pallas",
    "seg_sums_pallas",
    "seg_lane_sums_pallas",
    "pick2_pallas",
]

_ROWS = 8  # sublane rows per grid step (Mosaic block alignment)


# Trace-scoped dispatch pin. The env vars are read at TRACE time deep
# inside jitted programs, but no jit/lru cache key included them — once
# a program was traced under one mode, a later same-shape call under the
# other mode collided on the cached entry (jax 0.9 lifts closure consts
# into executable parameters, so the collision surfaced as "Execution
# supplied 2 buffers but compiled program expected 5"). Entry points that
# jit dispatch-sensitive programs resolve the mode ONCE into a static
# cache key and pin every nested use_pallas() read with
# ``dispatch_override(mode)`` for the duration of the trace.
_DISPATCH_OVERRIDE: list = []


class dispatch_override:
    """Pin ``use_pallas()`` to ``mode`` within the block (None = env)."""

    def __init__(self, mode: bool | None):
        self.mode = mode

    def __enter__(self):
        _DISPATCH_OVERRIDE.append(self.mode)
        return self

    def __exit__(self, *exc):
        _DISPATCH_OVERRIDE.pop()
        return False


def use_pallas() -> bool:
    """True when the default backend is a real TPU (Mosaic available).

    ``SAGUARO_NO_PALLAS=1`` forces the XLA scan path everywhere — the
    A/B and escape hatch for the ``onehot_reduce`` dispatch.
    ``SAGUARO_FORCE_PALLAS=1`` forces the Pallas path on CPU (interpreter
    mode) so tests can pin Pallas-vs-XLA equality at the dispatch sites.
    A surrounding ``dispatch_override(mode)`` (set by the jit entry
    points, which carry the mode in their static cache key) wins over
    the environment."""
    import os

    if _DISPATCH_OVERRIDE and _DISPATCH_OVERRIDE[-1] is not None:
        return bool(_DISPATCH_OVERRIDE[-1])
    if os.environ.get("SAGUARO_NO_PALLAS"):
        return False
    if os.environ.get("SAGUARO_FORCE_PALLAS"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probe
        return False


def _interpret() -> bool:
    # unit tests exercise the kernels on CPU via the interpreter
    return jax.default_backend() != "tpu"


def _pad_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _tile_for(total_cols: int, max_cells: int) -> int:
    """Lane width per row: keep the transient (max_cells, TILE) +
    (total, TILE) bf16 one-hots + accumulator within a comfortable VMEM
    budget while giving the MXU a ≥512-deep contraction. Budget is
    deliberately under half the 16 MB scoped-VMEM limit: Mosaic also
    stacks the iota/compare intermediates of the one-hot construction
    and the revisited (total, max_cells) f32 output block (a 6 MB budget
    OOM'd at 19.3/16 MB on the 3x512-column neighbor-counts launch)."""
    budget = 3 * 1024 * 1024
    per_lane = 2 * (total_cols + max_cells)  # bf16 one-hot columns
    tile = budget // max(per_lane, 1)
    tile = max(512, min(2048, tile))
    return (tile // 128) * 128


def _row_onehot(lab_row: jax.Array, max_cells: int) -> jax.Array:
    """(1, TILE) int32 labels → (max_cells, TILE) bf16 one-hot (pixels
    ride the lane axis; label -1 matches no row)."""
    tile = lab_row.shape[-1]
    return (
        jax.lax.broadcasted_iota(jnp.int32, (max_cells, tile), 0) == lab_row
    ).astype(jnp.bfloat16)


def _prep_labels(labels: jax.Array, tile: int, rows: int = _ROWS):
    """(N,) labels → ((n_steps, rows, TILE) int32, n_pad)."""
    n = labels.shape[0]
    chunk = rows * tile
    n_pad = _pad_to(n, chunk)
    lab = jnp.pad(labels.astype(jnp.int32), (0, n_pad - n), constant_values=-1)
    return lab.reshape(n_pad // chunk, rows, tile), n_pad


# ---------------------------------------------------------------------------
# fused histograms


@functools.lru_cache(maxsize=None)
def _counts_fn(sizes: tuple[int, ...], max_cells: int, tile: int):
    total = sum(sizes)

    def kernel(lab_ref, code_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        # ONE small transpose per step puts labels on sublanes so every
        # dot below is the canonical (m,k)×(k,n) MXU form
        lab_t = jnp.transpose(lab_ref[0, 0])  # (TILE, ROWS) int32
        code = code_ref[0]  # (Q, ROWS*TILE) int16
        for r in range(_ROWS):
            # label one-hot, labels on sublanes: (TILE, max_cells).
            # Counting is integer work: s8 one-hots contract on the MXU
            # at 2x the bf16 rate with EXACT s32 accumulation.
            a_t = (
                jax.lax.broadcasted_iota(jnp.int32, (tile, max_cells), 1)
                == lab_t[:, r : r + 1]
            ).astype(jnp.int8)
            cols = []
            for q, nb in enumerate(sizes):
                c = code[q : q + 1, r * tile : (r + 1) * tile].astype(jnp.int32)
                cols.append(
                    (
                        jax.lax.broadcasted_iota(jnp.int32, (nb, tile), 0) == c
                    ).astype(jnp.int8)
                )
            bmat = jnp.concatenate(cols, axis=0) if len(cols) > 1 else cols[0]
            # (total, TILE) @ (TILE, max_cells) -> (total, max_cells);
            # accumulate straight into the revisited VMEM output block
            # (a separate acc doubled the (total, max_cells) VMEM)
            out_ref[0] += jax.lax.dot_general(
                bmat,
                a_t,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

    def batched(lab4, code3):
        bsz, n_steps = lab4.shape[0], lab4.shape[1]
        nq = code3.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(bsz, n_steps),
            in_specs=[
                pl.BlockSpec((1, 1, _ROWS, tile), lambda b, i: (b, i, 0, 0)),
                pl.BlockSpec((1, nq, _ROWS * tile), lambda b, i: (b, 0, i)),
            ],
            out_specs=pl.BlockSpec(
                (1, total, max_cells), lambda b, i: (b, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (bsz, total, max_cells), jnp.int32
            ),
            interpret=_interpret(),
        )(lab4, code3)

    @custom_batching.custom_vmap
    def f(lab3, code2):
        return batched(lab3[None], code2[None])[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, lab3, code2):
        lab_b, code_b = in_batched
        if not lab_b:
            lab3 = jnp.broadcast_to(lab3, (axis_size,) + lab3.shape)
        if not code_b:
            code2 = jnp.broadcast_to(code2, (axis_size,) + code2.shape)
        return batched(lab3, code2), True

    return f


_COL_CAP = 1024  # max histogram columns per pallas_call (VMEM accumulator)


def seg_counts_pallas(
    labels: jax.Array,
    codes: list[tuple[jax.Array, jax.Array, int]],
    max_cells: int,
) -> list[jax.Array]:
    """Drop-in for ``onehot_reduce.onehot_counts`` (same contract:
    ``codes`` = [(code (N,), valid (N,) bool, n_codes)], invalid pixels
    ride as code -1 → all-zero one-hot column). Entries are split into
    column groups of ≤ ``_COL_CAP`` columns per kernel launch so the
    (total, max_cells) VMEM accumulator stays within budget. A single
    code space WIDER than the cap (e.g. neighbor counts with
    max_cells > 1024) is split by code RANGE into sub-histograms and the
    pieces re-concatenated — the between-entry splitter alone would put
    it in one over-budget launch."""
    if any(n > _COL_CAP for _, _, n in codes):
        outs = []
        for c, v, n in codes:
            if n <= _COL_CAP:
                outs.append(seg_counts_pallas(labels, [(c, v, n)], max_cells)[0])
                continue
            parts = []
            for off in range(0, n, _COL_CAP):
                nb = min(_COL_CAP, n - off)
                m = v & (c >= off) & (c < off + nb)
                parts.append(
                    seg_counts_pallas(labels, [(c - off, m, nb)], max_cells)[0]
                )
            outs.append(jnp.concatenate(parts, axis=1))
        return outs
    # split the entry list into column groups under the cap
    groups, cur, cur_cols = [], [], 0
    for entry in codes:
        nb = entry[2]
        if cur and cur_cols + nb > _COL_CAP:
            groups.append(cur)
            cur, cur_cols = [], 0
        cur.append(entry)
        cur_cols += nb
    groups.append(cur)
    if len(groups) > 1:
        outs = []
        for grp in groups:
            outs.extend(seg_counts_pallas(labels, grp, max_cells))
        return outs

    sizes = tuple(n for _, _, n in codes)
    n = labels.shape[0]
    tile = _tile_for(sum(sizes), max_cells)
    lab, n_pad = _prep_labels(labels, tile)
    code_arr = jnp.stack(
        [
            jnp.pad(
                jnp.where(v, c.astype(jnp.int32), -1).astype(jnp.int16),
                (0, n_pad - n),
                constant_values=-1,
            )
            for c, v, _ in codes
        ],
        axis=0,
    )  # (Q, N_pad): pixel axis on lanes — the TPU-compact orientation
    g = _counts_fn(sizes, max_cells, tile)(lab, code_arr)
    outs, off = [], 0
    for nb in sizes:
        # callers consume f32 histograms (cumsums, CDF ranks); counts are
        # exact s32 from the MXU
        outs.append(g[off : off + nb].T.astype(jnp.float32))
        off += nb
    return outs


# ---------------------------------------------------------------------------
# per-pixel table gather (transposed output)


@functools.lru_cache(maxsize=None)
def _take_fn(max_cells: int, tile: int):
    def kernel(tab_ref, lab_ref, out_ref):
        lab = lab_ref[0, 0]  # (ROWS, TILE)
        t = tab_ref[0]  # (K, max_cells) f32
        t = jnp.where(jnp.isfinite(t) & (jnp.abs(t) < 3.38e38), t, 0.0)
        hi = t.astype(jnp.bfloat16)
        r1 = t - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        for r in range(_ROWS):
            a = _row_onehot(lab[r : r + 1, :], max_cells)
            dot = lambda m: jax.lax.dot_general(
                m,
                a,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[0, :, r * tile : (r + 1) * tile] = (
                dot(hi) + dot(mid) + dot(lo)
            )

    def batched(tab3, lab4):
        bsz, n_steps = lab4.shape[0], lab4.shape[1]
        k = tab3.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(bsz, n_steps),
            in_specs=[
                pl.BlockSpec((1, k, max_cells), lambda b, i: (b, 0, 0)),
                pl.BlockSpec((1, 1, _ROWS, tile), lambda b, i: (b, i, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, k, _ROWS * tile), lambda b, i: (b, 0, i)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (bsz, k, lab4.shape[1] * _ROWS * tile), jnp.float32
            ),
            interpret=_interpret(),
        )(tab3, lab4)

    @custom_batching.custom_vmap
    def f(tab2, lab3):
        return batched(tab2[None], lab3[None])[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, tab2, lab3):
        tab_b, lab_b = in_batched
        if not tab_b:
            tab2 = jnp.broadcast_to(tab2, (axis_size,) + tab2.shape)
        if not lab_b:
            lab3 = jnp.broadcast_to(lab3, (axis_size,) + lab3.shape)
        return batched(tab2, lab3), True

    return f


def seg_take_t_pallas(
    table: jax.Array, seg: jax.Array, max_cells: int
) -> jax.Array:
    """(max_cells, K) table + (N,) labels → (K, N) gathered values
    (``jnp.take(table, seg, axis=0).T`` up to ~1 f32 ulp; non-finite and
    >bf16-max table rows are zeroed, matching ``onehot_reduce``)."""
    if table.ndim == 1:
        table = table[:, None]
    n = seg.shape[0]
    tile = _tile_for(table.shape[1], max_cells)
    lab, _ = _prep_labels(seg, tile)
    out = _take_fn(max_cells, tile)(table.T.astype(jnp.float32), lab)
    return out[:, :n]


# ---------------------------------------------------------------------------
# per-label sums of real lanes


@functools.lru_cache(maxsize=None)
def _sums_fn(max_cells: int, k: int, tile: int):
    def kernel(lab_ref, val_ref, out_ref):
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        # labels on sublanes -> canonical (m,k)×(k,n) dots (see _counts_fn)
        lab_t = jnp.transpose(lab_ref[0, 0])  # (TILE, ROWS)
        v = val_ref[0]  # (K, ROWS*TILE) f32
        for r in range(_ROWS):
            a_t = (
                jax.lax.broadcasted_iota(jnp.int32, (tile, max_cells), 1)
                == lab_t[:, r : r + 1]
            ).astype(jnp.bfloat16)
            vr = v[:, r * tile : (r + 1) * tile]
            hi = vr.astype(jnp.bfloat16)
            lo = (vr - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dot = lambda m: jax.lax.dot_general(
                m,
                a_t,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[0] += dot(hi) + dot(lo)

    def batched(lab4, val3):
        bsz, n_steps = lab4.shape[0], lab4.shape[1]
        return pl.pallas_call(
            kernel,
            grid=(bsz, n_steps),
            in_specs=[
                pl.BlockSpec((1, 1, _ROWS, tile), lambda b, i: (b, i, 0, 0)),
                pl.BlockSpec((1, k, _ROWS * tile), lambda b, i: (b, 0, i)),
            ],
            out_specs=pl.BlockSpec((1, k, max_cells), lambda b, i: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bsz, k, max_cells), jnp.float32),
            interpret=_interpret(),
        )(lab4, val3)

    @custom_batching.custom_vmap
    def f(lab3, val2):
        return batched(lab3[None], val2[None])[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, lab3, val2):
        lab_b, val_b = in_batched
        if not lab_b:
            lab3 = jnp.broadcast_to(lab3, (axis_size,) + lab3.shape)
        if not val_b:
            val2 = jnp.broadcast_to(val2, (axis_size,) + val2.shape)
        return batched(lab3, val2), True

    return f


def seg_sums_pallas(
    labels: jax.Array, values: jax.Array, max_cells: int
) -> jax.Array:
    """(N,) labels + (N, K) f32 values → (max_cells, K) per-label sums
    (= ``onehot_reduce.segment_matmul_sums``: bf16 hi/lo split, exact 0/1
    label weights)."""
    n, k = values.shape
    tile = _tile_for(k, max_cells)
    lab, n_pad = _prep_labels(labels, tile)
    vals = jnp.pad(values.astype(jnp.float32).T, ((0, 0), (0, n_pad - n)))
    return _sums_fn(max_cells, k, tile)(lab, vals).T


# ---------------------------------------------------------------------------
# generic lane scan: payload lanes built IN-KERNEL per pixel tile


@functools.lru_cache(maxsize=None)
def _lane_sums_fn(
    lane_fn_t, base_spec: tuple[int, ...], n_lanes: int, k_tab: int,
    const_shapes: tuple[tuple[int, int], ...], max_cells: int, tile: int,
    n_rows: int = _ROWS,
):
    """``lane_fn_t(lab_row (TILE,) i32, gathered (K, TILE) f32 | None,
    consts, *base rows) -> (n_lanes, TILE) f32`` — the transposed
    (lane-major) twin of ``fused_measure._lane_scan``'s lane_fn, traced
    INSIDE the kernel so neither the payload nor the one-hots ever leave
    VMEM. ``base_spec``: per base array, its row count (1 for (N,), C
    for (N, C)). ``k_tab``: gathered table columns (0 = no tables).
    ``const_shapes``: shapes of small 2-D constant tables the lane fn
    needs (Pallas kernels cannot capture traced constants — they ride as
    explicit whole-array inputs)."""
    n_const = len(const_shapes)

    def kernel(*refs):
        lab_ref, base_ref = refs[0], refs[1]
        off = 2
        tab_ref = refs[off] if k_tab else None
        off += 1 if k_tab else 0
        const_refs = refs[off : off + n_const]
        out_ref = refs[-1]
        # rank-3 const blocks are PER-SITE values (batched under the
        # site vmap, e.g. Costes thresholds) carrying a leading (1,)
        # batch block; rank-2 blocks are shared tables (Zernike coeffs)
        consts = tuple(
            c[0] if len(c.shape) == 3 else c[...] for c in const_refs
        )
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        lab_t = jnp.transpose(lab_ref[0, 0])  # (TILE, rows)
        basev = base_ref[0]  # (KB, rows*TILE) f32
        if tab_ref is not None:
            tt = tab_ref[0]  # (3K, max_cells) f32 holding exact-bf16 values
            t_hi = tt[:k_tab].astype(jnp.bfloat16)
            t_mid = tt[k_tab : 2 * k_tab].astype(jnp.bfloat16)
            t_lo = tt[2 * k_tab :].astype(jnp.bfloat16)
        for r in range(n_rows):
            lab_row = lab_t[:, r]  # (TILE,)
            # both one-hot orientations from two iota compares (no
            # in-kernel transpose): a for the (K, mc) @ (mc, TILE)
            # gather, a_t for the (n_lanes, TILE) @ (TILE, mc) sums
            a_t = (
                jax.lax.broadcasted_iota(jnp.int32, (tile, max_cells), 1)
                == lab_row[:, None]
            ).astype(jnp.bfloat16)
            dot = lambda m, n_: jax.lax.dot_general(
                m, n_,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if tab_ref is not None:
                a = (
                    jax.lax.broadcasted_iota(jnp.int32, (max_cells, tile), 0)
                    == lab_row[None, :]
                ).astype(jnp.bfloat16)
                gathered = dot(t_hi, a) + dot(t_mid, a) + dot(t_lo, a)
            else:
                gathered = None
            rows = basev[:, r * tile : (r + 1) * tile]
            args, boff = [], 0
            for nb in base_spec:
                args.append(rows[boff] if nb == 1 else rows[boff : boff + nb])
                boff += nb
            payload = lane_fn_t(
                lab_row, gathered, consts, *args
            ).astype(jnp.float32)
            hi = payload.astype(jnp.bfloat16)
            lo = (payload - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            out_ref[0] += dot(hi, a_t) + dot(lo, a_t)

    def batched(lab4, base3, tab3, *consts):
        bsz = lab4.shape[0]
        kb = base3.shape[1]
        in_specs = [
            pl.BlockSpec((1, 1, n_rows, tile), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, kb, n_rows * tile), lambda b, i: (b, 0, i)),
        ]
        ins = [lab4, base3]
        if k_tab:
            in_specs.append(
                pl.BlockSpec((1, 3 * k_tab, max_cells), lambda b, i: (b, 0, 0))
            )
            ins.append(tab3)
        for c in consts:
            if c.ndim == 3:  # per-site (batched) const: (B, k, P)
                in_specs.append(
                    pl.BlockSpec((1,) + c.shape[1:], lambda b, i: (b, 0, 0))
                )
            else:
                in_specs.append(pl.BlockSpec(c.shape, lambda b, i: (0, 0)))
            ins.append(c)
        return pl.pallas_call(
            kernel,
            grid=(bsz, lab4.shape[1]),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, n_lanes, max_cells), lambda b, i: (b, 0, 0)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (bsz, n_lanes, max_cells), jnp.float32
            ),
            interpret=_interpret(),
        )(*ins)

    @custom_batching.custom_vmap
    def f(lab3, base2, tab2, *consts):
        return batched(lab3[None], base2[None], tab2[None], *consts)[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, lab3, base2, tab2, *consts):
        lab_b, base_b, tab_b = in_batched[:3]
        if not lab_b:
            lab3 = jnp.broadcast_to(lab3, (axis_size,) + lab3.shape)
        if not base_b:
            base2 = jnp.broadcast_to(base2, (axis_size,) + base2.shape)
        if not tab_b:
            tab2 = jnp.broadcast_to(tab2, (axis_size,) + tab2.shape)
        # consts: unbatched ones stay shared (rank 2); batched ones
        # (per-site thresholds) arrive rank 3 with the batch leading
        return batched(lab3, base2, tab2, *consts), True

    return f


def seg_lane_sums_pallas(
    seg: jax.Array,
    base: list[jax.Array],
    lane_fn_t,
    n_lanes: int,
    max_cells: int,
    tables: jax.Array | None = None,
    consts: tuple[jax.Array, ...] = (),
    rows: int = _ROWS,
) -> jax.Array:
    """Fused lane scan: per-label sums of payload lanes built in-VMEM.

    ``base``: list of (N,) / (N, C) f32 per-pixel arrays; ``lane_fn_t``
    must be a HASHABLE (module-level or functools.partial-of-module-
    level) function taking ``(lab_row, gathered, consts, *base_rows)``
    with (N,) bases arriving as (TILE,) rows and (N, C) bases as
    (C, TILE) blocks, returning (n_lanes, TILE) — the lane-major twin of
    ``fused_measure._lane_scan``'s lane_fn. ``tables``: optional
    (max_cells, K) f32 gathered per pixel inside the kernel with its own
    label one-hot (3-term bf16 split, as ``onehot_reduce.mxu_take``).
    ``consts``: small 1-D/2-D constant tables handed to lane_fn_t (a
    Pallas kernel cannot capture traced constants; 1-D consts arrive as
    (1, n) rows). Returns (max_cells, n_lanes)."""
    base_spec = tuple(1 if v.ndim == 1 else v.shape[1] for v in base)
    kb = sum(base_spec)
    k_tab = 0 if tables is None else tables.shape[1]
    tile = _tile_for(n_lanes + kb + k_tab, max_cells)
    if rows > _ROWS:
        # experimentation knob: more rows per grid step with the tile
        # shrunk to keep per-step VMEM constant (16 x 2048 OOM'd at
        # 22/16 MB; 16 x 1024 compiled and measured span-NEUTRAL vs
        # 8 x 2048 at the 5-ch op point — default stays 8)
        tile = max(512, (tile // (rows // _ROWS) // 128) * 128)
    n = seg.shape[0]
    lab, n_pad = _prep_labels(seg, tile, rows)
    packed = jnp.concatenate(
        [
            (v[:, None] if v.ndim == 1 else v).astype(jnp.float32).T
            for v in base
        ],
        axis=0,
    )
    packed = jnp.pad(packed, ((0, 0), (0, n_pad - n)))
    if tables is None:
        tab = jnp.zeros((0, max_cells), jnp.float32)
    else:
        from saguaro_tpu.kernels.onehot_reduce import _bf16_split3

        t_hi, t_mid, t_lo = _bf16_split3(tables.T)
        tab = jnp.concatenate(
            [t_hi.astype(jnp.float32), t_mid.astype(jnp.float32),
             t_lo.astype(jnp.float32)],
            axis=0,
        )
    consts2d = tuple(
        (c[None] if c.ndim == 1 else c).astype(jnp.float32) for c in consts
    )
    f = _lane_sums_fn(
        lane_fn_t, base_spec, n_lanes, k_tab,
        tuple(c.shape for c in consts2d), max_cells, tile, rows,
    )
    return f(lab, packed, tab, *consts2d).T


# ---------------------------------------------------------------------------
# EDT horizontal sweep: all 2R+1 shifted min-adds VMEM-resident per row block


# Rows per grid step. 8-row blocks were grid-overhead-bound (97 ms/batch,
# BENCH.md); 64 rows hit Mosaic's 16M scoped-VMEM STACK limit after the
# 2026-08-19 libtpu update (the unrolled 2R+1 min-add chain's live
# temporaries count against the kernel stack: 17.73M at 64 rows, R=64).
# 32 rows keeps the stack at ~half the limit with grid overhead already
# amortized.
_EDT_ROWS = int(os.environ.get("SAGUARO_EDT_ROWS", "32"))


@functools.lru_cache(maxsize=None)
def _edt_sweep_fn(max_radius: int, w: int, w_pad: int):
    def kernel(v2p_ref, d2_ref, out_ref):
        v2p = v2p_ref[0]  # (_EDT_ROWS, w_pad) f32: [R pad | row | R pad]
        d2 = d2_ref[0]    # (_EDT_ROWS, w) f32: min(grow^2, v2)
        for dx in range(1, max_radius + 1):
            cand = jnp.minimum(
                jax.lax.slice_in_dim(v2p, max_radius - dx, max_radius - dx + w, axis=1),
                jax.lax.slice_in_dim(v2p, max_radius + dx, max_radius + dx + w, axis=1),
            ) + jnp.float32(dx * dx)
            d2 = jnp.minimum(d2, cand)
        out_ref[0] = d2

    def batched(v2p3, d23):
        bsz, n_blk = v2p3.shape[0], v2p3.shape[1] // _EDT_ROWS
        return pl.pallas_call(
            kernel,
            grid=(bsz, n_blk),
            in_specs=[
                pl.BlockSpec((1, _EDT_ROWS, w_pad), lambda b, i: (b, i, 0)),
                pl.BlockSpec((1, _EDT_ROWS, w), lambda b, i: (b, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, _EDT_ROWS, w), lambda b, i: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct(v2p3.shape[:1] + d23.shape[1:], jnp.float32),
            interpret=_interpret(),
        )(v2p3, d23)

    @custom_batching.custom_vmap
    def f(v2p, d2):
        return batched(v2p[None], d2[None])[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, v2p, d2):
        a_b, b_b = in_batched
        if not a_b:
            v2p = jnp.broadcast_to(v2p, (axis_size,) + v2p.shape)
        if not b_b:
            d2 = jnp.broadcast_to(d2, (axis_size,) + d2.shape)
        return batched(v2p, d2), True

    return f


def edt_sweep_pallas(
    v2: jax.Array, d2_init: jax.Array, max_radius: int
) -> jax.Array:
    """Bounded EDT horizontal sweep, VMEM-resident: for each pixel,
    ``min(d2_init, min_{1<=|dx|<=R} v2[row, col+dx] + dx^2)`` (out-of-row
    candidates = +inf). The XLA form is 2R+1 full-image shifted min-adds
    (~2.7 GB HBM traffic per 1080^2 site at R=48); here each 8-row block
    is read ONCE and all shifts run in VMEM."""
    h, w = v2.shape
    big2 = jnp.float32(3.0e38)
    v2p = jnp.pad(v2, ((0, 0), (max_radius, max_radius)), constant_values=big2)
    w_pad = w + 2 * max_radius
    h_pad = _pad_to(h, _EDT_ROWS)
    v2p = jnp.pad(v2p, ((0, h_pad - h), (0, 0)), constant_values=big2)
    d2p = jnp.pad(d2_init, ((0, h_pad - h), (0, 0)), constant_values=big2)
    out = _edt_sweep_fn(max_radius, w, w_pad)(v2p, d2p)
    return out[:h]


# ---------------------------------------------------------------------------
# two-level per-pixel table pick (colocalization dense-rank images)


@functools.lru_cache(maxsize=None)
def _pick2_fn(n_ch: int, k_tab: int, tile: int):
    kk = 256 * k_tab

    def kernel(cd_ref, t_ref, out_ref):
        for r in range(_ROWS):
            sl = slice(r * tile, (r + 1) * tile)
            for c in range(n_ch):
                hi_row = cd_ref[0, c : c + 1, sl]          # (1, TILE)
                lo_row = cd_ref[0, n_ch + c : n_ch + c + 1, sl]
                hi_oh = (
                    jax.lax.broadcasted_iota(jnp.int32, (256, tile), 0)
                    == hi_row
                ).astype(jnp.int8)
                lo_oh = (
                    jax.lax.broadcasted_iota(jnp.int32, (256, tile), 0)
                    == lo_row
                ).astype(jnp.int32)
                # ONE s8 dot picks BOTH byte planes of every table's row
                # hi: (2*kk, 256) @ (256, TILE) -> s32, offset by -128
                planes = jax.lax.dot_general(
                    t_ref[0, c],
                    hi_oh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                val = 256 * (planes[:kk] + 128) + (planes[kk:] + 128)
                for k in range(k_tab):
                    rows_k = val[k * 256 : (k + 1) * 256]  # (256, TILE)
                    picked = jnp.sum(rows_k * lo_oh, axis=0, keepdims=True)
                    out_ref[0, c * k_tab + k : c * k_tab + k + 1, sl] = (
                        picked.astype(jnp.float32)
                    )

    def batched(cd3, t4):
        bsz = cd3.shape[0]
        n_steps = cd3.shape[2] // (_ROWS * tile)
        return pl.pallas_call(
            kernel,
            grid=(bsz, n_steps),
            in_specs=[
                pl.BlockSpec(
                    (1, 2 * n_ch, _ROWS * tile), lambda b, i: (b, 0, i)
                ),
                pl.BlockSpec(
                    (1, n_ch, 2 * kk, 256), lambda b, i: (b, 0, 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, n_ch * k_tab, _ROWS * tile), lambda b, i: (b, 0, i)
            ),
            out_shape=jax.ShapeDtypeStruct(
                (bsz, n_ch * k_tab, cd3.shape[2]), jnp.float32
            ),
            interpret=_interpret(),
        )(cd3, t4)

    @custom_batching.custom_vmap
    def f(cd2, t3):
        return batched(cd2[None], t3[None])[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, cd2, t3):
        cd_b, t_b = in_batched
        if not cd_b:
            cd2 = jnp.broadcast_to(cd2, (axis_size,) + cd2.shape)
        if not t_b:
            t3 = jnp.broadcast_to(t3, (axis_size,) + t3.shape)
        return batched(cd2, t3), True

    return f


def pick2_pallas(
    hi: jax.Array, lo: jax.Array, tables: jax.Array
) -> jax.Array:
    """Per-pixel 2-level table pick: out[i, c, k] = tables[c, hi[i,c],
    lo[i,c], k] for 16-bit-integer-valued f32 tables (dense ranks).

    The XLA scan form of this lookup measured 233 ms/site at the 5-ch
    op point — its int8 one-hot dots run ~5% of the s8 MXU rate
    (emulated; the same dots inside Mosaic hit the int8 roofline, see
    the GLCM counting note in BENCH.md). Here each pixel tile builds
    its hi one-hot in VMEM and ONE stacked s8 dot gathers both byte
    planes of all K tables' rows ((2*256K, 256) @ (256, TILE) -> s32);
    the lo pick is a VPU masked sublane reduction. Tables are split
    t = 256*t_hi + t_lo with both planes shifted to int8 range — exact,
    and the one-hot row sums to 1 so the +128 offsets restore in closed
    form.
    """
    n, n_ch = hi.shape
    k_tab = tables.shape[-1]
    tile = int(os.environ.get("SAGUARO_PICK_TILE", "1024"))
    t_hi = jnp.floor(tables / 256.0)
    t_lo = tables - t_hi * 256.0

    def arrange(t):
        # (C, 256_hi, 256_lo, K) -> rows k*256+lo, cols hi: (C, kk, 256)
        return (
            (t - 128.0)
            .astype(jnp.int8)
            .transpose(0, 3, 2, 1)
            .reshape(n_ch, 256 * k_tab, 256)
        )

    t2 = jnp.concatenate([arrange(t_hi), arrange(t_lo)], axis=1)
    cd = jnp.concatenate([hi.T, lo.T], axis=0).astype(jnp.int32)
    chunk = _ROWS * tile
    n_pad = _pad_to(n, chunk)
    cd = jnp.pad(cd, ((0, 0), (0, n_pad - n)))
    out = _pick2_fn(n_ch, k_tab, tile)(cd, t2)  # (C*K, N')
    return out[:, :n].T.reshape(n, n_ch, k_tab)

"""CP-exact radial-distribution geometry (MeasureObjectIntensityDistribution).

CellProfiler 4.2.8 bins each object pixel by a NORMALIZED distance that
mixes two propagations (cellprofiler measureobjectintensitydistribution
.do_measurements; consumed by the reference's CP engine — SURVEY.md E4):

  * ``d_to_edge``  — the label-aware Euclidean distance to the nearest
    differently-labeled pixel (centrosome ``distance_to_edge``: per-color
    scipy EDT, touching neighbors count as edges). This repo already
    computes it exactly for AreaShape radii (`shape_extra._label_edt_sq`).
  * ``d_from_center`` — centrosome ``propagate`` distance from each
    object's center, where the center is the object's FIRST (raster
    order) maximum of ``d_to_edge`` (centrosome
    ``maximum_position_of_labels``) and the propagation races ALL
    centers over the union mask with step cost
    ``sqrt((dI^2 + lam*d^2)/(1+lam))``; with the zero image CP passes,
    that is ``|step| * sqrt(lam/(1+lam))`` (lam=1 -> |step|/sqrt(2) — a
    CP quirk transcribed as-is: center distances are compressed by
    sqrt(2) relative to edge distances in the mix).

  normalized = d_from_center / (d_from_center + d_to_edge + 0.001)
  ring       = min(floor(normalized * n_rings), n_rings - 1)

Pixels whose race is WON by another object's center (possible for
touching objects) get ``cl != labels`` in CP and are excluded from the
measurement entirely — transcribed here as the overflow code.

The RadialCV octant wedges use the same center:
``(i > ic) + 2*(j > jc) + 4*(|di| > |dj|)``.

TPU design: the center search is two scatter-extrema plus MXU gathers
(min/max reductions are the one family that stays scatters — BENCH.md);
the center race is the same fused 8-shift Bellman-Ford relaxation as
``morphology.propagate_labels`` (VPU-only, static shapes, vmappable,
converging ``while_loop`` — device-local under ``shard_map``). The
result is ONE packed per-pixel code ``ring*8 + wedge`` (overflow
``8*n_rings``) that rides `fused_measure`'s existing C2 lane scan, so
the ring/wedge sums still cost no extra pass over the pixels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["center_race", "center_race_scan", "cp_ring_wedge"]

# np (NOT jnp): this module is imported lazily from inside jitted
# measurement traces (pipeline/features._measure_all), and a module-level
# jnp value then materializes under the ACTIVE trace as a JitTracer that
# lives in this global forever. Every later trace closes over the leaked
# tracer, jax 0.9 hoists it into an executable parameter the C++ pjit
# fastpath never supplies, and same-shape re-dispatch dies with
# "Execution supplied 2 buffers but compiled program expected 5"
# (VERDICT r4 weak #1 — the true root cause; the dispatch-mode keying was
# necessary but not sufficient). numpy scalars are always safe: they are
# baked into the jaxpr as literals.
_BIG = np.float32(3.4e38)


def _shifted(a: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    return jnp.roll(
        jnp.pad(a, 1, constant_values=fill), (dy, dx), axis=(0, 1)
    )[1:-1, 1:-1]


@partial(jax.jit, static_argnames=("check_every",))
def center_race(
    labels: jax.Array,
    seeds: jax.Array,
    lam: float = 1.0,
    check_every: int = 16,
):
    """centrosome ``propagate(zeros, seeds, labels != 0, lam)``.

    labels: (H, W) int32 objects; seeds: (H, W) int32 (the center pixels,
    carrying their object's label; 0 elsewhere). Races every seed over
    the union mask ``labels > 0`` with step cost
    ``sqrt(lam/(1+lam)) * |step|`` and returns ``(dist, won)``: the
    accumulated cost and the winning seed label per pixel (unreached
    pixels keep dist=big, won=0). Bellman-Ford relaxation in blocks of
    ``check_every`` fused 8-shift sweeps, to convergence (monotone, so a
    no-improvement block is a global fixpoint).

    Tie rule: centrosome's priority queue breaks equal-distance ties by
    arbitrary insertion order; here a pixel whose OWN object's center
    achieves the optimal distance (within eps) keeps its own label — the
    deterministic choice that minimizes CP's ``cl != labels`` exclusion
    (exact ties are routine for symmetric touching objects on the
    integer grid).
    """
    lab = labels.astype(jnp.int32)
    inside = lab > 0
    scale = jnp.float32((lam / (1.0 + lam)) ** 0.5)
    eps = jnp.float32(1e-3)
    seeded = seeds > 0
    dist0 = jnp.where(seeded, 0.0, _BIG)
    won0 = seeds.astype(jnp.int32)

    shifts = [
        (-1, 0, 1.0), (1, 0, 1.0), (0, -1, 1.0), (0, 1, 1.0),
        (-1, -1, 2.0 ** 0.5), (-1, 1, 2.0 ** 0.5),
        (1, -1, 2.0 ** 0.5), (1, 1, 2.0 ** 0.5),
    ]

    def sweep(_, carry):
        dist, won = carry
        best_d, best_w = dist, won
        for dy, dx, step in shifts:
            cand = _shifted(dist, dy, dx, _BIG) + scale * jnp.float32(step)
            n_won = _shifted(won, dy, dx, 0)
            better = cand < best_d
            tie_own = (
                (cand < best_d + eps) & (n_won == lab) & (best_w != lab)
            )
            take = (better | tie_own) & (n_won > 0)
            best_d = jnp.where(take & better, cand, best_d)
            best_w = jnp.where(take, n_won, best_w)
        grow = inside & ~seeded
        return jnp.where(grow, best_d, dist), jnp.where(grow, best_w, won)

    cap = lab.shape[0] * lab.shape[1]

    def cond(carry):
        _, _, it, changed = carry
        return changed & (it < cap)

    def body(carry):
        dist, won, it, _ = carry
        dist2, won2 = jax.lax.fori_loop(0, check_every, sweep, (dist, won))
        # own-label tie flips move won without improving dist — watch both
        changed = jnp.any(dist2 < dist) | jnp.any(won2 != won)
        return dist2, won2, it + check_every, changed

    dist, won, _, _ = jax.lax.while_loop(
        cond, body, (dist0, won0, jnp.int32(0), jnp.bool_(True))
    )
    return dist, won


# --- min-plus scan race -----------------------------------------------------
#
# The sweep form above relaxes ONE pixel step per iteration, so a
# radius-R object needs ~R full-image sweeps (device-profiled at
# ~100 ms/site of the measure span at the 5-ch op point). The scan form
# relaxes UNLIMITED straight runs per pass: along each of the four
# direction families (rows, columns, both diagonals) the within-run
# relaxation d[j] = min_k (d[k] + |j-k|*step), blocked at mask gaps, is
# an associative min-plus recurrence — every element is the affine-min
# map f(x) = min(c, x + k) and composition stays in that class
# ((f2∘f1)(x) = min(c2, c1+k2, x+k1+k2)) — so `associative_scan` does a
# whole family in log depth. Any 8-neighbor shortest path decomposes
# into straight segments of these families, so convergence takes
# ~#path-bends rounds (2-3 for blobby cells) instead of ~2R sweeps.
# Diagonals ride the pad/reshape shear (row r shifted right by r turns
# (1,-1) lines into columns) — pure data formatting, no TPU gathers.


def _shear(a: jax.Array, fill) -> jax.Array:
    """WRAPPED shear: (H, W) -> (R, W) where R = ceil(H*(W+1)/W)
    (H+1 for square inputs). Pad one ``fill`` column and re-read the
    flat buffer at width W: row r comes out shifted right by r MODULO
    the W+1 period, so column j holds the whole anti-diagonal family
    r+c ≡ j (mod W+1) — at most two real diagonal segments separated by
    exactly one in-band pad cell, which (filled blocked/_BIG) acts as
    the run BLOCKER the min-plus scan already respects. vs the old
    non-wrapped (H, W+H) layout this HALVES the scanned diagonal data
    (1080² race: (1081, 1080) instead of (1080, 2160) — the r5 profile
    put the center race at 2.38 s/batch-8, ~35% of measure device time,
    and the diagonal families carry 2/3 of its scan traffic)."""
    h, w = a.shape
    flat = jnp.pad(a, ((0, 0), (0, 1)), constant_values=fill).reshape(-1)
    n = h * (w + 1)
    rows = -(-n // w)
    flat = jnp.pad(flat, (0, rows * w - n), constant_values=fill)
    return flat.reshape(rows, w)


def _unshear(s: jax.Array, h: int, w: int) -> jax.Array:
    """Inverse of the wrapped shear (exact: drop tail, re-read at W+1)."""
    flat = s.reshape(-1)[: h * (w + 1)]
    return flat.reshape(h, w + 1)[:, :w]


def _minplus_combine(a, b):
    c1, k1, w1 = a
    c2, k2, w2 = b
    through = c1 + k2
    c = jnp.minimum(c2, through)
    w = jnp.where(c2 <= through, w2, w1)
    k = jnp.minimum(k1 + k2, _BIG)
    return c, k, w


def _relax_family(dist, won, lab, blocked_fill, step, axis):
    """Both scan directions of one direction family; strict-improvement
    merge with the own-label tie override (mirrors the sweep rule)."""
    k = jnp.where(blocked_fill, _BIG, step)
    c = jnp.where(blocked_fill, _BIG, dist)
    eps = jnp.float32(1e-3)
    for rev in (False, True):
        oc, _, ow = jax.lax.associative_scan(
            _minplus_combine, (c, k, won), axis=axis, reverse=rev
        )
        live = ow > 0
        better = (oc < dist) & live
        tie_own = (oc < dist + eps) & live & (ow == lab) & (won != lab)
        dist = jnp.where(better, oc, dist)
        won = jnp.where(better | tie_own, ow, won)
        c = jnp.where(blocked_fill, _BIG, dist)
    return dist, won


@partial(jax.jit, static_argnames=())
def center_race_scan(
    labels: jax.Array,
    seeds: jax.Array,
    lam: float = 1.0,
):
    """`center_race` semantics via min-plus associative scans.

    Same contract: (dist, won) of the all-centers race over the union
    mask with step cost sqrt(lam/(1+lam))*|step|. Rounds of 8 run-length
    relaxations (4 families x 2 directions) to a distance fixpoint, then
    the 1-step sweep settle for own-label tie flips the scan's internal
    (label-blind) tie-breaking can miss."""
    lab = labels.astype(jnp.int32)
    h, w = lab.shape
    inside = lab > 0
    scale = jnp.float32((lam / (1.0 + lam)) ** 0.5)
    a_step = scale
    d_step = scale * jnp.float32(2.0 ** 0.5)
    seeded = seeds > 0
    dist0 = jnp.where(seeded, 0.0, _BIG).astype(jnp.float32)
    won0 = seeds.astype(jnp.int32)
    blocked = ~inside

    lab_sh = _shear(lab, 0)
    blk_sh = _shear(blocked, True)
    lab_fl = lab[:, ::-1]
    lab_fsh = _shear(lab_fl, 0)
    blk_fsh = _shear(blocked[:, ::-1], True)

    def round_fn(carry):
        dist, won, _ = carry
        d0, w0 = dist, won
        # rows then columns
        dist, won = _relax_family(dist, won, lab, blocked, a_step, 1)
        dist, won = _relax_family(dist, won, lab, blocked, a_step, 0)
        # (1,-1) diagonals via shear; (1,1) via x-flip + shear
        ds, ws = _relax_family(
            _shear(dist, _BIG), _shear(won, 0), lab_sh, blk_sh, d_step, 0
        )
        dist, won = _unshear(ds, h, w), _unshear(ws, h, w)
        ds, ws = _relax_family(
            _shear(dist[:, ::-1], _BIG), _shear(won[:, ::-1], 0),
            lab_fsh, blk_fsh, d_step, 0,
        )
        dist = _unshear(ds, h, w)[:, ::-1]
        won = _unshear(ws, h, w)[:, ::-1]
        changed = jnp.any(dist < d0) | jnp.any(won != w0)
        return dist, won, changed

    dist, won, _ = jax.lax.while_loop(
        lambda c: c[2], round_fn, (dist0, won0, jnp.bool_(True))
    )

    # settle: 1-step sweeps resolve own-label ties the scans broke
    # label-blind (tie regions are seams, depth ~1-2 px)
    shifts = [
        (-1, 0, 1.0), (1, 0, 1.0), (0, -1, 1.0), (0, 1, 1.0),
        (-1, -1, 2.0 ** 0.5), (-1, 1, 2.0 ** 0.5),
        (1, -1, 2.0 ** 0.5), (1, 1, 2.0 ** 0.5),
    ]
    eps = jnp.float32(1e-3)

    def sweep_body(carry):
        dist, won, changed = carry
        best_d, best_w = dist, won
        for dy, dx, step in shifts:
            cand = _shifted(dist, dy, dx, _BIG) + scale * jnp.float32(step)
            n_won = _shifted(won, dy, dx, 0)
            better = cand < best_d
            tie_own = (
                (cand < best_d + eps) & (n_won == lab) & (best_w != lab)
            )
            take = (better | tie_own) & (n_won > 0)
            best_d = jnp.where(take & better, cand, best_d)
            best_w = jnp.where(take, n_won, best_w)
        grow = inside & ~seeded
        nd = jnp.where(grow, best_d, dist)
        nw = jnp.where(grow, best_w, won)
        changed = jnp.any(nd < dist) | jnp.any(nw != won)
        return nd, nw, changed

    dist, won, _ = jax.lax.while_loop(
        lambda c: c[2], sweep_body, (dist, won, jnp.bool_(True))
    )
    return dist, won


@partial(jax.jit, static_argnames=("max_cells", "n_rings", "max_radius"))
def cp_ring_wedge(
    labels: jax.Array,
    max_cells: int,
    n_rings: int,
    max_radius: int = 64,
    lam: float = 1.0,
    d2_img: jax.Array | None = None,
    max_d2: jax.Array | None = None,
) -> jax.Array:
    """Packed CP ring/wedge code per pixel: ``ring*8 + wedge`` int32,
    ``8*n_rings`` for excluded pixels (outside any object, or captured
    by another object's center in the race — CP's ``cl != labels``).

    ``d2_img``: optional precomputed `shape_extra._label_edt_sq` image
    (callers that also measure radii share one EDT). ``max_d2``:
    optional (max_cells,) per-object max of d2_img — callers that run
    `radius_features` already hold it as MaximumRadius² (an exact
    histogram rank query), saving this kernel's segment_max scatter
    (~81 ms/batch-8 per object set, device-profiled).
    """
    from saguaro_tpu.kernels.onehot_reduce import mxu_take_t
    from saguaro_tpu.kernels.shape_extra import _label_edt_sq

    lab = labels.astype(jnp.int32)
    h, w = lab.shape
    if d2_img is None:
        d2_img = _label_edt_sq(lab, max_radius)
    d_edge = jnp.sqrt(d2_img)

    flat = lab.reshape(-1)
    seg = jnp.where((flat > 0) & (flat < max_cells), flat, 0)
    inside_m = flat > 0
    d2f = d2_img.reshape(-1)
    n = flat.shape[0]

    # center = first raster maximum of d_to_edge per object
    # (centrosome maximum_position_of_labels). Integer d2 values are >=1
    # apart and the MXU gathers are exact to ~1 ulp, so half-step
    # tolerances make the comparisons exact.
    if max_d2 is None:
        max_d2 = jax.ops.segment_max(
            jnp.where(inside_m, d2f, -1.0), seg, num_segments=max_cells
        )
    m = max_d2
    lin = jnp.arange(n, dtype=jnp.float32)
    g_m = mxu_take_t(m[:, None], seg, max_cells)[0]
    is_max = inside_m & (d2f >= g_m - 0.5)
    first = jax.ops.segment_min(
        jnp.where(is_max, lin, jnp.float32(n)), seg, num_segments=max_cells
    )
    cy = jnp.floor(first / w)
    cx = first - cy * w
    g = mxu_take_t(
        jnp.stack([first, cy, cx], axis=1), seg, max_cells
    )  # (3, N)
    center_mask = inside_m & (jnp.abs(lin - g[0]) < 0.5)
    seeds = jnp.where(center_mask, flat, 0).reshape(h, w)

    import os

    if os.environ.get("SAGUARO_RACE_SWEEP"):  # A/B escape hatch
        dist, won = center_race(lab, seeds, lam=lam)
    else:
        dist, won = center_race_scan(lab, seeds, lam=lam)

    good = (won == lab) & (lab > 0) & (dist < _BIG / 2.0)
    norm = dist / (dist + d_edge + 0.001)
    ring = jnp.clip((norm * n_rings).astype(jnp.int32), 0, n_rings - 1)

    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    dy = yy.reshape(-1) - g[1]
    dx = xx.reshape(-1) - g[2]
    wedge = (
        (dy > 0).astype(jnp.int32)
        + 2 * (dx > 0).astype(jnp.int32)
        + 4 * (jnp.abs(dy) > jnp.abs(dx)).astype(jnp.int32)
    )
    rw = jnp.where(
        good.reshape(-1), ring.reshape(-1) * 8 + wedge, 8 * n_rings
    )
    return rw.reshape(h, w)

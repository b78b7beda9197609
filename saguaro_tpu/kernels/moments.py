"""Per-object image moments — the CP 4.2.8 AreaShape moment families.

CellProfiler 4.x MeasureObjectSizeShape emits, per object, the skimage
regionprops moment set: SpatialMoment_p_q (raw moments in BOUNDING-BOX
local coordinates, p,q in 0..3), CentralMoment_p_q, NormalizedMoment_p_q,
HuMoment_0..6, InertiaTensor_{i}_{j} and InertiaTensorEigenvalues_{0,1},
plus EquivalentDiameter.

TPU design: a first pass of 5 segment reductions yields each object's
area, centroid and bbox corner; a second pass gathers those per pixel
and segment-sums the LOCALLY-CENTERED power products (y-cy)^p (x-cx)^q
and (y-ymin)^p (x-xmin)^q directly. Centering before exponentiation
keeps the sums at object scale — a global-moment + binomial-shift
formulation loses float32 precision catastrophically at 6th powers of
image coordinates (1080^6 ~ 1e18). No per-object loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["moments_features"]

_ORDERS = [(p, q) for p in range(4) for q in range(4)]


@partial(jax.jit, static_argnames=("max_cells",))
def moments_features(labels: jax.Array, max_cells: int = 1024) -> dict[str, jax.Array]:
    """All CP moment-family AreaShape columns for every object at once."""
    h, w = labels.shape
    flat = labels.reshape(-1).astype(jnp.int32)
    seg = jnp.where((flat > 0) & (flat < max_cells), flat, 0)
    inside = (flat > 0).astype(jnp.float32)

    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    y = yy.reshape(-1)
    x = xx.reshape(-1)

    # pass 1: area, centroid, bbox corner
    area = jax.ops.segment_sum(inside, seg, num_segments=max_cells)
    zero = area <= 0
    denom = jnp.maximum(area, 1.0)
    cy = jax.ops.segment_sum(y * inside, seg, num_segments=max_cells) / denom
    cx = jax.ops.segment_sum(x * inside, seg, num_segments=max_cells) / denom
    big = jnp.float32(1e9)
    ymin = jax.ops.segment_min(jnp.where(flat > 0, y, big), seg, num_segments=max_cells)
    xmin = jax.ops.segment_min(jnp.where(flat > 0, x, big), seg, num_segments=max_cells)

    # pass 2: object-local coordinates per pixel (gather), then power sums
    yc = (y - jnp.take(cy, seg)) * inside
    xc = (x - jnp.take(cx, seg)) * inside
    yb = (y - jnp.take(jnp.where(zero, 0.0, ymin), seg)) * inside
    xb = (x - jnp.take(jnp.where(zero, 0.0, xmin), seg)) * inside

    def power_products(yloc, xloc):
        ypow = [inside, yloc, yloc * yloc, yloc * yloc * yloc]
        xpow = [inside, xloc, xloc * xloc, xloc * xloc * xloc]
        return [ypow[p] * xpow[q] for p, q in _ORDERS]

    # ONE 32-lane one-hot matmul: TPU scatters serialize, so the chunked
    # MXU contraction (kernels/onehot_reduce.segment_matmul_sums, hi/lo
    # bf16 split for f32 fidelity) replaces 32 scalar segment_sums
    from saguaro_tpu.kernels.onehot_reduce import segment_matmul_sums

    payload = jnp.stack(
        power_products(yb, xb) + power_products(yc, xc), axis=1
    )  # (N, 32)
    sums = segment_matmul_sums(seg, payload, max_cells)  # (C, 32)

    out: dict[str, jax.Array] = {}
    z = lambda a: jnp.where(zero, 0.0, a)

    # spatial moments: bbox-local coordinates (skimage regionprops crops
    # the object image to its bbox before computing moments)
    spatial = {pq: sums[:, i] for i, pq in enumerate(_ORDERS)}
    for p, q in _ORDERS:
        out[f"SpatialMoment_{p}_{q}"] = z(spatial[(p, q)])

    # central moments: centroid-relative
    mu = {pq: sums[:, len(_ORDERS) + i] for i, pq in enumerate(_ORDERS)}
    for p, q in _ORDERS:
        out[f"CentralMoment_{p}_{q}"] = z(mu[(p, q)])

    # normalized moments nu_pq = mu_pq / mu00^(1 + (p+q)/2)
    nu = {}
    for p, q in _ORDERS:
        scale = jnp.power(denom, 1.0 + (p + q) / 2.0)
        nu[(p, q)] = mu[(p, q)] / scale
        out[f"NormalizedMoment_{p}_{q}"] = z(nu[(p, q)])

    # Hu invariants from normalized central moments
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
    for i, v in enumerate(hu):
        out[f"HuMoment_{i}"] = z(v)

    # inertia tensor (regionprops): [[mu20, -mu11], [-mu11, mu02]] / mu00
    t00 = mu[(2, 0)] / denom
    t11 = mu[(0, 2)] / denom
    t01 = -mu[(1, 1)] / denom
    out["InertiaTensor_0_0"] = z(t00)
    out["InertiaTensor_0_1"] = z(t01)
    out["InertiaTensor_1_0"] = z(t01)
    out["InertiaTensor_1_1"] = z(t11)
    tr = (t00 + t11) / 2.0
    det = jnp.sqrt(jnp.maximum(((t00 - t11) / 2.0) ** 2 + t01**2, 0.0))
    out["InertiaTensorEigenvalues_0"] = z(tr + det)
    out["InertiaTensorEigenvalues_1"] = z(tr - det)

    out["EquivalentDiameter"] = z(jnp.sqrt(4.0 * area / jnp.pi))
    return out

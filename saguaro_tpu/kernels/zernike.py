"""Zernike shape moments — CP AreaShape_Zernike_n_m equivalents.

CellProfiler's MeasureObjectSizeShape emits the magnitudes of the Zernike
moments (n <= 9, 30 features) of each object's binary mask evaluated on
its unit disk. TPU formulation: per pixel, gather the owning object's
centroid and radius (segment stats), evaluate every radial polynomial as
a combination of precomputed rho powers, and reduce each (n, m) moment
with one segment-sum over the label image — all objects at once, no
per-object loops.

Convention: moment = (n+1)/pi * sum_{pixels in mask, rho<=1}
Z*_nm(rho, theta) / area, magnitude reported — the standard
area-normalized Zernike descriptor (the reference's exact engine is
centrosome; its .cppipe is not in the repo, SURVEY.md hard part 3).
"""

from __future__ import annotations

from functools import lru_cache, partial
from math import factorial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ZERNIKE_INDEXES", "zernike_features"]

ZERNIKE_INDEXES: tuple[tuple[int, int], ...] = tuple(
    (n, m) for n in range(10) for m in range(n % 2, n + 1, 2)
)


@lru_cache(maxsize=1)
def _radial_coeffs() -> np.ndarray:
    """(len(ZERNIKE_INDEXES), 10) coefficients of rho^k for each R_nm."""
    coeffs = np.zeros((len(ZERNIKE_INDEXES), 10), np.float64)
    for i, (n, m) in enumerate(ZERNIKE_INDEXES):
        for s in range((n - m) // 2 + 1):
            c = (
                (-1) ** s
                * factorial(n - s)
                / (factorial(s) * factorial((n + m) // 2 - s) * factorial((n - m) // 2 - s))
            )
            coeffs[i, n - 2 * s] = c
    return coeffs


@partial(jax.jit, static_argnames=("max_cells",))
def zernike_features(labels: jax.Array, max_cells: int = 1024) -> jax.Array:
    """(H, W) labels -> (max_cells, 30) Zernike magnitudes per object."""
    h, w = labels.shape
    flat = labels.reshape(-1).astype(jnp.int32)
    seg = jnp.where((flat > 0) & (flat < max_cells), flat, 0)
    inside = (labels > 0).reshape(-1).astype(jnp.float32)
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    yf, xf = yy.reshape(-1), xx.reshape(-1)

    area = jax.ops.segment_sum(inside, seg, num_segments=max_cells)
    denom = jnp.maximum(area, 1.0)
    cy = jax.ops.segment_sum(yf * inside, seg, num_segments=max_cells) / denom
    cx = jax.ops.segment_sum(xf * inside, seg, num_segments=max_cells) / denom
    dy = yf - jnp.take(cy, seg)
    dx = xf - jnp.take(cx, seg)
    dist = jnp.sqrt(dy * dy + dx * dx)
    rmax = jax.ops.segment_max(
        jnp.where(inside > 0, dist, -1.0), seg, num_segments=max_cells
    )
    rho = dist / jnp.maximum(jnp.take(rmax, seg), 1e-6)
    rho = jnp.minimum(rho, 1.0)
    theta = jnp.arctan2(dy, dx)

    # rho powers 0..9 -> radial polynomials via the coefficient table
    powers = jnp.stack([rho**k for k in range(10)], axis=1)  # (P, 10)
    coeffs = jnp.asarray(_radial_coeffs(), jnp.float32)      # (30, 10)
    radials = jnp.dot(
        powers, coeffs.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (P, 30)

    ms = jnp.asarray([m for _, m in ZERNIKE_INDEXES], jnp.float32)
    ns = jnp.asarray([n for n, _ in ZERNIKE_INDEXES], jnp.float32)
    mtheta = theta[:, None] * ms[None, :]
    re = radials * jnp.cos(mtheta) * inside[:, None]
    im = radials * jnp.sin(mtheta) * inside[:, None]

    def reduce_cols(v):
        return jax.vmap(
            lambda col: jax.ops.segment_sum(col, seg, num_segments=max_cells),
            in_axes=1,
            out_axes=1,
        )(v)

    sre = reduce_cols(re)   # (max_cells, 30)
    sim = reduce_cols(im)
    mag = jnp.sqrt(sre * sre + sim * sim)
    norm = (ns[None, :] + 1.0) / jnp.pi / jnp.maximum(area[:, None], 1.0)
    out = mag * norm
    return jnp.where(area[:, None] > 0, out, 0.0)

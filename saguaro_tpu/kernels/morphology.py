"""Label morphology: secondary/tertiary objects + granularity spectrum.

Replaces the out-of-repo CellProfiler modules whose outputs the suite's
tables depend on (SURVEY.md E4):

* IdentifySecondaryObjects (Cells from Nuclei): fixed-iteration geodesic
  label propagation — nuclei labels expand over pixels whose cell-stain
  intensity clears a threshold, one 3x3 max-propagation per iteration.
  With N iterations this is distance-N-bounded propagation, the
  static-shape analog of CP's 'propagation' method.
* IdentifyTertiaryObjects (Cytoplasm = Cells minus Nuclei).
* MeasureGranularity: the image-level granularity spectrum — the volume
  fraction removed by successive morphological openings (erosion radius
  k), computed with iterated 3x3 min/max pools.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["expand_labels", "tertiary_objects", "granularity_spectrum"]


def _pool(x: jax.Array, op, k: int = 3) -> jax.Array:
    init = -jnp.inf if op is jax.lax.max else jnp.inf
    return jax.lax.reduce_window(x, init, op, (k, k), (1, 1), "SAME")


@partial(jax.jit, static_argnames=("iterations",))
def expand_labels(
    labels: jax.Array,
    intensity: jax.Array,
    threshold: jax.Array | float = 0.0,
    iterations: int = 12,
) -> jax.Array:
    """Grow nuclei labels into cell labels over above-threshold pixels.

    labels: (H, W) int32 seed (nuclei) labels; intensity: (H, W) the
    cell-body stain; threshold: scalar — pixels above it are claimable.
    Each iteration claims the 8-neighborhood (one pixel ring), so
    ``iterations`` bounds the maximum expansion distance.
    """
    claimable = intensity > threshold

    def step(_, lab):
        neigh = _pool(lab.astype(jnp.float32), jax.lax.max).astype(jnp.int32)
        return jnp.where((lab == 0) & claimable, neigh, lab)

    return jax.lax.fori_loop(0, iterations, step, labels.astype(jnp.int32))


@jax.jit
def tertiary_objects(cells: jax.Array, nuclei: jax.Array) -> jax.Array:
    """Cytoplasm = cell label where the nucleus doesn't cover it."""
    return jnp.where(nuclei > 0, 0, cells).astype(jnp.int32)


@partial(jax.jit, static_argnames=("spectrum_length",))
def granularity_spectrum(image: jax.Array, spectrum_length: int = 16) -> jax.Array:
    """CP MeasureGranularity equivalent: percentage of image 'volume'
    removed at each opening radius 1..spectrum_length.

    Returns (spectrum_length,) values; element k-1 is the marginal volume
    fraction (x100) erased when the opening radius grows from k-1 to k.
    """
    img = image.astype(jnp.float32)
    start_mean = jnp.maximum(jnp.mean(img), 1e-12)
    eroded = img

    def body(k, carry):
        eroded, prev_mean, out = carry
        eroded = _pool(eroded, jax.lax.min)
        reconstructed = _pool(eroded, jax.lax.max)
        # k-fold dilation to approximate opening at radius k
        reconstructed = jax.lax.fori_loop(
            0,
            k,
            lambda _, r: jnp.minimum(_pool(r, jax.lax.max), img),
            reconstructed,
        )
        new_mean = jnp.mean(reconstructed)
        frac = (prev_mean - new_mean) * 100.0 / start_mean
        out = out.at[k].set(frac)
        return eroded, new_mean, out

    out = jnp.zeros(spectrum_length, jnp.float32)
    _, _, out = jax.lax.fori_loop(0, spectrum_length, body, (eroded, start_mean, out))
    return out

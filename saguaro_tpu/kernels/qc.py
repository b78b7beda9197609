"""Image-quality kernel: PowerLogLogSlope + PercentMaximal, fused.

Reference math (Illumination_QC_mult.py:31-125, itself a transcription of
centrosome's ``rps``):

1. quadrant-folded radii: ``r2 = i^2 + j^2`` min-folded with flipud/fliplr;
2. low-frequency truncation to ``min(h, w) / 8``;
3. intensity-invariant normalization ``img / median(|img - mean(img)|)``
   when the image is non-flat;
4. FFT power of the mean-subtracted image;
5. per-radius ring sums for radii 2 .. floor(maxwidth)-1 (DC and
   frequency 1 skipped);
6. slope of the least-squares line of log(powersum) vs log(radius) over
   rings with positive power, 0.0 if fewer than 3 such rings;
7. PercentMaximal = 100 * #pixels equal to the image max / #pixels.

Everything below is one jitted XLA program per image shape: the radius
labels are a shape-static constant, the ring sums are a segment-sum, and
the regression is closed-form — so per-plate QC is a single batched device
launch instead of the reference's 24-thread scipy pool
(Illumination_QC_mult.py:212-217).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["radial_power_spectrum", "qc_metrics", "qc_metrics_batch"]


@lru_cache(maxsize=32)
def _radius_labels(shape: tuple[int, int]) -> tuple[np.ndarray, int]:
    """Quadrant-folded integer radius labels and the ring-count bound L.

    Rings 2..L-1 are analyzed; radii >= L are routed to a discard bin L.
    """
    h, w = shape
    radii2 = (np.arange(h).reshape(h, 1) ** 2) + (np.arange(w) ** 2)
    radii2 = np.minimum(radii2, np.flipud(radii2))
    radii2 = np.minimum(radii2, np.fliplr(radii2))
    radii = np.floor(np.sqrt(radii2)).astype(np.int32) + 1
    maxwidth = min(h, w) / 8.0
    L = int(np.floor(maxwidth))
    labels = np.where(radii < L, radii, L).astype(np.int32)
    return labels, L


@partial(jax.jit, static_argnames=("num_rings",))
def _rps_sums(img: jax.Array, labels: jax.Array, num_rings: int):
    img = img.astype(jnp.float32)
    mean = jnp.mean(img)
    ptp = jnp.max(img) - jnp.min(img)
    med = jnp.median(jnp.abs(img - mean))
    img = jnp.where(ptp > 0, img / med, img)
    mag = jnp.abs(jnp.fft.fft2(img - jnp.mean(img)))
    power = mag * mag
    flat_labels = labels.reshape(-1)
    magsum = jax.ops.segment_sum(mag.reshape(-1), flat_labels, num_segments=num_rings + 1)
    powersum = jax.ops.segment_sum(power.reshape(-1), flat_labels, num_segments=num_rings + 1)
    return magsum[2:num_rings], powersum[2:num_rings]


def radial_power_spectrum(img):
    """(labels, magsum, powersum) matching centrosome ``rps`` semantics."""
    img = jnp.asarray(img)
    labels, L = _radius_labels(img.shape)
    if L <= 2:
        return np.array([2]), jnp.zeros((1,)), jnp.zeros((1,))
    magsum, powersum = _rps_sums(img, jnp.asarray(labels), L)
    return np.arange(2, L), magsum, powersum


@jax.jit
def _slope_from_powersum(radii_log: jax.Array, powersum: jax.Array) -> jax.Array:
    valid = powersum > 0
    n = jnp.sum(valid)
    x = jnp.where(valid, radii_log, 0.0)
    y = jnp.where(valid, jnp.log(jnp.where(valid, powersum, 1.0)), 0.0)
    sx, sy = jnp.sum(x), jnp.sum(y)
    sxx, sxy = jnp.sum(x * x), jnp.sum(x * y)
    denom = n * sxx - sx * sx
    slope = jnp.where(denom != 0, (n * sxy - sx * sy) / denom, 0.0)
    return jnp.where(n > 2, slope, 0.0)


@jax.jit
def _percent_maximal(img: jax.Array) -> jax.Array:
    mx = jnp.max(img)
    return 100.0 * jnp.sum(img == mx) / img.size


def qc_metrics(img):
    """(PowerLogLogSlope, PercentMaximal) for one 2-D image."""
    img = jnp.asarray(img)
    labels, L = _radius_labels(img.shape)
    pct = _percent_maximal(img.astype(jnp.float32))
    if L <= 2:
        return jnp.float32(0.0), pct
    _, powersum = _rps_sums(img, jnp.asarray(labels), L)
    radii_log = jnp.log(jnp.arange(2, L, dtype=jnp.float32))
    return _slope_from_powersum(radii_log, powersum), pct


def qc_metrics_batch(imgs):
    """Batched QC over (B, H, W): one device program for the whole batch."""
    imgs = jnp.asarray(imgs)
    labels, L = _radius_labels(imgs.shape[1:])
    pct = jax.vmap(_percent_maximal)(imgs.astype(jnp.float32))
    if L <= 2:
        return jnp.zeros(imgs.shape[0], jnp.float32), pct
    labels_j = jnp.asarray(labels)
    _, powersums = jax.vmap(lambda im: _rps_sums(im, labels_j, L))(imgs)
    radii_log = jnp.log(jnp.arange(2, L, dtype=jnp.float32))
    slopes = jax.vmap(lambda p: _slope_from_powersum(radii_log, p))(powersums)
    return slopes, pct

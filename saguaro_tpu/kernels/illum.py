"""Illumination (flat-field) correction + illumination-function estimation.

Reference behavior: per-channel pixelwise division by a precomputed
``<ch>_illum.npy`` function, skipped when the shapes differ
(Cellpose_GPU_s3fs.py:72, Illumination_QC_mult.py:149-153). The division is
VPU work that XLA fuses into whatever stage consumes the corrected image
(QC FFT, U-Net stem, re-binning matmuls), so this stays a plain jnp op.

The functions themselves come from CellProfiler's CorrectIlluminationCalculate
upstream of the reference repo ("CH_illumination.csv" in its folder
contract); ``estimate_illumination`` reproduces the standard recipe —
average all images of a channel across the plate, smooth with a large
Gaussian, normalize to unit mean — as one jitted program, so the suite can
produce its own .npy functions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["illum_correct", "estimate_illumination"]


@partial(jax.jit, static_argnames=("sigma",))
def _smooth_mean(mean_img: jax.Array, sigma: int) -> jax.Array:
    """Separable Gaussian blur via two 1-D convolutions (static sigma)."""
    radius = 3 * sigma
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    ky = k.reshape(-1, 1, 1, 1)
    kx = k.reshape(1, -1, 1, 1)

    def blur(x):
        x = x[None, :, :, None]
        x = jax.lax.conv_general_dilated(
            x, ky, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        x = jax.lax.conv_general_dilated(
            x, kx, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return x[0, :, :, 0]

    # normalized convolution: divide by the blurred support so the zero
    # padding doesn't darken the borders of the illumination estimate
    return blur(mean_img) / blur(jnp.ones_like(mean_img))


def estimate_illumination(images, sigma: int = 50, min_value: float = 1e-6) -> np.ndarray:
    """(N, H, W) channel stack -> (H, W) illumination function.

    CorrectIlluminationCalculate 'Regular'+Gaussian recipe: mean across the
    plate's images, large-kernel smooth, rescale to unit mean, floor to
    keep the downstream division safe.
    """
    stack = jnp.asarray(images, jnp.float32)
    mean_img = jnp.mean(stack, axis=0)
    smooth = _smooth_mean(mean_img, sigma)
    smooth = smooth / jnp.maximum(jnp.mean(smooth), min_value)
    return np.asarray(jnp.maximum(smooth, min_value))


@jax.jit
def illum_correct(image: jax.Array, illum: jax.Array) -> jax.Array:
    """Pixelwise ``image / illum`` in float32.

    Shapes must match; callers replicate the reference's shape-mismatch
    fallback (use the raw image) on the host where shapes are known.
    """
    return image.astype(jnp.float32) / illum.astype(jnp.float32)

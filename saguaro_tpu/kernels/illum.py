"""Illumination (flat-field) correction.

Reference behavior: per-channel pixelwise division by a precomputed
illumination function, skipped when the shapes differ
(Cellpose_GPU_s3fs.py:72, Illumination_QC_mult.py:149-153). The division is
VPU work that XLA fuses into whatever stage consumes the corrected image
(QC FFT, U-Net stem, re-binning matmuls), so this stays a plain jnp op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["illum_correct"]


@jax.jit
def illum_correct(image: jax.Array, illum: jax.Array) -> jax.Array:
    """Pixelwise ``image / illum`` in float32.

    Shapes must match; callers replicate the reference's shape-mismatch
    fallback (use the raw image) on the host where shapes are known.
    """
    return image.astype(jnp.float32) / illum.astype(jnp.float32)

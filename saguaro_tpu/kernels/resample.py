"""Lanczos re-binning as MXU matmuls.

Reference behavior: PIL ``img.resize((R, R), resample=LANCZOS)`` on every
screening image (Image_re-binning.py:17-22, default 1080x1080). Lanczos
resampling is a separable convolution, so on TPU it becomes two dense
matrix multiplies that ride the MXU: ``out = Ry @ img @ Rx^T`` where
``Ry/Rx`` are precomputed (out x in) weight matrices. One jitted program
re-bins a whole batch of images; XLA fuses the dtype conversion and
rounding into the same computation.

The weight construction mirrors PIL's ``precompute_coeffs`` exactly
(support scaling for downsampling, half-pixel centers, per-row
normalization) so outputs match the reference to rounding.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "lanczos_matrices",
    "lanczos_resize",
    "lanczos_resize_batch",
    "bicubic_axis_matrix",
]

_LANCZOS_A = 3.0
_BICUBIC_A = -0.5  # PIL/Keys cubic coefficient
_BICUBIC_SUPPORT = 2.0


def _lanczos_filter(x: np.ndarray) -> np.ndarray:
    """Lanczos-3 windowed sinc, sinc(x)*sinc(x/3) on |x|<3."""
    x = np.asarray(x, dtype=np.float64)
    out = np.sinc(x) * np.sinc(x / _LANCZOS_A)
    return np.where(np.abs(x) < _LANCZOS_A, out, 0.0)


def _bicubic_filter(x: np.ndarray) -> np.ndarray:
    """PIL's bicubic (Keys a=-0.5) kernel on |x|<2."""
    x = np.abs(np.asarray(x, dtype=np.float64))
    a = _BICUBIC_A
    near = ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0
    far = (((x - 5.0) * x + 8.0) * x - 4.0) * a
    return np.where(x < 1.0, near, np.where(x < 2.0, far, 0.0))


_FILTERS = {
    "lanczos": (_lanczos_filter, _LANCZOS_A),
    "bicubic": (_bicubic_filter, _BICUBIC_SUPPORT),
}


@lru_cache(maxsize=64)
def _axis_matrix(in_size: int, out_size: int, filt: str = "lanczos") -> np.ndarray:
    """(out_size, in_size) resampling matrix for one axis, PIL-equivalent."""
    filter_fn, base_support = _FILTERS[filt]
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = base_support * filterscale
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        # PIL: xmin = (int)(center - support + 0.5), xmax likewise —
        # a half-open rounded window, not floor/ceil.
        xmin = max(int(np.floor(center - support + 0.5)), 0)
        xmax = min(int(np.floor(center + support + 0.5)), in_size)
        xs = np.arange(xmin, xmax)
        w = filter_fn((xs - center + 0.5) / filterscale)
        wsum = w.sum()
        if wsum != 0:
            w = w / wsum
        mat[xx, xmin:xmax] = w
    return mat


def bicubic_axis_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) f32 PIL-bicubic resampling matrix — the
    embed preprocessing's resize as one MXU matmul per axis (the
    gather-based jax.image.resize held ~244 ms/batch of the embed
    profile)."""
    return _axis_matrix(in_size, out_size, "bicubic").astype(np.float32)


def lanczos_matrices(in_shape: tuple[int, int], out_shape: tuple[int, int]):
    """Return (Ry, Rx) float32 weight matrices for a 2-D resize."""
    ry = _axis_matrix(in_shape[0], out_shape[0]).astype(np.float32)
    rx = _axis_matrix(in_shape[1], out_shape[1]).astype(np.float32)
    return ry, rx


@partial(jax.jit, static_argnames=("out_shape",))
def _resize2d(img: jax.Array, ry: jax.Array, rx: jax.Array, out_shape) -> jax.Array:
    x = img.astype(jnp.float32)
    x = jnp.einsum("oh,hw->ow", ry, x, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("ow,xw->ox", x, rx, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    return x


def lanczos_resize(img, out_shape: tuple[int, int], dtype=None):
    """Resize one (H, W) image; integer dtypes get PIL-style round+clip."""
    img = jnp.asarray(img)
    dtype = dtype or img.dtype
    ry, rx = lanczos_matrices(img.shape, out_shape)
    out = _resize2d(img, jnp.asarray(ry), jnp.asarray(rx), out_shape)
    return _cast(out, dtype)


@partial(jax.jit, static_argnames=("out_shape",))
def _resize_batch(imgs: jax.Array, ry: jax.Array, rx: jax.Array, out_shape) -> jax.Array:
    x = imgs.astype(jnp.float32)
    x = jnp.einsum("oh,bhw->bow", ry, x, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("bow,xw->box", x, rx, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    return x


def lanczos_resize_batch(imgs, out_shape: tuple[int, int], dtype=None):
    """Resize a (B, H, W) batch in one fused program."""
    imgs = jnp.asarray(imgs)
    dtype = dtype or imgs.dtype
    ry, rx = lanczos_matrices(imgs.shape[1:], out_shape)
    out = _resize_batch(imgs, jnp.asarray(ry), jnp.asarray(rx), out_shape)
    return _cast(out, dtype)


def _cast(x: jax.Array, dtype) -> jax.Array:
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.integer):
        info = jnp.iinfo(dtype)
        # PIL rounds half away from zero then clips to the dtype range.
        x = jnp.clip(jnp.floor(x + 0.5), info.min, info.max)
    return x.astype(dtype)

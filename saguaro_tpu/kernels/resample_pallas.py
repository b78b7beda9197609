"""Pallas Lanczos re-binner: banded separable resample fused in VMEM.

The XLA path (kernels/resample.py) computes ``Ry @ img @ Rx^T`` as two
dense matmuls: the (out_h, in_w) intermediate round-trips HBM and the MXU
multiplies mostly zeros (each Lanczos output row touches only
``~tile*scale + 2*support`` input rows). This kernel exploits the banded
structure:

* per output tile (i, j), the host precomputes the input-window origins
  ``(y0[i], x0[j])`` (scalar-prefetch args) and the dense *band* blocks of
  the resample matrices;
* the kernel DMAs just the (KH, KW) input window HBM -> VMEM and performs
  both matmuls on-chip: ``out = RyBand[i] @ window @ RxBand[j]``;
* no HBM intermediate, KH*KW ~ 290 KB of VMEM per step instead of the
  whole image, and the MXU contracts only the non-zero band.

Numerics match the XLA path to matmul reassociation (f32, HIGHEST).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from saguaro_tpu.kernels.resample import _axis_matrix, _LANCZOS_A

__all__ = ["lanczos_resize_pallas", "lanczos_resize_batch_pallas"]

_TILE = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


@lru_cache(maxsize=32)
def _band_plan(in_size: int, out_size: int, align: int = 8):
    """Per-tile band windows for one axis.

    Returns (origins (n_tiles,) int32, band blocks (n_tiles, TILE, K)
    float32, K) where block[t] = R[t*TILE:(t+1)*TILE, o[t]:o[t]+K] of the
    dense PIL-parity resample matrix. Origins are ``align``-multiples
    (Mosaic DMA offsets must respect the (8, 128) f32 tiling).
    """
    mat = _axis_matrix(in_size, out_size)  # float64 (out, in)
    scale = in_size / out_size
    support = _LANCZOS_A * max(scale, 1.0)
    n_tiles = _cdiv(out_size, _TILE)
    span = int(np.ceil((_TILE - 1) * scale + 2 * support + 4))
    k = _round_up(span + align, max(align, 8))
    k = min(k, _round_up(in_size, max(align, 8)))
    origins = np.zeros(n_tiles, np.int32)
    blocks = np.zeros((n_tiles, _TILE, k), np.float32)
    # pad the dense matrix so every window fits
    mat_p = np.zeros((n_tiles * _TILE, in_size + k + align), np.float64)
    mat_p[:out_size, :in_size] = mat
    for t in range(n_tiles):
        rows = mat_p[t * _TILE : (t + 1) * _TILE]
        nz = np.nonzero(rows.any(axis=0))[0]
        o = int(nz.min()) if nz.size else 0
        o = (o // align) * align
        # windows may extend into the image's (kh, kw) zero padding, and the
        # band blocks are zero there too — clamp only the start in-bounds
        o = min(max(o, 0), (in_size // align) * align)
        origins[t] = o
        blocks[t] = rows[:, o : o + k].astype(np.float32)
    return origins, blocks, k


def _kernel(y0s, x0s, ry_ref, rxt_ref, img_hbm, out_ref, win_ref, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    y0 = pl.multiple_of(y0s[i], 8)
    x0 = pl.multiple_of(x0s[j], 128)
    kh = win_ref.shape[0]
    kw = win_ref.shape[1]
    dma = pltpu.make_async_copy(
        img_hbm.at[pl.ds(y0, kh), pl.ds(x0, kw)], win_ref, sem
    )
    dma.start()
    dma.wait()
    tmp = jnp.dot(
        ry_ref[0], win_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[:] = jnp.dot(
        tmp, rxt_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@partial(jax.jit, static_argnames=("out_shape", "kh", "kw", "interpret"))
def _resize_pallas(img, y0s, x0s, ry_blocks, rxt_blocks, out_shape, kh, kw, interpret=False):
    out_h, out_w = out_shape
    n_i = ry_blocks.shape[0]
    n_j = rxt_blocks.shape[0]
    in_h, in_w = img.shape
    # pad so every DMA window is in-bounds
    img_p = jnp.pad(img.astype(jnp.float32), ((0, kh), (0, kw)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((1, _TILE, kh), lambda i, j, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kw, _TILE), lambda i, j, *_: (j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (_TILE, _TILE), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((kh, kw), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_i * _TILE, n_j * _TILE), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_i * n_j * _TILE * (kh * kw + kw * _TILE),
            bytes_accessed=(in_h * in_w + n_i * _TILE * kh + n_j * kw * _TILE) * 4,
            transcendentals=0,
        ),
    )(y0s, x0s, ry_blocks, rxt_blocks, img_p)
    return out[:out_h, :out_w]


def _plan(in_shape, out_shape):
    y0s, ry_blocks, kh = _band_plan(in_shape[0], out_shape[0], align=8)
    x0s, rx_blocks, kw = _band_plan(in_shape[1], out_shape[1], align=128)
    rxt_blocks = np.ascontiguousarray(np.transpose(rx_blocks, (0, 2, 1)))
    return (
        jnp.asarray(y0s),
        jnp.asarray(x0s),
        jnp.asarray(ry_blocks),
        jnp.asarray(rxt_blocks),
        kh,
        kw,
    )


def lanczos_resize_pallas(img, out_shape: tuple[int, int], dtype=None, interpret: bool = False):
    """Single-image fused resize; same rounding contract as the XLA path."""
    img = jnp.asarray(img)
    dtype = dtype or img.dtype
    y0s, x0s, ry, rxt, kh, kw = _plan(img.shape, out_shape)
    out = _resize_pallas(img, y0s, x0s, ry, rxt, out_shape, kh, kw, interpret)
    return _cast(out, dtype)


def lanczos_resize_batch_pallas(imgs, out_shape: tuple[int, int], dtype=None, interpret: bool = False):
    # NOTE: not vmapped — Mosaic restricts ANY-space (HBM) refs to trivial
    # index maps, so the batch axis is a host loop over one compiled
    # program (per-image work is large; dispatch overhead is negligible).
    imgs = jnp.asarray(imgs)
    dtype = dtype or imgs.dtype
    y0s, x0s, ry, rxt, kh, kw = _plan(imgs.shape[1:], out_shape)
    out = jnp.stack(
        [
            _resize_pallas(imgs[b], y0s, x0s, ry, rxt, out_shape, kh, kw, interpret)
            for b in range(imgs.shape[0])
        ]
    )
    return _cast(out, dtype)


def _cast(x: jax.Array, dtype) -> jax.Array:
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.integer):
        info = jnp.iinfo(dtype)
        x = jnp.clip(jnp.floor(x + 0.5), info.min, info.max)
    return x.astype(dtype)

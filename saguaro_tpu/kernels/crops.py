"""Per-cell crop extraction — static-shape regionprops + box gather.

Replaces the reference's skimage.regionprops + Python crop loop
(Cellpose_GPU_s3fs.py:149-170): per labeled cell, take the integer
centroid, cut a fixed BOX_SIZE box (200 px), multiply by the cell's own
binary mask, and SKIP cells whose box crosses the image edge.

TPU design: label centroids come from segment-sums; crops are a vmapped
``dynamic_slice`` over a static MAX_CELLS bound with a validity mask
covering both "label exists" and "not an edge cell" — no data-dependent
shapes anywhere, so centroid + crop extraction for a whole site is one
jitted program feeding the embedding batch directly in device memory.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["label_centroids", "extract_crops", "BOX_SIZE"]

BOX_SIZE = 200  # reference crop size (Cellpose_GPU_s3fs.py:30)


@partial(jax.jit, static_argnames=("max_cells",))
def label_centroids(labels: jax.Array, max_cells: int = 1024):
    """Integer centroids + pixel counts for labels 1..max_cells-1.

    labels: (H, W) int32 compact labels. Returns (cy, cx, count) each of
    shape (max_cells,), index i describing label i (index 0 = background,
    count forced to 0).
    """
    h, w = labels.shape
    flat = labels.reshape(-1)
    # ids >= max_cells go to the ignored background bin, never to cell max_cells-1
    seg = jnp.where((flat > 0) & (flat < max_cells), flat, 0)
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    valid = (labels > 0).reshape(-1).astype(jnp.float32)
    cnt = jax.ops.segment_sum(valid, seg, num_segments=max_cells)
    cnt = cnt.at[0].set(0.0)
    sy = jax.ops.segment_sum(yy.reshape(-1) * valid, seg, num_segments=max_cells)
    sx = jax.ops.segment_sum(xx.reshape(-1) * valid, seg, num_segments=max_cells)
    denom = jnp.maximum(cnt, 1.0)
    # reference: map(int, prop.centroid) — truncation, not rounding
    cy = jnp.floor(sy / denom).astype(jnp.int32)
    cx = jnp.floor(sx / denom).astype(jnp.int32)
    return cy, cx, cnt.astype(jnp.int32)


@partial(jax.jit, static_argnames=("box", "max_cells"))
def extract_crops(
    image: jax.Array,
    labels: jax.Array,
    max_cells: int = 1024,
    box: int = BOX_SIZE,
):
    """Masked fixed-size crops around every cell centroid.

    image: (H, W, C) float; labels: (H, W) int32 compact labels.
    Returns (crops (max_cells, box, box, C), valid (max_cells,) bool,
    coords (max_cells, 2) int32 [cy, cx]).

    Validity reproduces the reference's edge rule
    (Cellpose_GPU_s3fs.py:162): a cell is skipped when
    y-half < 0, y+half > H, x-half < 0 or x+half > W.
    """
    h, w, c = image.shape
    half = box // 2
    cy, cx, cnt = label_centroids(labels, max_cells)
    in_bounds = (
        (cy - half >= 0) & (cy + half <= h) & (cx - half >= 0) & (cx + half <= w)
    )
    valid = (cnt > 0) & in_bounds

    image_f = image.astype(jnp.float32)
    labels_i = labels.astype(jnp.int32)

    def one(lab_id, y, x):
        y0 = jnp.clip(y - half, 0, h - box)
        x0 = jnp.clip(x - half, 0, w - box)
        img_crop = jax.lax.dynamic_slice(image_f, (y0, x0, 0), (box, box, c))
        m_crop = jax.lax.dynamic_slice(labels_i, (y0, x0), (box, box))
        mask = (m_crop == lab_id)[:, :, None].astype(jnp.float32)
        return img_crop * mask

    lab_ids = jnp.arange(max_cells, dtype=jnp.int32)
    crops = jax.vmap(one)(lab_ids, cy, cx)
    crops = jnp.where(valid[:, None, None, None], crops, 0.0)
    coords = jnp.stack([cy, cx], axis=-1)
    return crops, valid, coords

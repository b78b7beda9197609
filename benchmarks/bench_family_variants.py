"""Formulation shootout for the remaining hot measurement families
(post-fusion bisection: texture .47, quantiles .45, convex+radius .40,
neighbors .29 s/site). Inputs are pre-uploaded device arrays; results
fetched as one packed array; batch 8 via vmap — the in-program operating
point without per-iteration upload noise.

Variants:
  glcm_per_channel      current production (object_glcm x C)
  glcm_multichannel     shared label one-hot, (chunk, C*4L^2) codes
  glcm_scatter          keyed segment-sum formulation
  quant_scatter         current production (keyed 131k-segment hists)
  quant_onehot          histograms as onehot_counts matmuls
  neighbors_scatter     current production (4 keyed 262k scatters)
  neighbors_onehot      pair counting as onehot_counts (4 x 512 codes)
  convex / radius       current kernels, separately
  radius_chamfer_only   the distance transform alone
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

B, SIZE, CELLS = 8, 1080, 512


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from saguaro_tpu.kernels.glcm import (
        object_glcm,
        object_glcm_multichannel,
        object_glcm_scatter,
    )
    from saguaro_tpu.kernels.objects_extra import (
        neighbor_features,
        quantile_intensity_features,
    )
    from saguaro_tpu.kernels.onehot_reduce import onehot_counts
    from saguaro_tpu.kernels.segment_reduce import _flat, segment_stats
    from saguaro_tpu.kernels.shape_extra import (
        _label_edt,
        convex_features,
        radius_features,
    )

    rng = np.random.default_rng(0)
    image_np = rng.integers(80, 120, (B, SIZE, SIZE, 2)).astype(np.float32)
    labels_np = np.zeros((B, SIZE, SIZE), np.int32)
    yy, xx = np.meshgrid(np.arange(SIZE), np.arange(SIZE), indexing="ij")
    k = 0
    for cy in range(60, SIZE - 20, 64):
        for cx in range(60, SIZE - 20, 64):
            k += 1
            m = (yy - cy) ** 2 + (xx - cx) ** 2 <= 20**2
            labels_np[:, m] = k
            image_np[:, m, 0] += 2000.0
    images = jnp.asarray(image_np)
    labs = jnp.asarray(labels_np)

    def timed(jf, *args, iters=3):
        def fetch():
            out = jf(*args)
            leaves = jax.tree_util.tree_leaves(out)
            return np.asarray(
                jnp.concatenate([jnp.ravel(l).astype(jnp.float32) for l in leaves])
            )

        fetch()
        t0 = time.perf_counter()
        for _ in range(iters):
            fetch()
        return (time.perf_counter() - t0) / iters / B

    def rec(name, fn, *args):
        try:
            dt = timed(jax.jit(fn), *args)
            print(json.dumps({"variant": name, "s_per_site": round(dt, 4)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": f"{type(e).__name__}: {e}"}), flush=True)

    vm = jax.vmap

    # ---- texture (one object set, both channels) ----
    rec(
        "glcm_per_channel_2ch",
        lambda im, l: [
            vm(lambda i, li: object_glcm(i, li, CELLS, 16, 3))(im[..., c], l)
            for c in range(2)
        ],
        images, labs,
    )
    rec(
        "glcm_multichannel_2ch",
        lambda im, l: vm(lambda i, li: object_glcm_multichannel(i, li, CELLS, 16, 3))(im, l),
        images, labs,
    )
    rec(
        "glcm_scatter_2ch",
        lambda im, l: [
            vm(lambda i, li: object_glcm_scatter(i, li, CELLS, 16, 3))(im[..., c], l)
            for c in range(2)
        ],
        images, labs,
    )

    # ---- quantiles (one object set, both channels) ----
    rec(
        "quant_scatter_2ch",
        lambda im, l: [
            vm(lambda i, li: quantile_intensity_features(i, li, CELLS))(im[..., c], l)
            for c in range(2)
        ],
        images, labs,
    )

    NB = 256

    def quant_onehot_1ch(img2d, labels2d):
        flat = labels2d.reshape(-1).astype(jnp.int32)
        seg = jnp.where((flat > 0) & (flat < CELLS), flat, 0)
        inside = (labels2d > 0).reshape(-1)
        v = img2d.reshape(-1).astype(jnp.float32)
        cnt, s, ss, vmin, vmax = segment_stats(img2d, labels2d, CELLS)
        vrange = jnp.maximum(vmax - vmin, 1e-12)
        pmin = jnp.take(vmin, seg)
        prange = jnp.take(vrange, seg)
        bins = jnp.clip(((v - pmin) / prange * NB), 0, NB - 1).astype(jnp.int32)
        (hist,) = onehot_counts(seg, [(bins, inside, NB)], CELLS)
        cdf = jnp.cumsum(hist, axis=1)
        total = jnp.maximum(cdf[:, -1:], 1.0)
        cdfn = cdf / total
        q = lambda p: vmin + (jnp.argmax(cdfn >= p, axis=1).astype(jnp.float32) + 0.5) / NB * vrange
        med = q(0.5)
        pmed = jnp.take(med, seg)
        dev = jnp.abs(v - pmed)
        dbins = jnp.clip((dev / prange * NB), 0, NB - 1).astype(jnp.int32)
        (dhist,) = onehot_counts(seg, [(dbins, inside, NB)], CELLS)
        dcdf = jnp.cumsum(dhist, axis=1) / total
        mad = (jnp.argmax(dcdf >= 0.5, axis=1).astype(jnp.float32) + 0.5) / NB * vrange
        return med, mad, q(0.25), q(0.75)

    rec(
        "quant_onehot_2ch",
        lambda im, l: [
            vm(lambda i, li: quant_onehot_1ch(i, li))(im[..., c], l) for c in range(2)
        ],
        images, labs,
    )

    # ---- neighbors (one object set) ----
    rec(
        "neighbors_scatter",
        lambda l: vm(lambda li: neighbor_features(li, CELLS, 5))(l),
        labs,
    )

    def neighbors_onehot(labels2d, distance=5):
        from saguaro_tpu.kernels.morphology import _pool

        lab = labels2d.astype(jnp.int32)
        grown = lab
        for _ in range(max(distance // 2, 0)):
            neigh = _pool(grown.astype(jnp.float32), jax.lax.max).astype(jnp.int32)
            grown = jnp.where(grown == 0, neigh, grown)
        pad = jnp.pad(grown, 1, constant_values=0)
        shifts = (pad[:-2, 1:-1], pad[2:, 1:-1], pad[1:-1, :-2], pad[1:-1, 2:])
        me = jnp.where((grown > 0) & (grown < CELLS), grown, 0)
        touching = jnp.zeros(grown.shape, jnp.bool_)
        codes = []
        for sh in shifts:
            other = jnp.where((sh > 0) & (sh < CELLS), sh, 0)
            is_pair = (me > 0) & (other > 0) & (me != other)
            touching = touching | is_pair
            codes.append((other.reshape(-1), is_pair.reshape(-1), CELLS))
        hists = onehot_counts(me.reshape(-1), codes, CELLS)
        pairs = (sum(hists) > 0).astype(jnp.float32)
        n_neighbors = jnp.sum(pairs, axis=1)
        padl = jnp.pad(lab, 1, constant_values=0)
        boundary = (
            (padl[:-2, 1:-1] != lab) | (padl[2:, 1:-1] != lab)
            | (padl[1:-1, :-2] != lab) | (padl[1:-1, 2:] != lab)
        ) & (lab > 0)
        flat = lab.reshape(-1)
        seg = jnp.where((flat > 0) & (flat < CELLS), flat, 0)
        b_cnt = jax.ops.segment_sum(
            boundary.reshape(-1).astype(jnp.float32), seg, num_segments=CELLS
        )
        t_cnt = jax.ops.segment_sum(
            (boundary & touching).reshape(-1).astype(jnp.float32), seg, num_segments=CELLS
        )
        pct = 100.0 * t_cnt / jnp.maximum(b_cnt, 1.0)
        return n_neighbors, pct

    rec("neighbors_onehot", lambda l: vm(neighbors_onehot)(l), labs)

    # ---- convex / radius decomposition (one object set) ----
    rec("convex", lambda l: vm(lambda li: convex_features(li, CELLS, 72))(l), labs)
    rec("radius", lambda l: vm(lambda li: radius_features(li, CELLS, 48))(l), labs)
    rec("radius_edt_only", lambda l: vm(lambda li: _label_edt(li, 48))(l), labs)


if __name__ == "__main__":
    main()

"""Why is shape_features ~70 ms/site when its primitives measure ~10 ms?

Variants timed at bench.py's operating point (B=8, 1080 px, 290 disk
cells, 512 bound), output fetched as one scalar per variant:

  matmul          current shape_features (2 segment_matmul_sums passes)
  scatter         same math, jax.ops.segment_sum payload reductions
  matmul_barrier  payload materialized via optimization_barrier before
                  the chunked scan (tests payload-recompute-per-chunk)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

B, SIZE, CELLS = 8, 1080, 512


def make_labels():
    labels = np.zeros((SIZE, SIZE), np.int32)
    yy, xx = np.meshgrid(np.arange(SIZE), np.arange(SIZE), indexing="ij")
    k = 0
    for cy in range(60, SIZE - 20, 64):
        for cx in range(60, SIZE - 20, 64):
            k += 1
            labels[(yy - cy) ** 2 + (xx - cx) ** 2 <= 20**2] = k
    return np.stack([labels] * B)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from saguaro_tpu.kernels.onehot_reduce import segment_matmul_sums
    from saguaro_tpu.kernels.segment_reduce import _flat, shape_features

    labs = jnp.asarray(make_labels())

    def payload_of(labels):
        h, w = labels.shape
        inside = labels > 0
        ones = inside.reshape(-1).astype(jnp.float32)
        yy, xx = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        lab = labels.astype(jnp.int32)
        pad = jnp.pad(lab, 1, constant_values=0)
        boundary = (
            (pad[:-2, 1:-1] != lab)
            | (pad[2:, 1:-1] != lab)
            | (pad[1:-1, :-2] != lab)
            | (pad[1:-1, 2:] != lab)
        ) & inside
        yf, xf = yy.reshape(-1), xx.reshape(-1)
        return jnp.stack(
            [ones, yf * ones, xf * ones, boundary.reshape(-1).astype(jnp.float32)],
            axis=1,
        )

    def v_matmul(labels):
        seg = _flat(labels, CELLS)
        return segment_matmul_sums(seg, payload_of(labels), CELLS)

    def v_matmul_barrier(labels):
        seg = _flat(labels, CELLS)
        p = jax.lax.optimization_barrier(payload_of(labels))
        return segment_matmul_sums(seg, p, CELLS)

    def v_scatter(labels):
        seg = _flat(labels, CELLS)
        return jax.ops.segment_sum(payload_of(labels), seg, num_segments=CELLS)

    def v_full_shape(labels):
        return shape_features(labels, CELLS)["Area"]

    variants = {
        "matmul": v_matmul,
        "matmul_barrier": v_matmul_barrier,
        "scatter": v_scatter,
        "full_shape_features": v_full_shape,
    }
    for name, fn in variants.items():
        jf = jax.jit(lambda l, f=fn: jnp.sum(jax.vmap(f)(l)))
        float(jf(labs))
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            float(jf(labs))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"variant": name, "ms_per_site": round(dt / B * 1000, 2)}), flush=True)


if __name__ == "__main__":
    main()

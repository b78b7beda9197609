"""segment_matmul_sums (chunked one-hot MXU matmul) vs jax.ops.segment_sum
(XLA scatter-add) for per-object payload sums, at bench.py's operating
point (B=8 sites, N=1.17M pixels, 512-cell bound, ~290 live cells).

Round-1 guidance said scatters serialize on TPU and matmuls win; the r2
family profile (bench_measure_families.py) measured the opposite for
every plain payload reduction. This bench decides per (K, formulation).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

B, N, CELLS = 8, 1080 * 1080, 512


def main():
    import jax
    import jax.numpy as jnp

    from saguaro_tpu.kernels.onehot_reduce import segment_matmul_sums

    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, 290, (B, N)).astype(np.int32))

    def timeit(fn, *args):
        np.asarray(fn(*args))
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            np.asarray(fn(*args))
        return (time.perf_counter() - t0) / iters

    for k in (4, 16, 64, 128):
        vals = jnp.asarray(rng.random((B, N, k)).astype(np.float32))

        mm = jax.jit(
            lambda l, v: jax.vmap(
                lambda li, vi: segment_matmul_sums(li, vi, CELLS)
            )(l, v)
        )
        sc = jax.jit(
            lambda l, v: jax.vmap(
                lambda li, vi: jax.ops.segment_sum(vi, li, num_segments=CELLS)
            )(l, v)
        )
        t_mm = timeit(mm, labels, vals)
        t_sc = timeit(sc, labels, vals)
        print(
            json.dumps(
                {
                    "k": k,
                    "matmul_ms_per_site": round(t_mm / B * 1000, 2),
                    "scatter_ms_per_site": round(t_sc / B * 1000, 2),
                }
            ),
            flush=True,
        )

    # keyed histogram comparison (quantile-style): label*256+bin
    bins = jnp.asarray(rng.integers(0, 256, (B, N)).astype(np.int32))
    keys = labels * 256 + bins
    ones = jnp.ones((B, N), jnp.float32)
    hist = jax.jit(
        lambda kk, o: jax.vmap(
            lambda ki, oi: jax.ops.segment_sum(oi, ki, num_segments=CELLS * 256)
        )(kk, o)
    )
    t_h = timeit(hist, keys, ones)
    print(json.dumps({"keyed_hist_131k_ms_per_site": round(t_h / B * 1000, 2)}), flush=True)


if __name__ == "__main__":
    main()

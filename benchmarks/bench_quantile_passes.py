"""Pin the cost model of the exact-quantile rank machinery at the
measurement op point (B=8 vmapped sites, 1080² pixels, 512-cell bound).

The 256×256 → 16⁴ hierarchy change cut one-hot histogram COLUMNS 6× but
the measured family cost did not move (0.25 → 0.242 s/site), so the cost
is NOT matmul flops. This bench times, standalone at the exact op-point
shapes:

  * one vmapped onehot_counts pass at varying column counts
  * one vmapped mxu_take pass at varying table widths
  * both at varying chunk sizes
  * the full quantile_intensity_features_mc program

to find what a "pass" actually costs and what it scales with.

Usage: python benchmarks/bench_quantile_passes.py   (run in background;
each config is its own remote compile)
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

    from saguaro_tpu.kernels.onehot_reduce import mxu_take, onehot_counts

    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, 290, (B, N)).astype(np.int32))
    codes = jnp.asarray(rng.integers(0, 65536, (B, N)).astype(np.int32))
    valid = labels > 0

    def timeit(fn, *args):
        np.asarray(jax.block_until_ready(fn(*args))[0])  # compile+warm
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            np.asarray(jax.block_until_ready(fn(*args))[0])
        return (time.perf_counter() - t0) / iters

    # one histogram pass: n_queries entries of nb bins each
    for n_q, nb, chunk in [
        (5, 16, 32768),
        (25, 16, 32768),
        (5, 256, 32768),
        (25, 256, 32768),
        (25, 16, 131072),
        (25, 256, 131072),
        (5, 16, 1080 * 1080),
        (25, 256, 1080 * 1080),
    ]:
        fn = jax.jit(
            lambda l, c, v, n_q=n_q, nb=nb, chunk=chunk: jax.vmap(
                lambda li, ci, vi: onehot_counts(
                    li,
                    [((ci >> k) % nb, vi, nb) for k in range(n_q)],
                    CELLS,
                    chunk=chunk,
                )[0]
            )(l, c, v)
        )
        t = timeit(fn, labels, codes, valid)
        print(
            json.dumps(
                {
                    "pass": "hist",
                    "queries": n_q,
                    "bins": nb,
                    "cols": n_q * nb,
                    "chunk": chunk,
                    "ms_per_site": round(t / B * 1000, 2),
                }
            ),
            flush=True,
        )

    # one gather pass (mxu_take of a per-label table)
    for k_cols, chunk in [(5, 32768), (25, 32768), (25, 131072), (25, 1080 * 1080)]:
        table = jnp.asarray(rng.random((B, CELLS, k_cols)).astype(np.float32))
        fn = jax.jit(
            lambda t_, l, chunk=chunk: jax.vmap(
                lambda ti, li: mxu_take(ti, li, CELLS, chunk=chunk)
            )(t_, l)
        )
        t = timeit(fn, table, labels)
        print(
            json.dumps(
                {
                    "pass": "take",
                    "cols": k_cols,
                    "chunk": chunk,
                    "ms_per_site": round(t / B * 1000, 2),
                }
            ),
            flush=True,
        )

    # the full quantile program, current formulation
    from saguaro_tpu.kernels.objects_extra import quantile_intensity_features_mc

    img = jnp.asarray(rng.integers(0, 3000, (B, N)).astype(np.float32)).reshape(
        B, 1080, 1080, 1
    )
    img5 = jnp.concatenate([img] * 5, axis=-1)
    lab2d = labels.reshape(B, 1080, 1080)
    fn = jax.jit(
        lambda i, l: jax.vmap(
            lambda ii, li: quantile_intensity_features_mc(ii, li, CELLS)[
                "MedianIntensity"
            ]
        )(i, l)
    )
    t = timeit(fn, img5, lab2d)
    print(json.dumps({"pass": "full_quantile_5ch", "ms_per_site": round(t / B * 1000, 2)}), flush=True)


if __name__ == "__main__":
    main()

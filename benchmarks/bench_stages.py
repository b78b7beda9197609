"""Extended per-stage TPU benchmarks (bench.py prints the headline metric;
this script characterizes every hot stage).

Usage: python benchmarks/bench_stages.py [stage ...]
Stages: rebin qc embed segment maxproj
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, iters=3):
    """fn must RETURN its result; we materialize it on host every
    iteration — block_until_ready alone under-measures through this
    environment's device relay."""
    np.asarray(fn())  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn())
    return (time.perf_counter() - t0) / iters


def bench_maxproj():
    import jax

    from saguaro_tpu.kernels.maxproj import max_project_batch

    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    stacks = jnp.asarray(rng.integers(0, 4095, (32, 5, 1080, 1080)).astype(np.uint16))
    dt = _timeit(lambda: max_project_batch(stacks))
    return {"stage": "maxproj_1080px_z5", "value": round(32 / dt, 2), "unit": "projections/sec"}


def bench_rebin():
    import jax
    import jax.numpy as jnp

    from saguaro_tpu.kernels.resample import lanczos_resize_batch
    from saguaro_tpu.kernels.resample_pallas import lanczos_resize_batch_pallas

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, 65535, (16, 2160, 2160)).astype(np.uint16))
    dt_x = _timeit(lambda: lanczos_resize_batch(batch, (1080, 1080)), 5)
    dt_p = _timeit(lambda: lanczos_resize_batch_pallas(batch, (1080, 1080)), 5)
    return {
        "stage": "rebin_2160_to_1080",
        "value": round(16 / dt_p, 2),
        "unit": "images/sec",
        "xla_images_per_sec": round(16 / dt_x, 2),
        "pallas_speedup": round(dt_x / dt_p, 2),
    }


def bench_qc():
    import jax
    import jax.numpy as jnp

    from saguaro_tpu.kernels.qc import qc_metrics_batch

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 4095, (16, 1080, 1080)).astype(np.float32))
    dt = _timeit(lambda: qc_metrics_batch(imgs)[0], 5)
    return {"stage": "qc_powerloglog_1080px", "value": round(16 / dt, 2), "unit": "images/sec"}


def bench_embed():
    import jax
    import jax.numpy as jnp

    from saguaro_tpu.models.effnetv2 import EFFNETV2_L, init_effnetv2, preprocess_crops

    model, variables = init_effnetv2(EFFNETV2_L, seed=0)
    rng = np.random.default_rng(0)
    chunk = 64
    crops = jnp.asarray(rng.integers(0, 4095, (chunk, 200, 200)).astype(np.float32))

    @jax.jit
    def embed(v, c):
        # variables as an argument: closure capture would bake 118M params
        # into the HLO as constants
        return model.apply(v, preprocess_crops(c, 480))

    dt = _timeit(lambda: embed(variables, crops), 3)
    return {
        "stage": "effnetv2l_embed_200px_crops",
        "value": round(chunk / dt, 2),
        "unit": "crops/sec",
        "chunk": chunk,
    }


def bench_segment():
    from saguaro_tpu.pipeline.segment_embed import SegmentEmbedConfig, SegmentEmbedEngine

    cfg = SegmentEmbedConfig(channels=["DNA", "GFP"], diameter=100.0)
    engine = SegmentEmbedEngine(cfg, seed=0)
    rng = np.random.default_rng(0)
    batch = rng.integers(80, 4000, (cfg.site_batch, 1080, 1080, 2)).astype(np.uint16)
    dt = _timeit(lambda: np.stack([np.asarray(x) for x in engine.segment_batch(batch)]), 3)
    return {
        "stage": "segment_1080px_batch",
        "value": round(cfg.site_batch / dt, 3),
        "unit": "images/sec",
    }


def bench_measure():
    """CP-equivalent measurement, batched (the full 5-channel set)."""
    from saguaro_tpu.pipeline.features import FeatureConfig, measure_site_batch

    size, n_ch, b = 1080, 5, 4
    rng = np.random.default_rng(0)
    images = (rng.random((b, size, size, n_ch)) * 1000).astype(np.float32)
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    nuclei = np.zeros((b, size, size), np.int32)
    k = 0
    for cy in range(40, size, 64):
        for cx in range(40, size, 64):
            k += 1
            nuclei[:, (yy - cy) ** 2 + (xx - cx) ** 2 <= 20**2] = k
    cfg = FeatureConfig(channels=tuple(f"ch{i}" for i in range(n_ch)), max_cells=512)
    dt = _timeit(lambda: measure_site_batch(images, nuclei, cfg), 2)
    return {
        "stage": "cp_measure_1080px_5ch_batch4",
        "value": round(dt / b, 2),
        "unit": "s/site",
        "cells_per_site": k,
    }


STAGES = {
    "maxproj": bench_maxproj,
    "rebin": bench_rebin,
    "qc": bench_qc,
    "embed": bench_embed,
    "segment": bench_segment,
    "measure": bench_measure,
}


def main():
    names = sys.argv[1:] or list(STAGES)
    for name in names:
        try:
            print(json.dumps(STAGES[name]()))
        except Exception as e:
            print(json.dumps({"stage": name, "error": f"{type(e).__name__}: {e}"}))


if __name__ == "__main__":
    main()

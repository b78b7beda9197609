"""Embed-chunk sweep at the production op point (re-run after any change
to the per-chunk program — the optimum moved when extraction was fused,
and BN folding changed the per-chunk cost again).

Usage: BENCH_CHUNKS="128 192 256" python benchmarks/bench_embed_chunk.py
(background; each chunk size is its own remote compile)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SIZE = 1080
N_CH = int(os.environ.get("BENCH_NCH", "5"))
CHUNKS = [int(c) for c in os.environ.get("BENCH_CHUNKS", "128 192 256").split()]


def main():
    import jax.numpy as jnp

    from saguaro_tpu.pipeline.segment_embed import (
        SegmentEmbedConfig,
        SegmentEmbedEngine,
    )

    rng = np.random.default_rng(0)
    image = rng.integers(80, 120, (SIZE, SIZE, N_CH)).astype(np.uint16)
    labels = np.zeros((SIZE, SIZE), np.int32)
    yy, xx = np.meshgrid(np.arange(SIZE), np.arange(SIZE), indexing="ij")
    k = 0
    for cy in range(60, SIZE - 20, 64):
        for cx in range(60, SIZE - 20, 64):
            k += 1
            m = (yy - cy) ** 2 + (xx - cx) ** 2 <= 20**2
            labels[m] = k
            image[m, 0] += 2000
            for ch in range(1, N_CH):
                image[m, ch] += 500

    for chunk in CHUNKS:
        cfg = SegmentEmbedConfig(
            channels=["DNA", "GFP", "ER", "Mito", "AGP", "RNA"][:N_CH],
            diameter=100.0,
            embed_chunk=chunk,
        )
        engine = SegmentEmbedEngine(cfg, seed=0)
        b = cfg.site_batch
        images_dev = jnp.asarray(np.stack([image] * b))
        labels_list = list(jnp.asarray(np.stack([labels] * b)))
        engine.embed_sites_pooled(images_dev, labels_list)  # compile + warm
        t0 = time.perf_counter()
        iters = 2
        for _ in range(iters):
            engine.embed_sites_pooled(images_dev, labels_list)
        dt = (time.perf_counter() - t0) / iters / b
        print(f"chunk {chunk}: {dt:.3f} s/site", flush=True)


if __name__ == "__main__":
    main()

"""Benchmark: Cellpose-style segmentation throughput on one TPU chip.

Measures the flagship hot path — U-Net tiled inference + flow-following
mask recovery — on reference-sized inputs (1080x1080 binned fields,
Image_re-binning.py default) and prints ONE JSON line:

  {"metric": ..., "value": images/sec, "unit": ..., "vs_baseline": ...}

vs_baseline: the reference publishes no numbers (BASELINE.md); the north
star is a full 384-well plate segmented+featurized in <5 min on a v5e-8.
Per chip that allows 2400 s for 384 fields => 0.16 img/s/chip parity.
vs_baseline = measured_throughput / 0.16 (higher is better, >1 beats the
north star for the segmentation stage).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    from saguaro_tpu.pipeline.segment_embed import SegmentEmbedConfig, SegmentEmbedEngine

    size = 1080
    cfg = SegmentEmbedConfig(channels=["DNA", "GFP"], diameter=100.0)
    engine = SegmentEmbedEngine(cfg, seed=0)

    rng = np.random.default_rng(0)
    image = rng.integers(80, 120, (size, size, 2)).astype(np.float32)
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    for cy in range(60, size, 140):
        for cx in range(60, size, 140):
            m = (yy - cy) ** 2 + (xx - cx) ** 2 <= 30**2
            image[m, 0] += 2000.0

    batch = np.stack([image] * cfg.site_batch)

    def one_batch():
        return engine.segment_batch(batch)

    # warmup/compile
    one_batch()

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        one_batch()
    dt = (time.perf_counter() - t0) / iters

    ips = cfg.site_batch / dt
    parity_ips = 384.0 / (300.0 * 8.0)  # north star per chip
    print(
        json.dumps(
            {
                "metric": "cellpose_segmentation_images_per_sec_1080px",
                "value": round(ips, 4),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / parity_ips, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

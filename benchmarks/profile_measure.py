"""Profile the fused measurement program at the production op point.

Runs one warm `measure_site_batch` (1080² 5-ch batch 8, ~256 cells) under
`jax.profiler.trace`, then aggregates per-op device durations by HLO
category and by op name (the axon relay supports jax.profiler, BENCH.md).

Usage: python benchmarks/profile_measure.py [summarize]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SIZE = 1080
N_CH = int(os.environ.get("BENCH_NCH", "5"))
B = int(os.environ.get("BENCH_BATCH", "8"))
TRACE_DIR = "/tmp/measure_profile"


def main():
    import jax

    from saguaro_tpu.pipeline.features import FeatureConfig, measure_site_batch

    rng = np.random.default_rng(0)
    image = rng.integers(80, 120, (SIZE, SIZE, N_CH)).astype(np.float32)
    labels = np.zeros((SIZE, SIZE), np.int32)
    yy, xx = np.meshgrid(np.arange(SIZE), np.arange(SIZE), indexing="ij")
    k = 0
    for cy in range(60, SIZE - 20, 64):
        for cx in range(60, SIZE - 20, 64):
            k += 1
            m = (yy - cy) ** 2 + (xx - cx) ** 2 <= 20**2
            labels[m] = k
            image[m, 0] += 2000.0
            for ch in range(1, N_CH):
                image[m, ch] += 500.0
    images = np.stack([image] * B)
    nuclei = np.stack([labels] * B)
    cfg = FeatureConfig(channels=tuple(f"ch{i}" for i in range(N_CH)))

    print(f"warm-up measure ({k} cells x {N_CH} ch, batch {B})", file=sys.stderr)
    measure_site_batch(images, nuclei, cfg)

    print("tracing one measure pass", file=sys.stderr)
    with jax.profiler.trace(TRACE_DIR):
        measure_site_batch(images, nuclei, cfg)

    summarize()


def summarize():
    paths = sorted(glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace.json.gz found", file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    by_name = defaultdict(float)
    by_cat = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        args = ev.get("args") or {}
        cat = args.get("hlo_category")
        if cat is None:
            continue
        dur_ms = ev["dur"] / 1e3
        by_cat[cat] += dur_ms
        by_name[ev.get("name", "?")] += dur_ms
        total += dur_ms
    print(f"\ndevice time by HLO category (ms, total {total:.1f}):")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:9.1f}  {100*ms/total:5.1f}%  {cat}")
    print("\ntop 40 ops (ms):")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms:9.1f}  {100*ms/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "summarize":
        summarize()
    else:
        main()

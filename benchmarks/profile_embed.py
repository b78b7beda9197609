"""Profile the fused embed-chunk program at the production op point.

Runs one warm `SegmentEmbedEngine.embed_sites_pooled` call (1080² 5-ch
batch, GT circle labels) under `jax.profiler.trace`, then aggregates the
trace's per-op durations by HLO category and by op name so the top
device-time consumers are visible without a TensorBoard install.

The axon relay supports jax.profiler (BENCH.md); the xplane/trace.json.gz
land under /tmp/embed_profile.

Usage: python benchmarks/profile_embed.py [n_chunks]
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
TRACE_DIR = "/tmp/embed_profile"


def main():
    import jax
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

    cfg = SegmentEmbedConfig(
        channels=["DNA", "GFP", "ER", "Mito", "AGP", "RNA"][:N_CH],
        diameter=100.0,
    )
    engine = SegmentEmbedEngine(cfg, seed=0)
    b = cfg.site_batch
    images_dev = jnp.asarray(np.stack([image] * b))
    labels_list = list(jnp.asarray(np.stack([labels] * b)))

    print(f"warm-up embed ({k} cells x {N_CH} ch, batch {b})", file=sys.stderr)
    engine.embed_sites_pooled(images_dev, labels_list)

    print("tracing one embed pass", file=sys.stderr)
    with jax.profiler.trace(TRACE_DIR):
        engine.embed_sites_pooled(images_dev, labels_list)

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
        # device-lane events carry an HLO category; host events don't
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
    print("\ntop 25 ops (ms):")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {ms:9.1f}  {100*ms/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "summarize":
        summarize()
    else:
        main()

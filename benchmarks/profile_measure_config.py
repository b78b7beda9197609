"""Device-profile a measure_site_batch variant and print HLO-category
totals — the contention-immune way to attribute a feature family's cost
(wall-clock bisect arms are hostage to relay weather; device durations
from jax.profiler are not).

Usage:
    python benchmarks/profile_measure_config.py [key=value ...]
e.g.
    python benchmarks/profile_measure_config.py measure_colocalization=False
    python benchmarks/profile_measure_config.py radial_binning=centroid

Values are parsed as Python literals. Compares nothing itself — run the
FULL config (no args) and the variant, diff the printed totals.
"""

from __future__ import annotations

import ast
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
TRACE_DIR = "/tmp/measure_profile_cfg"


def main():
    import jax

    from saguaro_tpu.pipeline.features import FeatureConfig, measure_site_batch

    overrides = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=", 1)
        try:
            overrides[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            overrides[k] = v

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
    cfg = FeatureConfig(
        channels=tuple(f"ch{i}" for i in range(N_CH)), **overrides
    )

    print(f"warm-up ({k} cells x {N_CH} ch, batch {B}) {overrides}", file=sys.stderr)
    measure_site_batch(images, nuclei, cfg)
    print("tracing", file=sys.stderr)
    with jax.profiler.trace(TRACE_DIR):
        measure_site_batch(images, nuclei, cfg)

    paths = sorted(glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    by_cat = defaultdict(float)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        args = ev.get("args") or {}
        cat = args.get("hlo_category")
        if cat is None:
            continue
        by_cat[cat] += ev["dur"] / 1e3
        total += ev["dur"] / 1e3
    print(json.dumps({"overrides": overrides, "device_ms_total": round(total, 1),
                      "by_category": {c: round(ms, 1) for c, ms in
                                      sorted(by_cat.items(), key=lambda kv: -kv[1])}}))


if __name__ == "__main__":
    main()

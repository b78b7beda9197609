"""Honest cost bisection of the REAL fused measurement program
(pipeline.features._measure_flat) at bench.py's exact operating point:
1080 px, 2 channels, batch 8, ~289 cells/site.

Times the full program, then re-times with one family toggled off at a
time — the delta is that family's true in-program cost (XLA fusion,
shared subexpressions, and packed fetch included). Each config is its
own compile (minutes through this environment's remote-compile relay),
so run in background.

Usage: python benchmarks/bench_measure_bisect.py [config ...]
(default: all; configs: FULL -texture -zernike -moments -quantiles
-edge -radial -neighbors -convex-radius -propagation MINIMAL)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os
SIZE = 1080
N_CH = int(os.environ.get("BISECT_NCH", "2"))
B = int(os.environ.get("BISECT_BATCH", "8"))


def main():
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
            image[m, 1] += 500.0
    images = np.stack([image] * B)
    nuclei = np.stack([labels] * B)
    channels = tuple(f"ch{i}" for i in range(N_CH))

    def timed(cfg, iters=2):
        measure_site_batch(images, nuclei, cfg)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            measure_site_batch(images, nuclei, cfg)
        return (time.perf_counter() - t0) / iters / B

    which = sys.argv[1:] or None

    def want(name):
        return which is None or name in which

    t_full = None
    if want("FULL"):
        full = FeatureConfig(channels=channels, max_cells=512)
        t_full = timed(full)
        print(json.dumps({"config": "FULL", "s_per_site": round(t_full, 3)}), flush=True)

    toggles = {
        "-texture": dict(measure_texture=False),
        "-zernike": dict(measure_zernike=False),
        "-moments": dict(measure_moments=False),
        "-quantiles": dict(measure_quantiles=False),
        "-edge": dict(measure_edge=False),
        "-radial": dict(measure_radial=False),
        "-neighbors": dict(measure_neighbors=False),
        "-convex-radius": dict(measure_convex=False, measure_radius=False),
        "-propagation": dict(secondary_method="distance"),
        # r5 parity additions (VERDICT r4 item #8): their in-program cost
        "-coloc": dict(measure_colocalization=False),
        "-radial-cp": dict(radial_binning="centroid"),
        "+costes-fine": dict(costes_fine_scale=65535),
        "+adaptive-thr": dict(secondary_threshold_scope="adaptive"),
        "+convex144": dict(convex_dirs=144),
    }
    for name, kw in toggles.items():
        if not want(name):
            continue
        cfg = FeatureConfig(channels=channels, max_cells=512, **kw)
        t = timed(cfg)
        rec = {"config": name, "s_per_site": round(t, 3)}
        if t_full is not None:
            rec["family_cost"] = round(t_full - t, 3)
        print(json.dumps(rec), flush=True)

    if want("MINIMAL"):
        minimal = FeatureConfig(
            channels=channels,
            max_cells=512,
            measure_texture=False,
            measure_zernike=False,
            measure_moments=False,
            measure_quantiles=False,
            measure_edge=False,
            measure_radial=False,
            measure_neighbors=False,
            measure_convex=False,
            measure_radius=False,
        )
        t_min = timed(minimal)
        print(
            json.dumps(
                {
                    "config": "MINIMAL (objects+shape+intensity+corr+granularity)",
                    "s_per_site": round(t_min, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

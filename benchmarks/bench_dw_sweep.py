"""Block-size sweep for kernels/depthwise_pallas at EffNetV2-L shapes.

The first cut of the kernel ran (1, 30, 30, 384) blocks — 256 grid
steps whose ~20 us fixed overhead held it at 59-69 GB/s, no better than
XLA's in-model fused depthwise (~6.5 ms/call average from the embed
profile). This sweeps images-per-step (nb) x channels-per-step (cb) to
find the overhead/VMEM sweet spot. Run on the real TPU:

    python benchmarks/bench_dw_sweep.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SHAPES = [
    ("stage3 30x30x768 (x9)", 128, 30, 768),
    ("stage4 30x30x1344 (x18)", 128, 30, 1344),
    ("stage5/6 15x15x2304 (x31)", 128, 15, 2304),
]

# (variant, nb, cb): None = kernel default
COMBOS = [
    ("rows", 8, 256),
    ("rows", 8, 128),
    ("rows", 16, 256),
    ("rows", 32, 512),
    ("block", 4, 512),
]


def main():
    import jax
    import jax.numpy as jnp

    from saguaro_tpu.kernels.depthwise_pallas import dw3x3_silu

    for label, n, h, c in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.normal(size=(n, h, h, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, 1, c)).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
        roofline_ms = 2 * x.size * 2 / 819e9 * 1e3  # read+write bf16 @819GB/s
        for variant, nb, cb in COMBOS:
            name = f"{variant},nb={nb or 'auto'},cb={cb or 'C'}"
            f = jax.jit(
                lambda x, w, b: dw3x3_silu(x, w, b, nb=nb, cb=cb, variant=variant)
            )
            try:
                y, s = f(x, w, b)
                np.asarray(s)  # sync by fetch (relay under-reports b_u_r)
            except Exception as e:  # VMEM OOM etc — report and move on
                print(f"{label:26s} {name:16s} FAILED: {str(e)[:90]}", flush=True)
                continue
            # best-of-3 over 20-iter batches, synced by fetching the
            # small (N, C) mean; no jnp ops in the timed region
            iters, best = 20, float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    y, s = f(x, w, b)
                sh = np.asarray(s)
                best = min(best, (time.perf_counter() - t0) / iters * 1e3)
            chk = sh.sum()
            dt = best
            gbs = 2 * x.size * 2 / 1e9 / (dt / 1e3)
            print(
                f"{label:26s} {name:16s} {dt:8.3f} ms  {gbs:6.0f} GB/s"
                f"  (roofline {roofline_ms:.2f} ms) chk={chk:.1f}",
                flush=True,
            )


if __name__ == "__main__":
    main()

"""Microbench: depthwise 3x3 conv formulations at EffNetV2-L shapes.

The embed profile (BENCH.md r3 handoff) shows the depthwise+SE-mean
convolution fusions holding 3.85 s of the 8.7 s/batch embed device time
(44%) at ~10x off the HBM roofline — XLA:TPU's grouped-conv lowering is
the cost, not the arithmetic. This bench compares, per dominant shape:

  xla     lax.conv_general_dilated(feature_group_count=C) + bias + silu
          + f32 channel mean (what flax nn.Conv emits today)
  taps    the same math as 9 shifted multiply-adds on padded input
          (pure VPU elementwise; tests whether XLA alone fixes it)
  pallas  kernels/depthwise_pallas.dw3x3_silu (VMEM-resident)

Run on the real TPU: python benchmarks/bench_depthwise.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# (label, N, H, C): stride-1 depthwise shapes of EffNetV2-L at 480 input,
# chunk 128. Counts per chunk: stage3 x9, stage4 x1 + x18, stage5 x24,
# stage6 x7.
SHAPES = [
    ("stage3 30x30x768 (x9)", 128, 30, 768),
    ("stage4 30x30x1152 (x1)", 128, 30, 1152),
    ("stage4 30x30x1344 (x18)", 128, 30, 1344),
    ("stage5/6 15x15x2304 (x31)", 128, 15, 2304),
]


def main():
    import jax
    import jax.numpy as jnp

    from saguaro_tpu.kernels.depthwise_pallas import dw3x3_silu

    def xla_dw(x, w, b):
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(jnp.bfloat16),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1],
        )
        y = jax.nn.silu(y + b.astype(jnp.bfloat16)).astype(jnp.bfloat16)
        s = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
        return y, s

    def taps_dw(x, w, b):
        n, h, ww, c = x.shape
        xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((n, h, ww, c), jnp.float32)
        for dh in range(3):
            for dw_ in range(3):
                acc = acc + xp[:, dh : dh + h, dw_ : dw_ + ww, :] * w[dh, dw_, 0]
        y = acc.astype(jnp.bfloat16)
        y = jax.nn.silu(y + b.astype(jnp.bfloat16)).astype(jnp.bfloat16)
        s = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
        return y, s

    def pallas_dw(x, w, b):
        return dw3x3_silu(x, w, b)

    for label, n, h, c in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(n, h, h, c)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        w = jnp.asarray(rng.normal(size=(3, 3, 1, c)).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
        ref = None
        for name, fn in [("xla", xla_dw), ("taps", taps_dw), ("pallas", pallas_dw)]:
            f = jax.jit(fn)
            y, s = f(x, w, b)  # compile
            np.asarray(s)  # sync by fetch (relay under-reports b_u_r)
            # best-of-3 over 10-iter batches; sync by fetching the small
            # (N, C) mean — NO jnp ops in the timed region (a jnp.sum
            # checksum compiles on first evaluation inside the old loop)
            iters, best = 10, float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    y, s = f(x, w, b)
                sh = np.asarray(s)
                best = min(best, (time.perf_counter() - t0) / iters * 1e3)
            dt = best
            traffic = 2 * x.size * 2 / 1e9  # read+write bf16, GB
            if ref is None:
                ref = np.asarray(y, np.float32)
                err = 0.0
            else:
                err = float(np.max(np.abs(np.asarray(y, np.float32) - ref)))
            print(
                f"{label:28s} {name:7s} {dt:8.3f} ms  {traffic / (dt / 1e3):6.0f} GB/s"
                f"  maxerr={err:.2e} chk={sh.sum():.1f}",
                flush=True,
            )


if __name__ == "__main__":
    main()

"""Images-per-step (nb) sweep for kernels/mbconv_pallas at EffNetV2-L
stride-1 block shapes, vs the XLA per-op path per shape.

Per block the kernel's HBM floor is read x + write out (+ weights); the
XLA path makes ~6 passes over the expand-times-wider mid tensor. Run on
the real TPU:

    python benchmarks/bench_mbconv_sweep.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# (label, N, H, Cin, expand): EffNetV2-L stride-1 MBConv ops at chunk 128
SHAPES = [
    ("stage3 30x30 192x4 (x9)", 128, 30, 192, 4),
    ("stage4 30x30 224x6 (x18)", 128, 30, 224, 6),
    ("stage5 15x15 384x6 (x24)", 128, 15, 384, 6),
    ("stage6 15x15 640x6 (x6)", 128, 15, 640, 6),
]

NBS = [None, 2, 4, 8, 16]


def main():
    import jax
    import jax.numpy as jnp

    from saguaro_tpu.kernels.mbconv_pallas import mbconv_fused

    def xla_block(x, we, be, wd, bd, w1, b1, w2, b2, wp, bp):
        cmid = we.shape[-1]
        h = jax.lax.conv_general_dilated(
            x, we.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        h = jax.nn.silu(h + be.astype(jnp.bfloat16)).astype(jnp.bfloat16)
        h = jax.lax.conv_general_dilated(
            h, wd.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=cmid,
        )
        h = jax.nn.silu(h + bd.astype(jnp.bfloat16)).astype(jnp.bfloat16)
        s = jnp.mean(h.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = jax.nn.silu(
            jax.lax.conv_general_dilated(
                s, w1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            + b1
        )
        s = (
            jax.lax.conv_general_dilated(
                s, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            + b2
        )
        h = h * jax.nn.sigmoid(s).astype(h.dtype)
        h = jax.lax.conv_general_dilated(
            h, wp.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        h = (h + bp.astype(jnp.bfloat16)).astype(jnp.bfloat16)
        if x.shape[-1] == h.shape[-1]:
            h = h + x
        return h

    for label, n, hh, cin, expand in SHAPES:
        rng = np.random.default_rng(0)
        cmid = cin * expand
        cse = max(1, cin // 4)
        x = jnp.asarray(rng.normal(size=(n, hh, hh, cin)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        args = dict(
            we=jnp.asarray(rng.normal(size=(1, 1, cin, cmid)).astype(np.float32) * 0.1),
            be=jnp.asarray(rng.normal(size=(cmid,)).astype(np.float32) * 0.1),
            wd=jnp.asarray(rng.normal(size=(3, 3, 1, cmid)).astype(np.float32) * 0.2),
            bd=jnp.asarray(rng.normal(size=(cmid,)).astype(np.float32) * 0.1),
            w1=jnp.asarray(rng.normal(size=(1, 1, cmid, cse)).astype(np.float32) * 0.1),
            b1=jnp.asarray(rng.normal(size=(cse,)).astype(np.float32) * 0.1),
            w2=jnp.asarray(rng.normal(size=(1, 1, cse, cmid)).astype(np.float32) * 0.1),
            b2=jnp.asarray(rng.normal(size=(cmid,)).astype(np.float32) * 0.1),
            wp=jnp.asarray(rng.normal(size=(1, 1, cmid, cin)).astype(np.float32) * 0.1),
            bp=jnp.asarray(rng.normal(size=(cin,)).astype(np.float32) * 0.1),
        )
        floor_ms = 2 * x.size * 2 / 819e9 * 1e3  # read+write bf16 @819 GB/s
        ref = None
        cases = [("xla", None)] + [(f"fused nb={nb or 'auto'}", nb) for nb in NBS]
        for name, nb in cases:
            if name == "xla":
                f = jax.jit(lambda x, **kw: xla_block(x, **kw))
            else:
                f = jax.jit(lambda x, _nb=nb, **kw: mbconv_fused(x, **kw, nb=_nb))
            try:
                y = f(x, **args)
                np.asarray(y[:1, :1, :1, :8])
            except Exception as e:
                print(f"{label:26s} {name:14s} FAILED: {str(e)[:90]}", flush=True)
                continue
            iters, best = 10, float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    y = f(x, **args)
                chk = np.asarray(y[:1, :1, :1, :8])
                best = min(best, (time.perf_counter() - t0) / iters * 1e3)
            if ref is None:
                ref = np.asarray(y, np.float32)
                err = 0.0
            else:
                err = float(np.max(np.abs(np.asarray(y, np.float32) - ref)))
            print(
                f"{label:26s} {name:14s} {best:8.3f} ms (floor {floor_ms:.2f})"
                f"  maxerr={err:.2e}",
                flush=True,
            )
            jax.clear_caches()


if __name__ == "__main__":
    main()

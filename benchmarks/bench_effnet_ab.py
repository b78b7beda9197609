"""A/B the full EffNetV2-L forward: XLA grouped-conv dw vs taps dw.

The Pallas depthwise and whole-block MBConv arms were PRUNED in r5
(the integrated dw-Pallas model regressed embed 1.125 -> 2.81 s/site —
custom-call boundaries break XLA's layout/fusion choices around the
surrounding 1x1 convs; kernels in git history at tag pre-r5-prune). The surviving
question is XLA's grouped-conv lowering vs the pure-XLA 9-shifted-
multiply-add formulation (SAGUARO_DW_TAPS=1), which stays inside the
fusion domain. Times the whole folded-BN L forward at the production
chunk shape both ways.

    python benchmarks/bench_effnet_ab.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from saguaro_tpu.models.effnetv2 import (
        EFFNETV2_L,
        EffNetV2,
        fold_batchnorm,
        fold_rgb_stem,
        init_effnetv2,
    )

    _, variables = init_effnetv2(EFFNETV2_L, seed=0, init_size=32)
    folded = fold_rgb_stem(fold_batchnorm(variables))
    cfg = dataclasses.replace(EFFNETV2_L, fold_bn=True)
    model = EffNetV2(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(128, 480, 480, 1)).astype(np.float32)
    )

    ref = None
    for name, env in [
        ("xla", {}),  # pallas/mbconv arms pruned r5 (BENCH.md)
        ("taps", {"SAGUARO_DW_TAPS": "1"}),
    ]:
        for k in ("SAGUARO_DW_TAPS",):
            os.environ.pop(k, None)
        os.environ.update(env)
        f = jax.jit(lambda v, x: model.apply(v, x))
        t0 = time.perf_counter()
        np.asarray(f(folded, x))
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f} s", flush=True)
        # best-of-3 over 5-iter batches; sync by fetching the (128, 1280)
        # output (~650 KB, one relay round-trip) — NO jnp ops inside the
        # timed region (a jnp.sum checksum costs a compile on first pass)
        iters, best = 5, float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                y = f(folded, x)
            out = np.asarray(y, np.float32)
            best = min(best, (time.perf_counter() - t0) / iters * 1e3)
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(np.max(np.abs(out - ref)))
        print(
            f"effnetv2-l 128x480x480x1 {name:7s} {best:8.2f} ms/fwd"
            f"  maxerr={err:.2e} chk={out.sum():.1f}",
            flush=True,
        )
        jax.clear_caches()
    os.environ.pop("SAGUARO_DW_TAPS", None)


if __name__ == "__main__":
    main()

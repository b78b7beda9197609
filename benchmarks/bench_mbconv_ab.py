"""A/B one full MBConv block: XLA grouped-conv dw vs the Pallas dw kernel.

The integrated bench regressed embed 1.125 -> 2.81 s/site with the
Pallas depthwise in the model — ~23 ms per call of overhead that the
kernel's standalone time (4-9 ms vs XLA's in-model ~6.5 ms avg) cannot
explain. This isolates the integration cost: one stage-4 MBConv
(expand 1x1 -> dw 3x3 -> SE -> project 1x1, folded BN) timed both ways
on the real TPU.

    python benchmarks/bench_mbconv_ab.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    from saguaro_tpu.models.effnetv2 import (
        EffNetV2Config,
        EffNetV2,
        StageSpec,
        fold_batchnorm,
        init_effnetv2,
    )

    # one stage-4 block at the production shape: 224 in, expand 6 -> 1344
    cfg = EffNetV2Config(
        stem_filters=8,  # unused below; we call the block directly
        stages=(StageSpec("mbconv", 6, 3, 1, 224, 1, 0.25),),
        input_size=30,
        compute_dtype="bfloat16",
    )
    from saguaro_tpu.models.effnetv2 import _MBConv

    spec = cfg.stages[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(128, 30, 30, 224)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    block = _MBConv(spec, 1, jnp.bfloat16, fold_bn=False)
    variables = block.init(jax.random.PRNGKey(0), x)
    folded = fold_batchnorm(variables)
    fblock = _MBConv(spec, 1, jnp.bfloat16, fold_bn=True)

    ref = None
    for name, env in [
        ("xla", {}),
        ("mbconv", {"SAGUARO_MBCONV_PALLAS": "1"}),
        ("dw-pallas", {"SAGUARO_DW_PALLAS": "1"}),
    ]:
        for k in ("SAGUARO_DW_PALLAS", "SAGUARO_MBCONV_PALLAS"):
            os.environ.pop(k, None)
        os.environ.update(env)
        f = jax.jit(lambda v, x: fblock.apply(v, x))
        np.asarray(f(folded, x))  # compile + first (sync by fetch)
        # best-of-3 over 20-iter batches; sync by fetching the block
        # output — NO jnp ops inside the timed region (a jnp.sum
        # checksum costs a compile on its first evaluation, which the
        # first cut of this bench timed: "xla 1930 ms" was that compile)
        iters, best = 20, float("inf")
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
        print(f"mbconv s4 128x30x30x224 {name:9s} {best:8.3f} ms  maxerr={err:.2e} chk={out.sum():.1f}",
              flush=True)
        jax.clear_caches()
    for k in ("SAGUARO_DW_PALLAS", "SAGUARO_MBCONV_PALLAS"):
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()

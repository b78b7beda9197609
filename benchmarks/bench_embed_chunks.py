"""EfficientNetV2-L embedding chunk-size sweep: crops/sec vs embed_chunk
at the production shapes (200 px crops -> 480 px inputs, bf16).

The reference batches up to 1000 crops with OOM-halving
(Cellpose_GPU_s3fs.py:31,196-202); our static chunk is a compile-time
choice — this sweep picks it empirically per hardware.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp

    from saguaro_tpu.models.effnetv2 import EFFNETV2_L, init_effnetv2, preprocess_crops

    model, variables = init_effnetv2(EFFNETV2_L, seed=0)
    rng = np.random.default_rng(0)

    @jax.jit
    def embed(v, c):
        return model.apply(v, preprocess_crops(c, 480))

    for chunk in (int(a) for a in (sys.argv[1:] or ["64", "128", "256"])):
        crops = jnp.asarray(
            rng.integers(0, 4095, (chunk, 200, 200)).astype(np.float32)
        )
        np.asarray(embed(variables, crops))  # compile + warm
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            np.asarray(embed(variables, crops))
        dt = (time.perf_counter() - t0) / iters
        print(
            json.dumps(
                {"chunk": chunk, "crops_per_sec": round(chunk / dt, 1),
                 "ms_per_chunk": round(dt * 1000, 1)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

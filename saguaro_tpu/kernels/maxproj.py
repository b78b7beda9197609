"""Z-stack maximum-intensity projection.

Reference behavior: ``np.maximum.reduce`` over the plane images of one
channel group, after asserting equal shapes (MaxProjection.py:33-52). Here
the projection is a jitted XLA reduction over a static ``(planes, H, W)``
stack, and the batched form reduces whole ``(batch, planes, H, W)`` blocks
so an entire plate's worth of groups runs as one device program. The
elementwise max is VPU work that XLA fuses with any surrounding ops (e.g.
the re-binning matmuls), so a dedicated Pallas kernel adds nothing here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["max_project", "max_project_batch"]


@jax.jit
def max_project(stack: jax.Array) -> jax.Array:
    """(planes, H, W) -> (H, W) max-intensity projection."""
    return jnp.max(stack, axis=0)


@jax.jit
def max_project_batch(stacks: jax.Array) -> jax.Array:
    """(batch, planes, H, W) -> (batch, H, W); one fused reduction."""
    return jnp.max(stacks, axis=1)

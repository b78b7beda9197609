"""Double-sigmoid squash of robustized z-scores.

Reference: ``(x/alpha)^k / sqrt(1 + (x/alpha)^(2k))`` with k=3,
alpha=2.3538 (Pycyto_pertime.py:13-16, Feature_select_cosine_ami.py:22-27),
applied feature-wise then ``abs()``'d. Soft-clips to (-1, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["double_sigmoid", "DEFAULT_K", "DEFAULT_ALPHA"]

DEFAULT_K = 3
DEFAULT_ALPHA = 2.3538


@jax.jit
def double_sigmoid(x: jax.Array, k: int = DEFAULT_K, alpha: float = DEFAULT_ALPHA) -> jax.Array:
    x = jnp.asarray(x, jnp.float32) / alpha
    xk = x ** k
    return xk / jnp.sqrt(1.0 + xk * xk)

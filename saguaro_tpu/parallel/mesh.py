"""Device mesh + sharding helpers.

The reference's only parallelism is process pools and an EC2 fleet
(SURVEY.md §2.3); the TPU-native replacement is a single controller over a
``jax.sharding.Mesh``:

* the site/field batch axis is sharded over the ``data`` mesh axis
  (embarrassingly parallel — no collectives in the forward paths);
* model parameters are replicated by default, or FSDP-sharded over the
  ``model`` axis for training (XLA inserts the all-gathers/reduce-scatters
  over ICI);
* multi-host scaling composes the same shardings over a DCN-connected
  mesh via ``jax.distributed``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "default_mesh",
    "batch_sharding",
    "shard_batch",
    "replicate",
    "fsdp_param_sharding",
]


def make_mesh(
    n_devices: int | None = None,
    data: int | None = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the first n_devices devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.array(devices[:n])
    data = data or (n // model)
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), axis_names=("data", "model"))


def default_mesh(n_devices: int | None = None) -> Mesh | None:
    """Production default: a data-parallel mesh over all visible devices,
    or ``None`` on a single device.

    The reference wires its multi-device placement into the entry point
    (one consumer process per GPU via CUDA_VISIBLE_DEVICES round-robin,
    Cellpose_GPU_s3fs.py:288-296); the TPU-native equivalent is one
    controller sharding site batches over every chip of the slice, so a
    v5e-8 run uses 8 chips without any flag. ``n_devices`` (e.g. a CLI
    ``--devices``) overrides the auto count; 1 forces single-device.
    """
    n = n_devices if n_devices is not None else len(jax.devices())
    if n <= 1:
        return None
    return make_mesh(n)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(x, mesh: Mesh):
    """Place an array with its leading axis split across the data axis."""
    x = jnp.asarray(x)
    return jax.device_put(x, batch_sharding(mesh, x.ndim))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. model params) across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def fsdp_param_sharding(tree, mesh: Mesh, min_size: int = 2**16):
    """FSDP-style sharding: large parameters split over the 'model' axis on
    their largest divisible dimension; small ones replicated."""
    model_size = mesh.shape["model"]

    def spec_for(x):
        if model_size == 1 or x.ndim == 0 or x.size < min_size:
            return NamedSharding(mesh, P())
        dims = list(x.shape)
        order = sorted(range(len(dims)), key=lambda i: -dims[i])
        for i in order:
            if dims[i] % model_size == 0:
                spec = [None] * len(dims)
                spec[i] = "model"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(lambda x: jax.device_put(x, spec_for(x)), tree)

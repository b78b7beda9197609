"""Test configuration: force an 8-device CPU mesh before any JAX use.

SURVEY.md §4: the reference has no tests; our strategy is numpy-oracle
golden tests plus multi-device tests on a virtual CPU mesh (the driver
validates the real multi-chip path separately via __graft_entry__).

NOTE: this environment's sitecustomize registers an 'axon' TPU plugin and
force-sets jax_platforms at interpreter start, so the JAX_PLATFORMS env var
alone is NOT enough — we must re-update the config after importing jax
(backends initialize lazily, so this wins as long as it runs before the
first computation).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# A cache of OUR OWN, never shared with TPU/relay runs: the axon
# remote-compile relay deposits XLA:CPU AOT artifacts compiled on the
# REMOTE machine into its dir, and loading those in-process can SIGABRT
# (cpu_aot_loader "machine type ... doesn't match").
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu_tests"
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

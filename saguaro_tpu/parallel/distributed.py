"""Multi-host scaling: jax.distributed init + deterministic job partitioning.

The reference scales across machines with an EC2 fleet driven over SSM,
with S3 as the data plane (Feature_extraction_opt.py:73-145; SURVEY.md
§2.3). The TPU-native equivalent is a multi-host JAX slice: every host
runs the same driver, ``jax.distributed.initialize`` wires the DCN mesh,
and the embarrassingly-parallel job grid (plates x timepoints, or site
shards) is partitioned deterministically by process index — the object
store stays the data plane, no SSM control plane needed.
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger("saguaro_tpu.distributed")

__all__ = ["maybe_initialize", "partition_jobs", "process_info"]


def maybe_initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed when multi-host env/args are present.

    No-op for single-host runs (the common case on one chip/slice); on a
    multi-host slice with TPU metadata the arguments auto-populate.

    NOTE: this must run before ANY backend-initializing JAX call —
    including jax.process_count()/jax.devices() — so the already-initialized
    case is detected by catching initialize()'s own error, not by probing.
    """
    if coordinator_address is None and num_processes is None:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        msg = str(e).lower()
        if "already" in msg or "initialise" in msg or "initialize" in msg:
            logger.warning("jax.distributed.initialize skipped: %s", e)
            return
        raise
    logger.info(
        "jax.distributed: process %d/%d, %d local devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
    )


def process_info() -> tuple[int, int]:
    return jax.process_index(), jax.process_count()


def partition_jobs(jobs: list, process_id: int | None = None, num_processes: int | None = None) -> list:
    """Deterministic strided partition of a job list across hosts.

    Every host computes the same global order and takes jobs where
    ``index % num_processes == process_id`` — no coordination, idempotent
    with manifest-based resume.
    """
    if process_id is None:
        process_id = jax.process_index()
    if num_processes is None:
        num_processes = jax.process_count()
    return [j for i, j in enumerate(jobs) if i % num_processes == process_id]

"""Mesh construction + multi-host initialization.

TPU-native replacement for the reference's (nonexistent) distribution layer:
``jax.distributed.initialize`` + XLA collectives over ICI/DCN instead of
NCCL/MPI (SURVEY.md §2.3 "Distributed comm backend" row).
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger(__name__)

DATA_AXIS = "data"


_distributed_initialized = False


def distributed_init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX. No-ops cleanly for single-process runs.

    On real TPU pods the three arguments are auto-detected from the TPU
    metadata environment; pass them explicitly for CPU/GPU fleets.

    The multi-host decision is made from env vars WITHOUT touching any jax
    query first: jax.process_count()/jax.devices() initialize the XLA
    backends, after which jax.distributed.initialize() refuses to run
    (its backends_are_initialized() guard) — probing jax here would make
    every real multi-host launch crash at startup.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return
    explicit = coordinator_address is not None
    auto = (
        os.environ.get("COORDINATOR_ADDRESS") is not None
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") is not None
    )
    if explicit or auto:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _distributed_initialized = True
        log.info(
            "jax.distributed initialized: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )


def data_mesh(n_devices: int | None = None, local: bool = False) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices.

    local=True uses only this process's devices. The streaming CLI MUST use
    a local mesh: per-host file shards produce different batch counts per
    host, so any cross-host collective inside the per-batch step would
    deadlock the lockstep pjit semantics. Global-CMVN moments therefore
    reduce across chips *within* a host per batch (psum over the local
    mesh) and across hosts via the per-host moment checkpoints merged by
    `apply-cmvn` — one deterministic merge instead of a per-batch DCN
    collective. Use the global mesh (local=False) only for lockstep
    workloads where every process executes identical steps.
    """
    devices = jax.local_devices() if local else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for [B, ...] arrays: batch split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_to_shards(n: int, mesh: Mesh) -> int:
    """Smallest batch size >= n divisible by the data-axis size."""
    d = mesh.shape[DATA_AXIS]
    return ((n + d - 1) // d) * d

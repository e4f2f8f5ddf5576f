"""Multi-host initialisation and host-side coordination.

The reference's NCCL/mp.spawn bootstrap (reference utils/Manager.py:154-180,
twotower.py:65-71) becomes `jax.distributed.initialize`: one process per
host, all chips of the slice visible to the mesh, collectives over
ICI/DCN. Host-side coordination (the reference's dist.barrier /
all_gather_object) maps to multihost_utils.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from ..utils.logging import get_logger

logger = get_logger("distributed")


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialise the JAX distributed runtime when running multi-process.

    No-ops in single-process mode (the common single-host case) and when
    already initialised. Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), which
    cluster launchers set.
    """
    num = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        logger.info("distributed: process %d/%d, %d local / %d global devices",
                    jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
    except RuntimeError as e:  # already initialised
        logger.info("distributed init skipped: %s", e)


def host_barrier(name: str = "barrier") -> None:
    """Cross-host sync point (the reference's dist.barrier,
    utils/MIND.py:66-67)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)

"""Device mesh construction and sharding specs.

The TPU-native replacement for the reference's NCCL/DDP data parallelism
(reference utils/Manager.py:154-180, twotower.py:49-50, 65-71): instead of
one process per GPU with gradient all-reduce, a single program lays the
batch across a `jax.sharding.Mesh` axis ('data') and jits the train step —
XLA inserts the gradient psum over ICI automatically because parameters are
replicated while inputs are batch-sharded. A second mesh axis ('model')
carries row-sharded embedding tables (parallel/sharded_embedding.py).

Works identically on one real chip, N virtual CPU devices
(xla_force_host_platform_device_count), or a real multi-host slice
(jax.distributed.initialize + per-process data sharding).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Tuple[int, ...] = (),
              axis_names: Tuple[str, ...] = ("data",),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh. Empty shape = all devices along the first axis.

    With two axes ('data', 'model') the last axis size is model_parallel
    and 'data' absorbs the rest.
    """
    devices = list(devices if devices is not None else jax.devices())
    if not mesh_shape:
        mesh_shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(mesh_shape))
    if n != len(devices):
        # allow using a subset (e.g. 4 of 8 virtual devices in tests)
        devices = devices[:n]
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def mesh_from_config(cfg) -> Mesh:
    """Mesh from a Config: an explicit --mesh-shape/--mesh-axes wins;
    otherwise --model-parallel M builds (n_devices//M, M) over
    ('data', 'model'); default is all devices on one 'data' axis."""
    if cfg.mesh_shape:
        return make_mesh(tuple(cfg.mesh_shape), tuple(cfg.mesh_axes))
    mp = max(int(getattr(cfg, "model_parallel", 1) or 1), 1)
    if mp > 1:
        n = len(jax.devices())
        assert n % mp == 0, (
            f"model_parallel={mp} must divide device count {n}")
        return make_mesh((n // mp, mp), ("data", "model"))
    return make_mesh((), tuple(cfg.mesh_axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh,
                axis: str = "data") -> Dict[str, jax.Array]:
    """Device-put a host batch with the leading dim sharded over `axis`.

    In multi-process mode each process holds its own shard of the global
    batch; `jax.make_array_from_process_local_data` assembles the global
    array (the reference's DistributedSampler split, utils/Manager.py:212,
    becomes loader-side sharding + this assembly).
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sharding, v)
                for k, v in batch.items()}
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}

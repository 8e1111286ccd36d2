"""Device mesh + sharding helpers (the framework's distributed backbone).

The reference has NO distributed execution (SURVEY.md §2.8); this module is
the TPU-native scaling layer it lacks:

- ``get_mesh()``: a cached 1-D "data" mesh over all local devices (DP over
  frames/batch — the primary scaling axis for both synthesis and training);
  ``make_mesh(shape, names)`` for richer tp/sp layouts.
- ``shard_batch``: places a batch array with its leading axis split across
  the data axis (XLA then partitions the whole program; collectives ride
  ICI automatically under pjit).
- ``replicate``: broadcast parameters to every device.

Multi-host: call ``jax.distributed.initialize()`` before ``get_mesh`` and the
same code spans hosts (DCN between pods, ICI within).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_warned_indivisible = False


@lru_cache(maxsize=None)
def get_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def make_mesh(shape: tuple[int, ...], names: tuple[str, ...]) -> Mesh:
    devices = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devices, axis_names=names)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(x: jax.Array, mesh: Mesh | None = None) -> jax.Array:
    """Shard the leading axis across the data axis (pads are caller's job;
    the leading dim must divide the mesh size).

    On a single-device mesh this is an identity: sharding annotations add
    nothing on one chip, but they route jit through the GSPMD partitioner,
    whose compiles are far slower on remote-compile runtimes (a T=192
    train step went 18 s unsharded vs minutes annotated)."""
    mesh = mesh or get_mesh()
    if mesh.devices.size == 1:
        return x
    if x.shape[0] % mesh.devices.size != 0:
        # fall back to replication rather than erroring mid-render — but say
        # so ONCE: silently losing data parallelism is an N-chip perf cliff
        # that reads as "TPUs are slow"
        global _warned_indivisible
        if not _warned_indivisible:
            _warned_indivisible = True
            import warnings

            warnings.warn(
                f"shard_batch: leading dim {x.shape[0]} not divisible by mesh size "
                f"{mesh.devices.size}; batch REPLICATED (no data parallelism). "
                f"Pad the batch to a multiple of the mesh for full throughput.",
                stacklevel=2)
        return x
    return jax.device_put(x, data_sharding(mesh, x.ndim))


def replicate(tree, mesh: Mesh | None = None):
    mesh = mesh or get_mesh()
    if mesh.devices.size == 1:  # see shard_batch
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)

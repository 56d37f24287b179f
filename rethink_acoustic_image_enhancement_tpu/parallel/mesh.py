"""Device mesh + sharding helpers.

The reference's only parallelism is DDP data parallelism over NCCL
(SURVEY.md §2.11, base_model.py:76-82). TPU-natively that becomes: a
``Mesh`` with a ``data`` axis, batches sharded along it, parameters
replicated, and XLA inserting the gradient all-reduce over ICI when the
jitted train step consumes sharded inputs (no explicit psum needed under
jit-with-shardings; shard_map paths use psum explicitly).

A second optional ``spatial`` axis shards image H across devices for very
large sonar frames — XLA's SPMD partitioner inserts halo exchanges for the
3x3 convs automatically, which is the CP analog discussed in SURVEY.md §5.7.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(n_data: int | None = None, n_spatial: int = 1,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a (data[, spatial]) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    need = n_data * n_spatial
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_spatial} needs {need} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_data, n_spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, spatial_axis: int | None = None) -> NamedSharding:
    """NHWC batch: shard N over 'data' (and optionally H over 'spatial')."""
    spec = [DATA_AXIS, None, None, None]
    if spatial_axis is not None:
        spec[spatial_axis] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(mesh: Mesh, batch, spatial: bool = False):
    """Place a host pytree of numpy arrays onto the mesh, batch-dim sharded.
    Scalars/1-D arrays are replicated."""
    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % mesh.shape[DATA_AXIS] == 0:
            spec = [DATA_AXIS] + [None] * (x.ndim - 1)
            if spatial and x.ndim >= 3:
                spec[1] = SPATIAL_AXIS
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(put, batch)


def process_shard(items: Sequence, process_index: int | None = None,
                  process_count: int | None = None) -> list:
    """Rank-strided host-side dataset sharding — the EnlargedSampler
    equivalent (data_sampler.py:40) for multi-process TPU jobs."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items)[pi::pc]

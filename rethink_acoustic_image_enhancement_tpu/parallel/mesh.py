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
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_spatial: int = 1,
              n_model: int = 1,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a (data[, spatial][, model]) mesh over the available devices.

    The ``model`` axis is tensor parallelism: parameters (conv output
    channels, GDFN hidden channels, attention heads) shard across it —
    see ``model_param_specs`` — and XLA's SPMD partitioner inserts the
    channel all-gathers/reduce-scatters. Axes of size 1 are free."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_spatial * n_model)
    need = n_data * n_spatial * n_model
    if need > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_spatial}x{n_model} needs {need} devices, "
            f"have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_data, n_spatial, n_model)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS, MODEL_AXIS))


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


def model_param_specs(mesh: Mesh, params) -> dict:
    """Tensor-parallel parameter shardings for the conv-attention models.

    Megatron-style channel sharding expressed as param placements only:
    conv kernels (HWIO) shard their output-channel axis over 'model',
    per-channel vectors (biases, LN scales) shard their only axis when
    divisible; everything else (attention temperatures, anything
    indivisible) replicates. Activations are left unconstrained — XLA's
    SPMD partitioner propagates the shardings through each block (the
    GDFN hidden channels and the per-head attention Grams partition
    cleanly; LayerNorms gather the full channel axis) and inserts the
    collectives. Semantics-preserving for ANY rule choice; this rule is
    the HBM-traffic-minimizing one for the interior of each block.

    KNOWN PARTITIONER DEFECT (measured 2026-08-18, jax 0.8): combining
    these kernel shardings with spatially-sharded (halo-exchanged)
    inputs mis-partitions the convs — max|diff| 22 on a [0,1] image,
    while either axis alone is exact to 1e-5 (tests/test_parallel.py).
    Keep 'model' and 'spatial' mesh axes mutually exclusive per program;
    TeacherPredictor enforces this.

    SECOND DEFECT, TRAINING ONLY (measured 2026-08-18, jax 0.9): on any
    mesh with a 'model' axis, grouped-conv (depthwise) KERNEL GRADIENTS
    silently come out n_model-times too large for a strategy-dependent
    subset of the depthwise convs (under these specs: the replicated
    indivisible-width GDFN dwconvs; under alternate spec rules, even
    divisible sharded ones). Forward is exact; only the backward
    mis-reduces. Training over 'model' therefore requires the shift-add
    depthwise form (models/blocks.py DepthwiseConv3x3 via the models'
    ``dwconv_shift`` flag — identical param tree, elementwise ops whose
    grads partition exactly); train.model_shard wires this automatically
    and tests/test_parallel.py guards it."""
    n_model = int(mesh.shape[MODEL_AXIS])

    def spec(path, x) -> NamedSharding:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel" and x.ndim == 4 and x.shape[-1] % n_model == 0:
            return NamedSharding(mesh, P(None, None, None, MODEL_AXIS))
        if x.ndim == 1 and x.shape[0] % n_model == 0 and x.shape[0] > 1:
            return NamedSharding(mesh, P(MODEL_AXIS))
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(spec, params)


def process_shard(items: Sequence, process_index: int | None = None,
                  process_count: int | None = None) -> list:
    """Rank-strided host-side dataset sharding — the EnlargedSampler
    equivalent (data_sampler.py:40) for multi-process TPU jobs."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(items)[pi::pc]

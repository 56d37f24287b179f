"""Parallelism: mesh construction, shardings, multi-process init.

The reference's NCCL/DDP stack (dist_util.py:10-83) maps to
``jax.distributed.initialize()`` + mesh shardings; XLA's collectives ride
ICI within a pod and DCN across pods, no NCCL involved.
"""

from __future__ import annotations

from .mesh import (  # noqa: F401
    DATA_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    make_mesh,
    process_shard,
    replicated,
    shard_batch_pytree,
)


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host init (the init_dist('pytorch'/'slurm') equivalent,
    dist_util.py:10-58). No-op for single-process runs; reads cluster env
    (TPU pod metadata / SLURM) when args are omitted."""
    import jax

    if num_processes == 1:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        # single-process / already initialized
        pass


def is_master() -> bool:
    """The @master_only predicate (dist_util.py:75-83)."""
    import jax

    return jax.process_index() == 0
"""Parallelism: mesh construction, shardings, multi-process init.

The reference's NCCL/DDP stack (dist_util.py:10-83) maps to
``jax.distributed.initialize()`` + mesh shardings; XLA's collectives ride
ICI within a pod and DCN across pods, no NCCL involved.
"""

from __future__ import annotations

from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    make_mesh,
    model_param_specs,
    process_shard,
    replicated,
    shard_batch_pytree,
)


def detect_launch_env() -> dict:
    """Cluster-launcher autodetection (the init_dist('pytorch'/'slurm')
    env handshake, dist_util.py:21-58):

      * torchrun-style env: RANK / WORLD_SIZE / MASTER_ADDR / MASTER_PORT
        (_init_dist_pytorch, dist_util.py:21-25)
      * SLURM: SLURM_PROCID / SLURM_NTASKS with the coordinator from
        MASTER_ADDR (or the first host in SLURM_STEP_NODELIST when it is a
        plain hostname — no scontrol dependency; _init_dist_slurm,
        dist_util.py:28-58)

    Returns kwargs for ``jax.distributed.initialize`` (empty dict when no
    launcher env is present — TPU pod metadata autodetection then applies).
    """
    import os

    env = os.environ
    if "RANK" in env and "WORLD_SIZE" in env:
        addr = env.get("MASTER_ADDR", "127.0.0.1")
        port = env.get("MASTER_PORT", "29500")
        return {"coordinator_address": f"{addr}:{port}",
                "num_processes": int(env["WORLD_SIZE"]),
                "process_id": int(env["RANK"])}
    if "SLURM_PROCID" in env and "SLURM_NTASKS" in env:
        addr = env.get("MASTER_ADDR")
        if addr is None:
            nodelist = env.get("SLURM_STEP_NODELIST", "")
            # plain single hostname only; bracketed ranges need scontrol,
            # which we don't shell out to — set MASTER_ADDR instead
            addr = nodelist if nodelist and "[" not in nodelist else None
        if addr is not None:
            port = env.get("MASTER_PORT", "29500")
            return {"coordinator_address": f"{addr}:{port}",
                    "num_processes": int(env["SLURM_NTASKS"]),
                    "process_id": int(env["SLURM_PROCID"])}
    return {}


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     **initialize_kwargs) -> bool:
    """Multi-host init (the init_dist('pytorch'/'slurm') equivalent,
    dist_util.py:10-58). Explicit args win; otherwise torchrun/SLURM env
    is autodetected; otherwise TPU-pod metadata (initialize() with no
    args). Call BEFORE any device use. Returns True when a multi-process
    runtime was initialized. Single-process runs (num_processes == 1 or
    no launcher context at all) are a no-op."""
    import jax

    if num_processes == 1:
        return False
    kwargs = {}
    if coordinator_address or num_processes or process_id is not None:
        kwargs = {"coordinator_address": coordinator_address,
                  "num_processes": num_processes,
                  "process_id": process_id}
    else:
        kwargs = detect_launch_env()
        if not kwargs:
            # no launcher env: try TPU-pod metadata, quietly stay
            # single-process everywhere else
            try:
                jax.distributed.initialize(**initialize_kwargs)
                return jax.process_count() > 1
            except Exception:
                return False
    jax.distributed.initialize(**kwargs, **initialize_kwargs)
    return True


def is_master() -> bool:
    """The @master_only predicate (dist_util.py:75-83)."""
    import jax

    return jax.process_index() == 0
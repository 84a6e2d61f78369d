"""Multi-host (multi-process) initialization and per-host data sharding.

Single-slice multi-chip parallelism needs no process coordination (the
mesh in mesh.py covers it); scaling across hosts/slices uses JAX's
distributed runtime: every host runs the same program, calls
`initialize()` once, and builds meshes over `jax.devices()` (global).
Collectives ride ICI within a slice and DCN across slices — still no
hand-written transport.

Deployment recipe (exercised by tests/test_distributed.py with two CPU
processes):

    from vocal_remover_tpu.parallel import distributed, mesh as mesh_lib
    distributed.initialize()                  # env-driven on TPU VMs
    mesh = mesh_lib.make_mesh()               # global devices
    trainer = Trainer(..., mesh=mesh)
    train_files = distributed.shard_filelist(train_files)  # disjoint work
    loader = Loader(dataset, ..., seed=distributed.host_seed(seed))
"""

from __future__ import annotations

import logging

import jax

logger = logging.getLogger(__name__)


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """Initialize jax.distributed when running multi-process.

    With no arguments, relies on the TPU VM runtime's auto-detection;
    if that fails (the common single-host case) the failure is logged
    at DEBUG and the process continues single-process. With explicit
    arguments, failures PROPAGATE — a misconfigured multi-process
    launch must never silently degrade to N independent trainers.
    """
    if num_processes is None and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except Exception as e:
            logger.debug("jax.distributed auto-init unavailable "
                         "(single-process): %s", e)
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info():
    """(process_index, process_count) — (0, 1) on a single host."""
    return jax.process_index(), jax.process_count()


def shard_filelist(filelist):
    """Disjoint per-host work: host i takes filelist[i::process_count].

    Stride sharding keeps the per-host share balanced for sorted lists;
    every host must call this with the SAME input list (the usual SPMD
    contract). Returns the full list on a single host.
    """
    idx, count = process_info()
    if count == 1:
        return list(filelist)
    shard = list(filelist[idx::count])
    if not shard:
        raise ValueError(
            f"host {idx}/{count} received no files "
            f"({len(filelist)} total) — need >= one file per host"
        )
    return shard


def host_seed(seed: int) -> int:
    """Decorrelate host-side augmentation RNG streams across hosts."""
    idx, _ = process_info()
    return seed * 1_000_003 + idx


def host_shard_kwargs(seed: int = 0):
    """Loader kwargs for multi-host runs: a per-host shuffle seed.
    Use `shard_filelist` for the actual disjoint data split — a seed
    alone decorrelates sampling but does NOT partition work."""
    idx, count = process_info()
    return {"seed": host_seed(seed)} if count > 1 else {}

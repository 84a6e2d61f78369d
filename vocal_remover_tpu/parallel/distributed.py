"""Multi-host (multi-process) initialization and per-host data sharding.

Single-slice multi-chip parallelism needs no process coordination (the
mesh in mesh.py covers it); scaling across hosts/slices uses JAX's
distributed runtime: every host runs the same program, calls
`initialize()` once, and builds meshes over `jax.devices()` (global).
Collectives ride ICI within a slice and DCN across slices — still no
hand-written transport.

This module is exercised on single-host CI (where it is a no-op); the
multi-host paths follow the standard jax.distributed contract and are
documented here as the supported deployment recipe:

    # on every host (env vars set by the TPU VM runtime):
    from vocal_remover_tpu.parallel import distributed
    distributed.initialize()               # no-op on a single host
    mesh = mesh_lib.make_mesh()            # global devices
    trainer = Trainer(..., mesh=mesh)
    loader = Loader(dataset, ...,
                    **distributed.host_shard_kwargs())  # per-host data
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """Initialize jax.distributed when running multi-process; a no-op
    for single-process runs (the common single-host case)."""
    if num_processes is None and coordinator_address is None:
        # rely on TPU VM auto-detection when available; single-process
        # otherwise
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_info():
    """(process_index, process_count) — (0, 1) on a single host."""
    return jax.process_index(), jax.process_count()


def host_shard_kwargs():
    """Loader kwargs that give each host a disjoint sample shard: seed
    offset by process index and stride-sharded sampling are emulated by
    per-host seeds (each host draws different random crops; for
    map-style determinism pass an explicit filelist split instead)."""
    idx, count = process_info()
    return {"seed": idx} if count > 1 else {}

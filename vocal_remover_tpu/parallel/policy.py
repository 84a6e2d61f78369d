"""Parameter partitioning policy: tensor (model) parallelism rules.

The reference is single-device (SURVEY.md §2.6); tensor parallelism here
is a first-class sharding policy mapping every leaf of the variables /
gradient / optimizer pytrees to a `PartitionSpec` over the (data, model)
mesh of `parallel.mesh`:

  * conv HWIO kernels — output-channel axis sharded over `model`. Each
    output channel is computed wholly on one device (the contraction is
    over kh/kw/input-channels, all local), so conv TP introduces *no*
    reduction-order change vs single-device; XLA/GSPMD inserts the
    all-gathers where a consumer needs full channels.
  * the BN vectors (scale/bias/mean/var) that sit beside a sharded conv
    — same channel axis over `model` (batch-stat reduction is per
    channel, still device-local).
  * everything else (LSTM, dense head, biases of non-divisible layers)
    — replicated. These hold <2% of CascadedNet's parameters.

Because Adam's mu/nu (and the grad-accumulation buffer) mirror the
params pytree with the same dict paths, one path-based rule shards
params, optimizer state, and gradient buffers consistently.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vocal_remover_tpu.parallel.mesh import MODEL_AXIS

__all__ = ["tp_partition_spec", "shard_variables"]


def _path_keys(path):
    return [p.key if hasattr(p, "key") else getattr(p, "idx", p)
            for p in path]


def tp_partition_spec(path, leaf, n_model: int) -> P:
    """PartitionSpec for one pytree leaf under tensor parallelism.

    Divisibility guard: a dimension is sharded only when it divides by
    `n_model` with at least 2 rows per shard; everything else stays
    replicated (correct, just not distributed).
    """
    ndim = getattr(leaf, "ndim", 0)
    shape = getattr(leaf, "shape", ())
    keys = _path_keys(path)
    last = keys[-1] if keys else None

    def divisible(n):
        return n % n_model == 0 and n >= 2 * n_model

    if last == "conv" and ndim == 4 and divisible(shape[-1]):
        return P(None, None, None, MODEL_AXIS)
    if (
        len(keys) >= 2
        and keys[-2] == "bn"
        and last in ("scale", "bias", "mean", "var")
        and ndim == 1
        and divisible(shape[0])
    ):
        return P(MODEL_AXIS)
    return P()


def shard_variables(mesh: Mesh, tree):
    """device_put every leaf of a params/stats/grads/optimizer pytree
    according to the TP policy. With no `model` axis (or size 1) this
    degenerates to full replication — the data-parallel layout."""
    n_model = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
        MODEL_AXIS, 1
    )

    def put(path, leaf):
        spec = tp_partition_spec(path, leaf, n_model) if n_model > 1 else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, tree)

"""Device mesh construction and sharding policies.

The reference is single-device (SURVEY.md §2.6: no torch.distributed /
NCCL anywhere); this framework's distributed backend is JAX-native:
meshes over ICI, `NamedSharding` annotations, and XLA-inserted
collectives (psum for gradients, all-gather for replicated reads) — no
hand-written transport.

Axes:
  data  — batch / patch axis (data parallelism; the north-star config)
  model — reserved for channel/tensor sharding of large variants
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build an (data, model) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"requested {n_data}x{n_model} mesh but only {len(devices)} devices"
    )
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """First-dim (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host batches with the batch axis sharded over `data`.
    Accepts pytrees (e.g. int8-staged {"q": ..., "scale": ...} batches);
    scalar leaves are replicated, array leaves batch-sharded."""
    s = batch_sharding(mesh)
    r = replicated(mesh)

    def put(a):
        return jax.device_put(a, s if np.ndim(a) > 0 else r)

    out = tuple(jax.tree_util.tree_map(put, a) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params / optimizer state) on the mesh."""
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)

"""Full training-state checkpointing (atomic, resumable).

Goes beyond the reference, which saves only `model.state_dict()` on new
best val loss (reference train.py:286-290) and can merely warm-start
weights via --pretrained_model (train.py:209-210, losing optimizer/
scheduler/epoch state). Here the whole training state — variables,
optimizer state, plateau-scheduler counters, epoch, best loss, RNG
counter — round-trips through one msgpack file (flax.serialization),
written atomically.
"""

from __future__ import annotations

import json
import os
import tempfile

import jax
import numpy as np
from flax import serialization

from vocal_remover_tpu.models import convert

STATE_SUFFIX = ".state.msgpack"


def _atomic_write(path: str, data: bytes):
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def save_train_state(path: str, trainer, scheduler, epoch: int,
                     best_loss: float, extra: dict | None = None):
    payload = {
        "params": jax.tree_util.tree_map(np.asarray, trainer.params),
        "stats": jax.tree_util.tree_map(np.asarray, trainer.stats),
        "opt_state": jax.tree_util.tree_map(np.asarray, trainer.opt_state),
        "meta": {
            "epoch": epoch,
            "best_loss": best_loss,
            "step_counter": trainer._step_counter,
            "scheduler": scheduler.state_dict(),
            "extra": extra or {},
        },
    }
    meta = payload.pop("meta")
    blob = serialization.to_bytes(payload)
    _atomic_write(path, blob)
    _atomic_write(path + ".meta.json", json.dumps(meta).encode())


def load_train_state(path: str, trainer, scheduler):
    """Restore a trainer/scheduler in place; returns (epoch, best_loss)."""
    template = {
        "params": trainer.params,
        "stats": trainer.stats,
        "opt_state": trainer.opt_state,
    }
    with open(path, "rb") as f:
        restored = serialization.from_bytes(template, f.read())
    trainer.params = restored["params"]
    trainer.stats = restored["stats"]
    trainer.opt_state = restored["opt_state"]
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    scheduler.load_state_dict(meta["scheduler"])
    trainer._step_counter = meta["step_counter"]
    if trainer.mesh is not None:
        from vocal_remover_tpu.parallel import mesh as mesh_lib

        trainer.params = mesh_lib.replicate(trainer.mesh, trainer.params)
        trainer.stats = mesh_lib.replicate(trainer.mesh, trainer.stats)
        trainer.opt_state = mesh_lib.replicate(trainer.mesh, trainer.opt_state)
    return meta["epoch"], meta["best_loss"]


def save_model(path: str, model, trainer):
    """Model-only checkpoint in the native format (what inference loads)."""
    convert.save_native(path, trainer.variables, convert.model_config(model))

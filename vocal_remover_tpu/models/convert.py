"""Checkpoint I/O: native format + torch `.pth` interchange.

The reference checkpoints are `torch.save(model.state_dict())` files
(reference train.py:286-290, loaded at inference.py:131). To run those
on TPU we convert them into this framework's native format: a plain
`.npz` holding the flattened variables pytree ('/'-joined paths) plus a
JSON config record — no pickle, no framework lock-in.

torch is only imported inside the `.pth` paths, so the rest of the
framework has no torch dependency.
"""

from __future__ import annotations

import json

import jax
import numpy as np

NATIVE_SUFFIX = ".vrt.npz"
_CONFIG_KEY = "__config__"


def _flatten(tree, prefix=""):
    out = {}
    for k in sorted(tree):
        v = tree[k]
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_native(path: str, variables, config: dict | None = None):
    """Atomically write variables (+ model config) as a flat npz."""
    import os
    import tempfile

    flat = _flatten(variables)
    flat[_CONFIG_KEY] = np.frombuffer(
        json.dumps(config or {}).encode(), dtype=np.uint8
    )
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_native(path: str):
    """-> (variables pytree of np arrays, config dict)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files if k != _CONFIG_KEY}
        config = (
            json.loads(bytes(z[_CONFIG_KEY]).decode())
            if _CONFIG_KEY in z.files
            else {}
        )
    return _unflatten(flat), config


def _torch_state_np(path: str):
    import torch

    sd = torch.load(path, map_location="cpu")
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def load_checkpoint(path: str, model):
    """Load either a native `.npz`/`.vrt.npz` or a torch `.pth`
    checkpoint into `model`'s variables pytree."""
    if path.endswith((".npz",)):
        variables, config = load_native(path)
        for key in ("is_complex", "n_fft", "nout"):
            want = getattr(model, key, None)
            have = config.get(key)
            if have is not None and want is not None and have != want:
                raise ValueError(
                    f"checkpoint {path!r} was trained with {key}={have} "
                    f"but the model is configured with {key}={want} "
                    "(pass the matching flags, e.g. --is_complex)"
                )
        return jax.tree_util.tree_map(np.asarray, variables)
    return model.from_torch(_torch_state_np(path))


def load_model(path: str, n_fft: int, hop_length: int, nout: int = 32,
               nout_lstm: int = 128):
    """Build a CascadedNet + variables from a checkpoint.

    Native checkpoints carry their model config and win over the CLI
    defaults (the reference hard-codes 32/128 at inference.py:130 and
    can only load matching checkpoints); torch `.pth` checkpoints use
    the provided arguments.
    """
    from vocal_remover_tpu.models.cascaded import CascadedNet

    if path.endswith(".npz"):
        variables, config = load_native(path)
        model = CascadedNet(
            config.get("n_fft", n_fft),
            config.get("hop_length", hop_length),
            config.get("nout") or nout,
            config.get("nout_lstm") or nout_lstm,
            bool(config.get("is_complex", False)),
        )
        return model, jax.tree_util.tree_map(np.asarray, variables)
    model = CascadedNet(n_fft, hop_length, nout, nout_lstm)
    return model, model.from_torch(_torch_state_np(path))


def export_torch(path: str, model, variables):
    """Write variables as a reference-compatible torch state_dict."""
    import torch

    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in model.to_torch(variables).items()}
    torch.save(sd, path)


def model_config(model) -> dict:
    return {
        "n_fft": model.n_fft,
        "hop_length": model.hop_length,
        "nout": model.nout,
        "nout_lstm": getattr(model, "nout_lstm", None),
        "is_complex": model.is_complex,
        "arch": "CascadedNet",
    }

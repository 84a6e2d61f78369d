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


_Q8_SUFFIX = ".q8"
_Q8_SCALE_SUFFIX = ".q8scale"


def _quantize_leaf_q8(w: np.ndarray):
    """Per-output-channel symmetric int8: q = round(w / scale), scale =
    absmax/127 over all axes but the last (HWIO conv kernels and (in,
    out) dense kernels both keep output channels last)."""
    w = np.asarray(w, np.float32)
    absmax = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale


def save_native(path: str, variables, config: dict | None = None,
                quantize: str | None = None):
    """Atomically write variables (+ model config) as a flat npz.

    quantize="int8": store >=2-D float leaves (conv/dense kernels — the
    bulk of the 56 MB flagship) as per-output-channel symmetric int8
    (~4x smaller file); 1-D leaves (BN vectors, biases) stay f32.
    `load_native` dequantizes transparently, so quantized checkpoints
    serve through the unchanged Separator path. Worst-case per-weight
    error is scale/2 = channel-absmax/254 (see tests/test_models.py).
    """
    import os
    import tempfile

    if quantize not in (None, "int8"):
        raise ValueError(f"unsupported quantize mode {quantize!r}")
    flat = _flatten(variables)
    if quantize == "int8":
        for k in list(flat):
            v = flat[k]
            if v.ndim >= 2 and np.issubdtype(v.dtype, np.floating):
                q, scale = _quantize_leaf_q8(v)
                del flat[k]
                flat[k + _Q8_SUFFIX] = q
                flat[k + _Q8_SCALE_SUFFIX] = scale
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
    """-> (variables pytree of np arrays, config dict). int8-quantized
    leaves (save_native(quantize="int8")) are dequantized to f32."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files if k != _CONFIG_KEY}
        config = (
            json.loads(bytes(z[_CONFIG_KEY]).decode())
            if _CONFIG_KEY in z.files
            else {}
        )
    for k in [k for k in flat if k.endswith(_Q8_SUFFIX)]:
        q = flat.pop(k)
        scale = flat.pop(k[: -len(_Q8_SUFFIX)] + _Q8_SCALE_SUFFIX)
        flat[k[: -len(_Q8_SUFFIX)]] = q.astype(np.float32) * scale
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

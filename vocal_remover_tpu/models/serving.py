"""Serving-time weight transforms: eval BatchNorm folding and reduced-
precision weight residency.

The reference serves its model exactly as trained (inference.py:130-132
loads the f32 state_dict and runs conv -> BN -> activ per layer). On
TPU the conv stack is bandwidth-bound, so serving pulls two levers the
training graph can't:

  * `fold_batch_norms` — eval-mode BN is an affine map per channel;
    folding it into the conv kernel (and the LSTM head's dense weights)
    leaves conv + bias-add + activation, the shape a fused serving
    kernel wants (and one less elementwise pass for XLA to schedule).
  * `cast_weights` — bf16-resident kernels halve the weight HBM traffic
    and skip the per-call f32->bf16 cast the bf16 activation mode
    otherwise pays. Pairs with `nn.config.set_precision('bfloat16')`;
    masks differ from f32 serving at the ~1e-4 level (sigmoid output),
    see BENCH_NOTES.md.

Both transforms are pure pytree -> pytree; the model object is
unchanged and `model(variables, x)` (eval mode) produces the same masks
within float tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vocal_remover_tpu.nn.functional import BN_EPS

__all__ = ["fold_batch_norms", "cast_weights"]


def _identity_bn(bias, dtype=jnp.float32):
    """BN statistics that make eval batch_norm compute y = x + bias:
    scale 1, mean 0, and var such that rsqrt(var + eps) == 1."""
    n = bias.shape[0]
    return {
        "scale": jnp.ones((n,), dtype),
        "bias": jnp.asarray(bias, dtype),
        "mean": jnp.zeros((n,), dtype),
        "var": jnp.full((n,), 1.0 - BN_EPS, dtype),
    }


def _fold_conv_bn(block):
    """{'conv': HWIO kernel, 'bn': stats} -> same tree with the BN
    scale multiplied into the kernel's output channels and the shift
    carried by an identity BN (Conv2DBNActiv has no bias slot)."""
    w = np.asarray(block["conv"], np.float64)
    bn = block["bn"]
    s = np.asarray(bn["scale"], np.float64) / np.sqrt(
        np.asarray(bn["var"], np.float64) + BN_EPS
    )
    shift = (
        np.asarray(bn["bias"], np.float64)
        - np.asarray(bn["mean"], np.float64) * s
    )
    return {
        "conv": jnp.asarray(w * s, jnp.float32),
        "bn": _identity_bn(jnp.asarray(shift, jnp.float32)),
    }


def _fold_dense_bn(dense, bn):
    """LSTMModule head: h @ w + b followed by BatchNorm1d -> folded
    (w', b') plus an identity BN."""
    w = np.asarray(dense["w"], np.float64)
    b = np.asarray(dense["b"], np.float64)
    s = np.asarray(bn["scale"], np.float64) / np.sqrt(
        np.asarray(bn["var"], np.float64) + BN_EPS
    )
    shift = (
        np.asarray(bn["bias"], np.float64)
        - np.asarray(bn["mean"], np.float64) * s
    )
    w2 = w * s[None, :]
    b2 = b * s + shift
    return (
        {"w": jnp.asarray(w2, jnp.float32), "b": jnp.asarray(b2, jnp.float32)},
        _identity_bn(jnp.zeros_like(jnp.asarray(shift, jnp.float32))),
    )


def fold_batch_norms(variables):
    """Fold every eval-mode BatchNorm in a CascadedNet/BaseNet variable
    tree into the preceding conv/dense weights. Returns a new tree;
    eval forwards match the unfolded tree to float-association noise.
    Only valid for inference (train-mode BN recomputes batch stats)."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        if set(node.keys()) == {"conv", "bn"} and hasattr(
            node["conv"], "shape"
        ):
            return _fold_conv_bn(node)
        out = {k: walk(v) for k, v in node.items()}
        if "dense" in out and "dense_bn" in out:
            out["dense"], out["dense_bn"] = _fold_dense_bn(
                out["dense"], out["dense_bn"]
            )
        return out

    return walk(variables)


def cast_weights(variables, dtype=jnp.bfloat16):
    """Cast conv/dense/LSTM weights to `dtype` for HBM residency,
    keeping BatchNorm statistic vectors in f32 (they are folded into
    the activation dtype at apply time and are numerically sensitive).
    """

    def walk(node, path=()):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if any(p == "bn" or p == "dense_bn" for p in path):
            return node
        return jnp.asarray(node, dtype)

    return walk(variables)


def serving_variables(variables, dtype=None):
    """fold_batch_norms + optional weight cast in one call (the
    serving pipelines' standard transform)."""
    v = fold_batch_norms(variables)
    if dtype is not None:
        v = cast_weights(v, dtype)
    return jax.device_put(v)

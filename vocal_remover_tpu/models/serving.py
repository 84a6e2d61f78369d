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

  * `quantize_int8` — per-output-channel symmetric int8 conv kernels
    for the U-Net conv stack. The MXU runs int8 at 2x the bf16 rate
    and the conv reads half the bytes; activations are quantized
    dynamically per conv call (nn/functional.conv2d_int8). The LSTM
    branch and the mask heads stay float (they are a tiny fraction of
    the FLOPs and the most numerically sensitive); quality is gated by
    tests/test_serving_transforms.py (mask SNR vs f32) and
    scripts/check_serving_snr.py on real audio.

All transforms are pure pytree -> pytree; the model object is
unchanged and `model(variables, x)` (eval mode) produces the same masks
within float tolerance.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from vocal_remover_tpu.nn.functional import BN_EPS

__all__ = ["fold_batch_norms", "cast_weights", "quantize_int8",
           "calibrate_act_scales", "pack_flat_encoders",
           "serving_variables"]


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
        if path and path[-1] in ("q", "scale", "a_scale"):
            # int8-quantized conv leaf: values stay int8, the
            # weight/activation scales stay f32
            return node
        if "flat_enc" in path and path[-1] == "bias":
            return node  # flat-kernel bias adds in f32
        return jnp.asarray(node, dtype)

    return walk(variables)


def calibrate_act_scales(model, variables, batches, margin=1.0):
    """Record per-conv input-activation amax over eager eval forwards
    of `batches` (NHWC arrays) and return {tree path tuple: f32 scale}
    for quantize_int8's static activation quantization.

    Static scales replace the dynamic per-dispatch amax reduction —
    an unfusable extra pass over every conv input that measured slower
    than the int8 MXU gain itself (BENCH_NOTES round 4). Inputs beyond
    the calibrated range saturate at +-127; `margin` scales the
    recorded amax for headroom. The recorder keys by kernel-leaf
    identity during the forward; before returning, the keys are
    rewritten to tree paths against `variables`, so the result stays
    valid for any structurally-equal tree (re-folded, device_put,
    copied) passed to quantize_int8 later.

    The eager forward is pinned to the CPU backend: calibration runs
    one op at a time (the recorder needs a host sync per conv), which
    over a tunneled TPU costs a round-trip per op — minutes for a
    millisecond-scale computation whose result is backend-independent.
    """
    from vocal_remover_tpu.nn import config as nn_config

    rec: dict = {}
    with nn_config.calibration(rec):
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        with contextlib.nullcontext() if cpu is None else (
            jax.default_device(cpu)
        ):
            for x in batches:
                model(variables, x)

    id_to_path = {}

    def index(node, path=()):
        if isinstance(node, dict):
            for k, v in node.items():
                index(v, path + (k,))
        else:
            id_to_path[id(node)] = path

    index(variables)
    scales = {}
    for k, v in rec.items():
        path = id_to_path.get(k)
        if path is not None:
            scales[path] = np.float32(max(v * margin, 1e-30) / 127.0)
    return scales


def quantize_int8(variables, act_scales=None):
    """Quantize the Conv2DBNActiv kernels of a BN-folded variable tree
    to per-output-channel symmetric int8 ({"q": int8 HWIO, "scale":
    f32 (Cout,)} leaves, dispatched by nn/functional.conv2d). Skipped
    (kept float, VERDICT r03 #1 'f32 head/LSTM'):

      * everything under an `lstm_dec2` module (the BiLSTM branch —
        its 1x1 squeeze conv feeds a single-channel recurrence, the
        least quantization-tolerant spot in the net);
      * the `out`/`aux_out` mask heads (1x1 conv straight into the
        sigmoid — mask error there is output error).

    Call on fold_batch_norms output; the identity-BN bias that carries
    the folded shift stays f32 and is added after dequantization.

    act_scales: optional {tree path tuple: f32 scale} from
    calibrate_act_scales — embeds a static "a_scale" per conv so the
    serving graph quantizes activations with one fusable round/clip
    instead of a per-dispatch amax reduction. If scales are supplied
    but none match the tree (a silent total miss would fall back to
    the slower dynamic quantization), a ValueError is raised.
    """
    n_attached = 0

    def quant(kernel, path):
        nonlocal n_attached
        w = np.asarray(kernel, np.float32)
        scale = np.max(np.abs(w), axis=(0, 1, 2))  # per out channel
        scale = np.maximum(scale, 1e-30) / 127.0
        q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        out = {"q": jnp.asarray(q), "scale": jnp.asarray(scale, jnp.float32)}
        if act_scales is not None and path in act_scales:
            out["a_scale"] = jnp.asarray(act_scales[path], jnp.float32)
            n_attached += 1
        return out

    def walk(node, path=()):
        if not isinstance(node, dict):
            return node
        if any(p in ("lstm_dec2", "out", "aux_out") for p in path):
            return node
        if set(node.keys()) == {"conv", "bn"} and hasattr(
            node["conv"], "shape"
        ):
            return {"conv": quant(node["conv"], path + ("conv",)),
                    "bn": node["bn"]}
        return {k: walk(v, path + (k,)) for k, v in node.items()}

    out = walk(variables)
    if act_scales and n_attached == 0:
        raise ValueError(
            "quantize_int8: activation scales were supplied but none "
            "matched the variable tree — calibrate against a tree with "
            "the same structure (paths are the keys)"
        )
    return out


def pack_flat_encoders(variables, model):
    """Attach pixel-packed encoder weights (nn/conv_pack.py) to every
    BaseNet subtree of a BN-FOLDED variable tree.

    Each band net's enc1..enc3 (the small-channel levels where XLA's
    NHWC conv runs the MXU at K = Cin) gains a `flat_enc` sub-dict of
    {"wst", "bias"} arrays; BaseNet.apply picks them up in eval mode
    and runs those six convs as flat-to-flat Pallas kernels (measured
    4.7x the XLA conv rate on the hot shapes, BENCH_NOTES round 4).
    enc4/enc5 keep the XLA path: their stride-2 packing transition is
    not block-uniform (cout != 2*cin) and their channel width already
    fills the MXU.

    Call on fold_batch_norms output (the bias is read from the
    identity-BN shift). Pure pytree transform; checkpoints and the
    torch converter are unaffected.
    """
    from vocal_remover_tpu.models.base_net import BaseNet
    from vocal_remover_tpu.nn import conv_pack as cp

    def pack(block, p_out, stride, act):
        lay = cp.build_flat_layer(
            np.asarray(block["conv"], np.float32),
            np.asarray(block["bn"]["bias"], np.float32),
            p_out, stride, act=act,
        )
        return {"wst": jnp.asarray(lay["wst"]),
                "bias": jnp.asarray(lay["bias"])}

    out = dict(variables)
    for name in getattr(model, "_children", ()):
        mod = getattr(model, name, None)
        if not isinstance(mod, BaseNet):
            continue
        p1 = max(1, 128 // mod.enc1.nout)
        if p1 < 4:  # enc3 needs p1//4 >= 1
            continue
        sub = dict(out[name])
        sub["flat_enc"] = {
            # enc1 stays on XLA: its tiny-C input needs lane padding
            # and its full-res output is a decoder skip, so running it
            # flat costs two of the most expensive boundary relayouts
            # (measured a net loss, BENCH_NOTES round 4); the flat
            # chain enters at e1, whose lanes are exactly 128
            "enc2_conv1": pack(sub["enc2"]["conv1"], p1 // 2, 2,
                               "leaky_relu"),
            "enc2_conv2": pack(sub["enc2"]["conv2"], p1 // 2, 1,
                               "leaky_relu"),
            "enc3_conv1": pack(sub["enc3"]["conv1"], p1 // 4, 2,
                               "leaky_relu"),
            "enc3_conv2": pack(sub["enc3"]["conv2"], p1 // 4, 1,
                               "leaky_relu"),
        }
        out[name] = sub
    return out


def serving_variables(variables, dtype=None, model=None,
                      calibration_batches=None, flat=False):
    """fold_batch_norms + optional weight transform in one call (the
    serving pipelines' standard transform). dtype: None keeps f32
    weights, 'bfloat16'/jnp.bfloat16 casts them, 'int8' quantizes the
    conv stack (per-channel symmetric) and casts the remaining float
    weights to bf16.

    For int8, pass `model` + `calibration_batches` (NHWC magnitude
    arrays) to calibrate static activation scales — without them the
    graph falls back to per-dispatch dynamic quantization (slower:
    one extra reduction pass per conv).

    flat=True (requires `model`, float dtypes only): additionally
    attach pixel-packed enc1..enc3 weights so eval forwards run those
    convs as flat-layout Pallas kernels (pack_flat_encoders)."""
    v = fold_batch_norms(variables)
    if flat:
        if dtype == "int8":
            raise ValueError("flat packing and int8 are exclusive "
                             "serving transforms")
        if model is None:
            raise ValueError("flat packing needs the model for the "
                             "per-net channel plan")
        v = pack_flat_encoders(v, model)
    if dtype == "int8":
        act_scales = None
        if model is not None and calibration_batches is not None:
            act_scales = calibrate_act_scales(
                model, v, calibration_batches
            )
        v = quantize_int8(v, act_scales)
        v = cast_weights(v, jnp.bfloat16)
    elif dtype is not None:
        v = cast_weights(v, dtype)
    return jax.device_put(v)

"""Stateless NN primitives (NHWC, TPU-friendly layouts)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vocal_remover_tpu.nn import config

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def _conv_geometry(stride, padding, dilation):
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    if isinstance(padding, int):
        p = [(padding, padding)] * 2
    else:  # (pad_h, pad_w) pair, e.g. ASPP's anisotropic (freq, time) pads
        p = [(padding[0], padding[0]), (padding[1], padding[1])]
    d = (dilation, dilation) if isinstance(dilation, int) else tuple(dilation)
    return s, p, d


def conv2d_int8(x, w, stride=1, padding=1, dilation=1):
    """Quantized serving conv: int8 x int8 -> int32 on the MXU.

    `w` is the {"q": int8 HWIO kernel, "scale": f32 (Cout,)[,
    "a_scale": f32 scalar]} leaf produced by models/serving.
    quantize_int8 (per-output-channel symmetric weight scales,
    BatchNorm pre-folded). Activation quantization:

      * with "a_scale" (calibration-time static per-tensor scale,
        serving.calibrate_act_scales): one fusable round/clip pass —
        XLA folds it into the producing layer's elementwise epilogue;
      * without: dynamic per-dispatch amax/127 — an extra, unfusable
        full reduction pass over the activation (measured to cost more
        than the int8 MXU gain on the serving path; kept for
        calibration-free use).

    The conv itself moves half the bytes of bf16 and the int8 MXU runs
    2x the bf16 rate (scripts/bench_int8.py). The dequantized output is
    handed back in the serving compute dtype, so the surrounding
    BN-bias + activation stay bf16. Eval only — round() kills the
    gradient.
    """
    s, p, d = _conv_geometry(stride, padding, dilation)
    xf = x.astype(jnp.float32)
    if "a_scale" in w:
        a_scale = w["a_scale"]
    else:
        a_scale = jnp.max(jnp.abs(xf)) / 127.0
        a_scale = jnp.maximum(a_scale, jnp.float32(1e-30))
    xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    yi = jax.lax.conv_general_dilated(
        xq,
        w["q"],
        window_strides=s,
        padding=p,
        rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = yi.astype(jnp.float32) * (a_scale * w["scale"])
    return y.astype(config.get_compute_dtype())


def conv2d(x, w, stride=1, padding=1, dilation=1):
    """NHWC conv with HWIO kernel (torch Conv2d semantics, bias-free).

    In bf16 compute mode, inputs/kernels are cast so activations stay
    bf16 in HBM (the conv stack is bandwidth-bound); accumulation is
    still f32 on the MXU.

    An int8-quantized kernel leaf ({"q", "scale"} dict) dispatches to
    `conv2d_int8` — the layer modules stay oblivious to the serving
    quantization transform.
    """
    if isinstance(w, dict):
        return conv2d_int8(x, w, stride, padding, dilation)
    rec = config.get_calibration_recorder()
    if rec is not None:
        # eager calibration pass (models/serving.calibrate_act_scales):
        # record this conv's input amax keyed by its kernel leaf
        amax = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
        rec[id(w)] = max(rec.get(id(w), 0.0), amax)
    dt = config.get_compute_dtype()
    if x.dtype != dt:
        x = x.astype(dt)
    if w.dtype != dt:
        w = w.astype(dt)
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    if isinstance(padding, int):
        p = [(padding, padding)] * 2
    else:  # (pad_h, pad_w) pair, e.g. ASPP's anisotropic (freq, time) pads
        p = [(padding[0], padding[0]), (padding[1], padding[1])]
    d = (dilation, dilation) if isinstance(dilation, int) else tuple(dilation)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=s,
        padding=p,
        rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=config.get_precision(),
    )


def batch_norm(x, bn, *, train: bool, axes=None):
    """BatchNorm with torch semantics.

    Args:
      x: activations; normalized over all axes except the last (channel).
      bn: dict with 'scale', 'bias', 'mean', 'var'.
      train: batch statistics (biased var for normalization, unbiased for
        the running update, momentum 0.1) vs running statistics.

    Returns:
      (y, new_bn)
    """
    if axes is None:
        axes = tuple(range(x.ndim - 1))
    if train:
        # bf16 activations: statistics in f32 (a bf16 variance loses
        # ~3 digits to cancellation), normalization applied in the
        # activation dtype so conv->BN->activ chains stay bf16 in HBM —
        # mixed f32 params would otherwise promote every BN output back
        # to f32 and reintroduce a layout/convert copy per layer
        bf16 = x.dtype == jnp.bfloat16
        xs = x.astype(jnp.float32) if bf16 else x
        mean = jnp.mean(xs, axes)
        var = jnp.var(xs, axes)
        n = 1
        for a in axes:
            n *= x.shape[a]
        unbiased = var * (n / max(n - 1, 1))
        new_bn = dict(
            bn,
            mean=(1 - BN_MOMENTUM) * bn["mean"] + BN_MOMENTUM * mean,
            var=(1 - BN_MOMENTUM) * bn["var"] + BN_MOMENTUM * unbiased,
        )
        if bf16:
            inv = jax.lax.rsqrt(var + BN_EPS)
            scale = inv * bn["scale"]
            shift = bn["bias"] - mean * scale
            y = x * scale.astype(x.dtype) + shift.astype(x.dtype)
            return y, new_bn
    else:
        # eval: fold into one multiply-add (computed in f32, applied in
        # the activation dtype so bf16 chains stay bf16)
        inv = jax.lax.rsqrt(bn["var"] + BN_EPS)
        scale = inv * bn["scale"]
        shift = bn["bias"] - bn["mean"] * scale
        y = x * scale.astype(x.dtype) + shift.astype(x.dtype)
        return y, bn
    inv = jax.lax.rsqrt(var + BN_EPS)
    y = (x - mean) * (inv * bn["scale"]) + bn["bias"]
    return y, new_bn


def dropout2d(x, rate, rng):
    """Channel dropout (torch nn.Dropout2d): zeroes whole NHWC channels."""
    if rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, x.shape[-1]))
    return jnp.where(mask, x / keep, 0.0)


def relu(x):
    return jnp.maximum(x, 0)


def leaky_relu(x, negative_slope=0.01):
    return jnp.where(x >= 0, x, negative_slope * x)


ACTIVATIONS = {"relu": relu, "leaky_relu": leaky_relu, "sigmoid": jax.nn.sigmoid}

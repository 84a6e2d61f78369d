"""NN layer modules (functional, NHWC).

Capability-parity layer library with reference lib/layers.py, redesigned
for TPU:
  * NHWC activations / HWIO kernels (MXU-native layouts).
  * Functional modules: config lives on the (static) class instance,
    parameters + batchnorm statistics in one nested-dict pytree, and
    `apply(variables, x, train, rng) -> (y, new_variables)`.
  * Bilinear upsampling runs as interpolation-matrix matmuls
    (ops/resize.py); the BiLSTM is a `lax.scan` (nn/lstm.py).

Every module knows how to import/export the matching torch state_dict
slice (`from_torch` / `to_torch`), keyed by the same attribute paths as
the reference modules, which makes checkpoint conversion mechanical.

Reference mapping:
  Conv2DBNActiv  -> lib/layers.py:8-26
  Encoder        -> lib/layers.py:29-40
  Decoder        -> lib/layers.py:43-64
  ASPPModule     -> lib/layers.py:67-105
  LSTMModule     -> lib/layers.py:108-133
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vocal_remover_tpu.nn import functional as F
from vocal_remover_tpu.nn import init as init_lib
from vocal_remover_tpu.nn import lstm as lstm_lib
from vocal_remover_tpu.ops.resize import resize_bilinear, upsample2x

__all__ = ["Conv2DBNActiv", "Encoder", "Decoder", "ASPPModule", "LSTMModule"]


def _crop_time(skip, x):
    """Center-crop `skip` (NHWC) along time (axis 2) to x's width
    (reference lib/spec_utils.py:8-23 crop_center)."""
    t1, t2 = skip.shape[2], x.shape[2]
    if t1 == t2:
        return skip
    if t1 < t2:
        raise ValueError("skip time width must be >= x time width")
    s = (t1 - t2) // 2
    return skip[:, :, s : s + t2, :]


def _bn_init(nout):
    return {
        "scale": jnp.ones((nout,), jnp.float32),
        "bias": jnp.zeros((nout,), jnp.float32),
        "mean": jnp.zeros((nout,), jnp.float32),
        "var": jnp.ones((nout,), jnp.float32),
    }


def _own(x):
    """Copy into owned memory: state-dict arrays are often views of
    torch tensor storage, and zero-copy jnp.asarray would alias buffers
    that torch later mutates in place (running stats)."""
    return jnp.asarray(np.array(x, copy=True))


def _bn_from_torch(sd, prefix):
    return {
        "scale": _own(sd[prefix + "weight"]),
        "bias": _own(sd[prefix + "bias"]),
        "mean": _own(sd[prefix + "running_mean"]),
        "var": _own(sd[prefix + "running_var"]),
    }


def _bn_to_torch(bn, prefix, out):
    out[prefix + "weight"] = np.asarray(bn["scale"])
    out[prefix + "bias"] = np.asarray(bn["bias"])
    out[prefix + "running_mean"] = np.asarray(bn["mean"])
    out[prefix + "running_var"] = np.asarray(bn["var"])
    out[prefix + "num_batches_tracked"] = np.asarray(0, np.int64)


class Conv2DBNActiv:
    """Conv2d(bias=False) -> BatchNorm2d -> activation."""

    def __init__(self, nin, nout, ksize=3, stride=1, pad=1, dilation=1,
                 activ="relu"):
        self.nin, self.nout = nin, nout
        self.ksize, self.stride, self.pad, self.dilation = (
            ksize, stride, pad, dilation,
        )
        self.activ = activ

    def init(self, key):
        return {
            "conv": init_lib.conv_kernel(
                key, (self.ksize, self.ksize, self.nin, self.nout)
            ),
            "bn": _bn_init(self.nout),
        }

    def apply(self, v, x, *, train=False, rng=None):
        y = F.conv2d(x, v["conv"], self.stride, self.pad, self.dilation)
        y, bn = F.batch_norm(y, v["bn"], train=train)
        y = F.ACTIVATIONS[self.activ](y)
        return y, {"conv": v["conv"], "bn": bn}

    def from_torch(self, sd, prefix):
        w = np.asarray(sd[prefix + "conv.0.weight"])  # (O, I, kh, kw)
        return {
            "conv": _own(w.transpose(2, 3, 1, 0)),
            "bn": _bn_from_torch(sd, prefix + "conv.1."),
        }

    def to_torch(self, v, prefix, out):
        out[prefix + "conv.0.weight"] = np.asarray(v["conv"]).transpose(
            3, 2, 0, 1
        )
        _bn_to_torch(v["bn"], prefix + "conv.1.", out)


class Encoder:
    """Two Conv2DBNActiv blocks, the first strided (LeakyReLU default)."""

    def __init__(self, nin, nout, ksize=3, stride=1, pad=1,
                 activ="leaky_relu"):
        self.conv1 = Conv2DBNActiv(nin, nout, ksize, stride, pad, activ=activ)
        self.conv2 = Conv2DBNActiv(nout, nout, ksize, 1, pad, activ=activ)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"conv1": self.conv1.init(k1), "conv2": self.conv2.init(k2)}

    def apply(self, v, x, *, train=False, rng=None):
        h, c1 = self.conv1.apply(v["conv1"], x, train=train)
        h, c2 = self.conv2.apply(v["conv2"], h, train=train)
        return h, {"conv1": c1, "conv2": c2}

    def from_torch(self, sd, prefix):
        return {
            "conv1": self.conv1.from_torch(sd, prefix + "conv1."),
            "conv2": self.conv2.from_torch(sd, prefix + "conv2."),
        }

    def to_torch(self, v, prefix, out):
        self.conv1.to_torch(v["conv1"], prefix + "conv1.", out)
        self.conv2.to_torch(v["conv2"], prefix + "conv2.", out)


class Decoder:
    """Bilinear 2x upsample -> optional skip concat -> conv
    -> optional channel dropout."""

    def __init__(self, nin, nout, ksize=3, stride=1, pad=1, activ="relu",
                 dropout=False):
        self.conv1 = Conv2DBNActiv(nin, nout, ksize, 1, pad, activ=activ)
        self.dropout = dropout

    def init(self, key):
        return {"conv1": self.conv1.init(key)}

    def apply(self, v, x, skip=None, *, train=False, rng=None):
        # lerp formulation in training (and its backward), interp-
        # matrix matmuls in the forward-only eval/serving graphs — see
        # ops/resize.py resize_bilinear for the measured basis
        x = upsample2x(x, lerp=train)
        if skip is not None:
            skip = _crop_time(skip, x)
            x = jnp.concatenate([x, skip], axis=-1)
        h, c1 = self.conv1.apply(v["conv1"], x, train=train)
        if self.dropout and train and rng is not None:
            h = F.dropout2d(h, 0.1, rng)
        return h, {"conv1": c1}

    def from_torch(self, sd, prefix):
        return {"conv1": self.conv1.from_torch(sd, prefix + "conv1.")}

    def to_torch(self, v, prefix, out):
        self.conv1.to_torch(v["conv1"], prefix + "conv1.", out)


class ASPPModule:
    """Atrous spatial pyramid pooling over (freq, time) with a
    freq-pooled branch; dilations are (freq, time) anisotropic pairs."""

    def __init__(self, nin, nout, dilations=((4, 2), (8, 4), (12, 6)),
                 activ="relu", dropout=False):
        self.pooled_conv = Conv2DBNActiv(nin, nout, 1, 1, 0, activ=activ)
        self.conv2 = Conv2DBNActiv(nin, nout, 1, 1, 0, activ=activ)
        self.conv3 = Conv2DBNActiv(
            nin, nout, 3, 1, dilations[0], dilations[0], activ=activ
        )
        self.conv4 = Conv2DBNActiv(
            nin, nout, 3, 1, dilations[1], dilations[1], activ=activ
        )
        self.conv5 = Conv2DBNActiv(
            nin, nout, 3, 1, dilations[2], dilations[2], activ=activ
        )
        self.bottleneck = Conv2DBNActiv(nout * 5, nout, 1, 1, 0, activ=activ)
        self.dropout = dropout

    def init(self, key):
        ks = jax.random.split(key, 6)
        return {
            "pooled_conv": self.pooled_conv.init(ks[0]),
            "conv2": self.conv2.init(ks[1]),
            "conv3": self.conv3.init(ks[2]),
            "conv4": self.conv4.init(ks[3]),
            "conv5": self.conv5.init(ks[4]),
            "bottleneck": self.bottleneck.init(ks[5]),
        }

    def apply(self, v, x, *, train=False, rng=None):
        n, h, w, c = x.shape
        pooled = jnp.mean(x, axis=1, keepdims=True)  # AdaptiveAvgPool2d((1, None))
        feat1, c1 = self.pooled_conv.apply(v["pooled_conv"], pooled, train=train)
        feat1 = resize_bilinear(feat1, h, w)
        feat2, c2 = self.conv2.apply(v["conv2"], x, train=train)
        feat3, c3 = self.conv3.apply(v["conv3"], x, train=train)
        feat4, c4 = self.conv4.apply(v["conv4"], x, train=train)
        feat5, c5 = self.conv5.apply(v["conv5"], x, train=train)
        out = jnp.concatenate([feat1, feat2, feat3, feat4, feat5], axis=-1)
        out, cb = self.bottleneck.apply(v["bottleneck"], out, train=train)
        if self.dropout and train and rng is not None:
            out = F.dropout2d(out, 0.1, rng)
        return out, {
            "pooled_conv": c1, "conv2": c2, "conv3": c3, "conv4": c4,
            "conv5": c5, "bottleneck": cb,
        }

    # torch names: conv1.1 (inside Sequential(AdaptiveAvgPool2d, conv)),
    # conv2..conv5, bottleneck
    def from_torch(self, sd, prefix):
        return {
            "pooled_conv": self.pooled_conv.from_torch(sd, prefix + "conv1.1."),
            "conv2": self.conv2.from_torch(sd, prefix + "conv2."),
            "conv3": self.conv3.from_torch(sd, prefix + "conv3."),
            "conv4": self.conv4.from_torch(sd, prefix + "conv4."),
            "conv5": self.conv5.from_torch(sd, prefix + "conv5."),
            "bottleneck": self.bottleneck.from_torch(sd, prefix + "bottleneck."),
        }

    def to_torch(self, v, prefix, out):
        self.pooled_conv.to_torch(v["pooled_conv"], prefix + "conv1.1.", out)
        self.conv2.to_torch(v["conv2"], prefix + "conv2.", out)
        self.conv3.to_torch(v["conv3"], prefix + "conv3.", out)
        self.conv4.to_torch(v["conv4"], prefix + "conv4.", out)
        self.conv5.to_torch(v["conv5"], prefix + "conv5.", out)
        self.bottleneck.to_torch(v["bottleneck"], prefix + "bottleneck.", out)


class LSTMModule:
    """1x1 conv squeeze to one channel -> per-frame BiLSTM over frequency
    vectors -> Dense + BatchNorm1d + ReLU, reshaped back to NHWC."""

    def __init__(self, nin_conv, nin_lstm, nout_lstm):
        self.conv = Conv2DBNActiv(nin_conv, 1, 1, 1, 0)
        self.nin_lstm = nin_lstm
        self.nout_lstm = nout_lstm
        self.hidden = nout_lstm // 2

    def init(self, key):
        kc, kl, kd1, kd2 = jax.random.split(key, 4)
        return {
            "conv": self.conv.init(kc),
            "lstm": lstm_lib.init_bilstm(kl, self.nin_lstm, self.hidden),
            "dense": {
                "w": init_lib.linear_weight(
                    kd1, (self.nout_lstm, self.nin_lstm)
                ),
                "b": init_lib.linear_bias(
                    kd2, (self.nin_lstm,), self.nout_lstm
                ),
            },
            "dense_bn": _bn_init(self.nin_lstm),
        }

    def apply(self, v, x, *, train=False, rng=None):
        n, nbins, nframes, _ = x.shape
        h, cc = self.conv.apply(v["conv"], x, train=train)  # (N, F, T, 1)
        h = jnp.transpose(h[..., 0], (2, 0, 1))  # (T, N, F)
        h = lstm_lib.bilstm(v["lstm"], h)  # (T, N, nout_lstm)
        h = h.reshape(-1, self.nout_lstm)  # (T*N, nout)
        h = (
            jnp.matmul(h, v["dense"]["w"],
                       precision=jax.lax.Precision.HIGHEST)
            + v["dense"]["b"]
        )
        h, bn = F.batch_norm(h, v["dense_bn"], train=train)
        h = F.relu(h)
        h = h.reshape(nframes, n, self.nin_lstm)
        h = jnp.transpose(h, (1, 2, 0))[..., None]  # (N, F, T, 1)
        # the recurrence runs f32 (lstm.py); hand the branch back in the
        # surrounding dtype so the skip-concat in BaseNet doesn't
        # promote the whole decoder activation to f32 in bf16 mode
        if h.dtype != x.dtype and x.dtype == jnp.bfloat16:
            h = h.astype(x.dtype)
        return h, {"conv": cc, "lstm": v["lstm"], "dense": v["dense"],
                   "dense_bn": bn}

    def from_torch(self, sd, prefix):
        def d(name):
            return np.asarray(sd[prefix + name])

        lstm = {
            "fwd": {
                "w_ih": _own(d("lstm.weight_ih_l0").T),
                "w_hh": _own(d("lstm.weight_hh_l0").T),
                "b_ih": _own(d("lstm.bias_ih_l0")),
                "b_hh": _own(d("lstm.bias_hh_l0")),
            },
            "bwd": {
                "w_ih": _own(d("lstm.weight_ih_l0_reverse").T),
                "w_hh": _own(d("lstm.weight_hh_l0_reverse").T),
                "b_ih": _own(d("lstm.bias_ih_l0_reverse")),
                "b_hh": _own(d("lstm.bias_hh_l0_reverse")),
            },
        }
        return {
            "conv": self.conv.from_torch(sd, prefix + "conv."),
            "lstm": lstm,
            "dense": {
                "w": _own(d("dense.0.weight").T),
                "b": _own(d("dense.0.bias")),
            },
            "dense_bn": _bn_from_torch(sd, prefix + "dense.1."),
        }

    def to_torch(self, v, prefix, out):
        self.conv.to_torch(v["conv"], prefix + "conv.", out)
        for tdir, jdir in (("", "fwd"), ("_reverse", "bwd")):
            p = v["lstm"][jdir]
            out[prefix + f"lstm.weight_ih_l0{tdir}"] = np.asarray(p["w_ih"]).T
            out[prefix + f"lstm.weight_hh_l0{tdir}"] = np.asarray(p["w_hh"]).T
            out[prefix + f"lstm.bias_ih_l0{tdir}"] = np.asarray(p["b_ih"])
            out[prefix + f"lstm.bias_hh_l0{tdir}"] = np.asarray(p["b_hh"])
        out[prefix + "dense.0.weight"] = np.asarray(v["dense"]["w"]).T
        out[prefix + "dense.0.bias"] = np.asarray(v["dense"]["b"])
        _bn_to_torch(v["dense_bn"], prefix + "dense.1.", out)

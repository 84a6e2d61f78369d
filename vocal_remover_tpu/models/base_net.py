"""Single U-Net with ASPP bottleneck and BiLSTM branch.

Capability-parity with reference lib/nets.py:8-41 `BaseNet`:
encoder chain at widths nout*{1,2,4,6,8} (stride 2 from enc2), ASPP
bottleneck (channel dropout 0.1 in training), three decoders with skip
connections, a BiLSTM branch concatenated at the dec2 scale, and a final
decoder. NHWC throughout; H = frequency, W = time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vocal_remover_tpu.nn.layers import (
    ASPPModule,
    Conv2DBNActiv,
    Decoder,
    Encoder,
    LSTMModule,
)


class BaseNet:
    def __init__(self, nin, nout, nin_lstm, nout_lstm,
                 dilations=((4, 2), (8, 4), (12, 6))):
        self.enc1 = Conv2DBNActiv(nin, nout, 3, 1, 1)
        self.enc2 = Encoder(nout, nout * 2, 3, 2, 1)
        self.enc3 = Encoder(nout * 2, nout * 4, 3, 2, 1)
        self.enc4 = Encoder(nout * 4, nout * 6, 3, 2, 1)
        self.enc5 = Encoder(nout * 6, nout * 8, 3, 2, 1)
        self.aspp = ASPPModule(nout * 8, nout * 8, dilations, dropout=True)
        self.dec4 = Decoder(nout * (6 + 8), nout * 6, 3, 1, 1)
        self.dec3 = Decoder(nout * (4 + 6), nout * 4, 3, 1, 1)
        self.dec2 = Decoder(nout * (2 + 4), nout * 2, 3, 1, 1)
        self.lstm_dec2 = LSTMModule(nout * 2, nin_lstm, nout_lstm)
        self.dec1 = Decoder(nout * (1 + 2) + 1, nout * 1, 3, 1, 1)

    _children = (
        "enc1", "enc2", "enc3", "enc4", "enc5", "aspp",
        "dec4", "dec3", "dec2", "lstm_dec2", "dec1",
    )

    def init(self, key):
        keys = jax.random.split(key, len(self._children))
        return {
            name: getattr(self, name).init(k)
            for name, k in zip(self._children, keys)
        }

    # ------------------------------------------------------------------
    # flat-packed encoder path (serving): enc1..enc3 as pixel-packed
    # Pallas kernels chained flat-to-flat (nn/conv_pack.py) — the
    # small-channel levels where XLA's NHWC conv runs the MXU at
    # K = Cin. Weights are pre-packed by models/serving.
    # pack_flat_encoders into v["flat_enc"]; enc4/enc5 stay on XLA
    # (their packing transition is not block-uniform and their C fills
    # the MXU anyway).
    # ------------------------------------------------------------------

    def _flat_p1(self):
        return max(1, 128 // self.enc1.nout)

    def _flat_supported(self, x_shape):
        n, h, w, c = x_shape
        p1 = self._flat_p1()
        return (p1 >= 4 and w % p1 == 0 and (w // p1) % 8 == 0
                and h % 4 == 0)

    def _apply_encoders_flat(self, fenc, x):
        import jax as _jax

        from vocal_remover_tpu.nn import conv_pack as cp

        interp = _jax.default_backend() == "cpu"
        n, h, w, c = x.shape
        p1 = self._flat_p1()
        wb = w // p1  # invariant across levels (W and P halve together)

        def layer(arrs, p_out, stride, act):
            rowtaps, s_list = cp.flat_geometry(3, stride)
            return {
                "wst": arrs["wst"], "bias": arrs["bias"],
                "rowtaps": rowtaps, "s_list": s_list,
                "stride": stride, "act": act,
                "p_in": p_out * stride, "p_out": p_out,
            }

        f1 = cp.to_flat(x, p1)  # x is e1 (C = nout: exactly 128 lanes)
        f = cp.flat_layer_apply(
            layer(fenc["enc2_conv1"], p1 // 2, 2, "leaky_relu"),
            f1, h, wb, interpret=interp)
        f2 = cp.flat_layer_apply(
            layer(fenc["enc2_conv2"], p1 // 2, 1, "leaky_relu"),
            f, h // 2, wb, interpret=interp)
        f = cp.flat_layer_apply(
            layer(fenc["enc3_conv1"], p1 // 4, 2, "leaky_relu"),
            f2, h // 2, wb, interpret=interp)
        f3 = cp.flat_layer_apply(
            layer(fenc["enc3_conv2"], p1 // 4, 1, "leaky_relu"),
            f, h // 4, wb, interpret=interp)

        nout = self.enc1.nout
        e2 = cp.from_flat(f2, h // 2, w // 2, 2 * nout)
        e3 = cp.from_flat(f3, h // 4, w // 4, 4 * nout)
        return e2, e3

    def apply(self, v, x, *, train=False, rng=None):
        nv = {}
        fenc = None if train else v.get("flat_enc")
        if fenc is not None and self._flat_supported(x.shape):
            e1, nv["enc1"] = self.enc1.apply(v["enc1"], x, train=False)
            e2, e3 = self._apply_encoders_flat(fenc, e1)
            nv["enc2"], nv["enc3"] = v["enc2"], v["enc3"]
            nv["flat_enc"] = fenc
        else:
            e1, nv["enc1"] = self.enc1.apply(v["enc1"], x, train=train)
            e2, nv["enc2"] = self.enc2.apply(v["enc2"], e1, train=train)
            e3, nv["enc3"] = self.enc3.apply(v["enc3"], e2, train=train)
        e4, nv["enc4"] = self.enc4.apply(v["enc4"], e3, train=train)
        e5, nv["enc5"] = self.enc5.apply(v["enc5"], e4, train=train)

        h, nv["aspp"] = self.aspp.apply(v["aspp"], e5, train=train, rng=rng)

        h, nv["dec4"] = self.dec4.apply(v["dec4"], h, e4, train=train)
        h, nv["dec3"] = self.dec3.apply(v["dec3"], h, e3, train=train)
        h, nv["dec2"] = self.dec2.apply(v["dec2"], h, e2, train=train)
        l, nv["lstm_dec2"] = self.lstm_dec2.apply(
            v["lstm_dec2"], h, train=train
        )
        h = jnp.concatenate([h, l], axis=-1)
        h, nv["dec1"] = self.dec1.apply(v["dec1"], h, e1, train=train)
        return h, nv

    def from_torch(self, sd, prefix):
        return {
            name: getattr(self, name).from_torch(sd, prefix + name + ".")
            for name in self._children
        }

    def to_torch(self, v, prefix, out):
        for name in self._children:
            getattr(self, name).to_torch(v[name], prefix + name + ".", out)

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

    def apply(self, v, x, *, train=False, rng=None):
        nv = {}
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

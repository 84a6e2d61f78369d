"""CascadedNet — the flagship 3-stage multi-band mask model.

Capability-parity with reference lib/nets.py:44-141: band-split cascade
(stage 1 low/high half-spectrum U-Nets, stage 2 re-refines each band on
[band input (+) stage-1 band output], stage 3 full-band on
[input (+) aux1 (+) aux2]), a 1x1 sigmoid mask head replicate-padded
from max_bin to output_bin frequency bins, and the dormant-in-reference
complex-mask mode carried as a first-class flag (real/imag stacked in
channels — the TPU backend cannot move complex dtypes).

Layout: NHWC with H = frequency, W = time. Inputs are
(N, output_bin, T, 2) magnitudes (or (N, output_bin, T, 4) re/im pairs
in complex mode). `offset` = 64 frames is the per-side time margin the
valid-output contract trims (see ops/windowing.py).

Default instantiation matches the reference everywhere:
CascadedNet(2048, 1024, 32, 128) => 14,740,882 trainable parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vocal_remover_tpu.models.base_net import BaseNet
from vocal_remover_tpu.nn import config as nn_config
from vocal_remover_tpu.nn import init as init_lib
from vocal_remover_tpu.nn.layers import Conv2DBNActiv


class CascadedNet:
    def __init__(self, n_fft, hop_length, nout=32, nout_lstm=128,
                 is_complex=False):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.is_complex = is_complex

        self.max_bin = n_fft // 2
        self.output_bin = n_fft // 2 + 1
        self.nin_lstm = self.max_bin // 2
        self.offset = 64
        self.nout = nout
        self.nout_lstm = nout_lstm

        nin = 4 if is_complex else 2
        self.nin = nin

        self.stg1_low_band_net = BaseNet(
            nin, nout // 2, self.nin_lstm // 2, nout_lstm
        )
        self.stg1_low_squeeze = Conv2DBNActiv(nout // 2, nout // 4, 1, 1, 0)
        self.stg1_high_band_net = BaseNet(
            nin, nout // 4, self.nin_lstm // 2, nout_lstm // 2
        )
        self.stg2_low_band_net = BaseNet(
            nout // 4 + nin, nout, self.nin_lstm // 2, nout_lstm
        )
        self.stg2_low_squeeze = Conv2DBNActiv(nout, nout // 2, 1, 1, 0)
        self.stg2_high_band_net = BaseNet(
            nout // 4 + nin, nout // 2, self.nin_lstm // 2, nout_lstm // 2
        )
        self.stg3_full_band_net = BaseNet(
            3 * nout // 4 + nin, nout, self.nin_lstm, nout_lstm
        )

    _children = (
        "stg1_low_band_net", "stg1_low_squeeze", "stg1_high_band_net",
        "stg2_low_band_net", "stg2_low_squeeze", "stg2_high_band_net",
        "stg3_full_band_net",
    )

    # ------------------------------------------------------------------
    # init / apply
    # ------------------------------------------------------------------

    def init(self, key):
        keys = jax.random.split(key, len(self._children) + 2)
        v = {
            name: getattr(self, name).init(k)
            for name, k in zip(self._children, keys)
        }
        # out / aux_out: plain 1x1 convs, bias=False (nets.py:79-80).
        v["out"] = {
            "conv": init_lib.conv_kernel(
                keys[-2], (1, 1, self.nout, self.nin)
            )
        }
        v["aux_out"] = {
            "conv": init_lib.conv_kernel(
                keys[-1], (1, 1, 3 * self.nout // 4, self.nin)
            )
        }
        return v

    def _rngs(self, rng):
        if rng is None:
            return [None] * 5
        return list(jax.random.split(rng, 5))

    def apply(self, v, x, *, train=False, rng=None, aux=False,
              remat=False):
        """Forward pass: (N, output_bin, T, nin) -> sigmoid mask of the
        same shape. With aux=True, additionally returns the deep-
        supervision mask from the aux head (reference nets.py:80 has the
        head but never calls it; we expose it as an option).

        remat=True wraps each band-net stage in `jax.checkpoint`:
        backward recomputes the stage instead of keeping its activations
        live, trading ~1 extra forward of FLOPs for the peak-memory
        headroom that enables large batch x cropsize training."""
        rngs = self._rngs(rng)
        nv = {}
        if x.ndim != 4 or x.shape[1] < self.max_bin:
            # a too-short bin axis would only surface as a cryptic
            # einsum/conv shape error deep inside a band net
            raise ValueError(
                f"CascadedNet expects (N, >={self.max_bin} bins, T, C) "
                f"input (n_fft={self.n_fft}), got {x.shape}"
            )

        def stage(net, vs, xin, r):
            fn = lambda vv, xx: net.apply(vv, xx, train=train, rng=r)  # noqa: E731
            if remat:
                fn = jax.checkpoint(fn)
            return fn(vs, xin)

        x = x[:, : self.max_bin]

        # bf16 mode: cast once at the top so the stage concats
        # ([band input (+) band output], [x (+) aux1 (+) aux2]) don't
        # promote back to f32 — every conv input would otherwise pay a
        # convert+relayout copy. f32/f64 parity modes pass through.
        dt = nn_config.get_compute_dtype()
        if dt == jnp.bfloat16 and x.dtype == jnp.float32:
            x = x.astype(dt)

        bandw = x.shape[1] // 2
        l1_in = x[:, :bandw]
        h1_in = x[:, bandw:]

        l1, nv["stg1_low_band_net"] = stage(
            self.stg1_low_band_net, v["stg1_low_band_net"], l1_in, rngs[0]
        )
        l1, nv["stg1_low_squeeze"] = self.stg1_low_squeeze.apply(
            v["stg1_low_squeeze"], l1, train=train
        )
        h1, nv["stg1_high_band_net"] = stage(
            self.stg1_high_band_net, v["stg1_high_band_net"], h1_in, rngs[1]
        )
        aux1 = jnp.concatenate([l1, h1], axis=1)

        l2_in = jnp.concatenate([l1_in, l1], axis=-1)
        h2_in = jnp.concatenate([h1_in, h1], axis=-1)
        l2, nv["stg2_low_band_net"] = stage(
            self.stg2_low_band_net, v["stg2_low_band_net"], l2_in, rngs[2]
        )
        l2, nv["stg2_low_squeeze"] = self.stg2_low_squeeze.apply(
            v["stg2_low_squeeze"], l2, train=train
        )
        h2, nv["stg2_high_band_net"] = stage(
            self.stg2_high_band_net, v["stg2_high_band_net"], h2_in, rngs[3]
        )
        aux2 = jnp.concatenate([l2, h2], axis=1)

        f3_in = jnp.concatenate([x, aux1, aux2], axis=-1)
        f3, nv["stg3_full_band_net"] = stage(
            self.stg3_full_band_net, v["stg3_full_band_net"], f3_in, rngs[4]
        )

        mask = self._head(v["out"]["conv"], f3)
        nv["out"] = v["out"]
        nv["aux_out"] = v["aux_out"]

        if aux:
            aux_feat = jnp.concatenate([aux1, aux2], axis=-1)
            aux_mask = self._head(v["aux_out"]["conv"], aux_feat)
            return (mask, aux_mask), nv
        return mask, nv

    def _head(self, kernel, feat):
        prec = jax.lax.Precision.HIGHEST
        if feat.dtype != jnp.float64:  # f64 only in x64 parity-test mode
            feat = feat.astype(jnp.float32)  # mask head always f32
        if kernel.dtype != feat.dtype:  # bf16-resident serving weights
            kernel = kernel.astype(feat.dtype)
        m = jax.lax.conv_general_dilated(
            feat, kernel, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec,
        )
        if self.is_complex:
            m = self.bounded_mask(m)
        else:
            m = jax.nn.sigmoid(m)
        # replicate-pad frequency up to output_bin (nets.py:111-115)
        pad = self.output_bin - m.shape[1]
        if pad > 0:
            m = jnp.pad(m, ((0, 0), (0, pad), (0, 0), (0, 0)), mode="edge")
        return m

    def bounded_mask(self, m, eps=1e-8):
        """tanh-bounded complex mask on stacked re/im channels
        (reference nets.py:119-122). The magnitude is computed with a
        clamped sqrt so the gradient is defined at exact zeros (torch's
        abs() has the same singularity; the reference never trains this
        path)."""
        re, im = m[..., :2], m[..., 2:]
        mag = jnp.sqrt(jnp.maximum(re * re + im * im, 1e-24))
        scale = jnp.tanh(mag) / (mag + eps)
        return jnp.concatenate([re * scale, im * scale], axis=-1)

    def __call__(self, v, x):
        y, _ = self.apply(v, x, train=False)
        return y

    def predict_mask(self, v, x):
        """Eval forward + offset trim on time (reference nets.py:124-131)."""
        mask = self(v, x)
        if self.offset > 0:
            mask = mask[:, :, self.offset : -self.offset]
            assert mask.shape[2] > 0
        return mask

    def predict(self, v, x):
        """Eval masked spectrogram, offset-trimmed (reference nets.py:133-141)."""
        mask = self(v, x)
        pred = x * mask
        if self.offset > 0:
            pred = pred[:, :, self.offset : -self.offset]
            assert pred.shape[2] > 0
        return pred

    # ------------------------------------------------------------------
    # checkpoint conversion (torch state_dict <-> variables pytree)
    # ------------------------------------------------------------------

    def from_torch(self, sd):
        """Build variables from a torch state_dict (numpy-valued dict).
        Key layout follows reference nets.py:57-80 (the stage-1/2 low
        nets are Sequential(BaseNet, Conv2DBNActiv) => '0.'/'1.')."""
        v = {
            "stg1_low_band_net": self.stg1_low_band_net.from_torch(
                sd, "stg1_low_band_net.0."
            ),
            "stg1_low_squeeze": self.stg1_low_squeeze.from_torch(
                sd, "stg1_low_band_net.1."
            ),
            "stg1_high_band_net": self.stg1_high_band_net.from_torch(
                sd, "stg1_high_band_net."
            ),
            "stg2_low_band_net": self.stg2_low_band_net.from_torch(
                sd, "stg2_low_band_net.0."
            ),
            "stg2_low_squeeze": self.stg2_low_squeeze.from_torch(
                sd, "stg2_low_band_net.1."
            ),
            "stg2_high_band_net": self.stg2_high_band_net.from_torch(
                sd, "stg2_high_band_net."
            ),
            "stg3_full_band_net": self.stg3_full_band_net.from_torch(
                sd, "stg3_full_band_net."
            ),
        }
        for name in ("out", "aux_out"):
            w = np.asarray(sd[name + ".weight"])  # (O, I, 1, 1)
            v[name] = {"conv": jnp.asarray(
                np.array(w.transpose(2, 3, 1, 0), copy=True)
            )}
        return v

    def to_torch(self, v):
        out = {}
        self.stg1_low_band_net.to_torch(
            v["stg1_low_band_net"], "stg1_low_band_net.0.", out
        )
        self.stg1_low_squeeze.to_torch(
            v["stg1_low_squeeze"], "stg1_low_band_net.1.", out
        )
        self.stg1_high_band_net.to_torch(
            v["stg1_high_band_net"], "stg1_high_band_net.", out
        )
        self.stg2_low_band_net.to_torch(
            v["stg2_low_band_net"], "stg2_low_band_net.0.", out
        )
        self.stg2_low_squeeze.to_torch(
            v["stg2_low_squeeze"], "stg2_low_band_net.1.", out
        )
        self.stg2_high_band_net.to_torch(
            v["stg2_high_band_net"], "stg2_high_band_net.", out
        )
        self.stg3_full_band_net.to_torch(
            v["stg3_full_band_net"], "stg3_full_band_net.", out
        )
        for name in ("out", "aux_out"):
            out[name + ".weight"] = np.asarray(
                v[name]["conv"]
            ).transpose(3, 2, 0, 1)
        return out


def is_stat_leaf(path) -> bool:
    """True for batchnorm running-statistic leaves (non-trainable)."""
    last = path[-1].key if hasattr(path[-1], "key") else path[-1]
    return last in ("mean", "var")


def param_count(variables) -> int:
    """Trainable parameter count (excludes BN running stats)."""
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        if not is_stat_leaf(path):
            total += int(np.prod(leaf.shape))
    return total

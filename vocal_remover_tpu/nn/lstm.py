"""Bidirectional LSTM as a `lax.scan` time recurrence.

TPU-native replacement for the reference's cuDNN-backed `nn.LSTM`
(reference lib/layers.py:111-115). The input projection for all
timesteps is hoisted out of the recurrence into one large MXU matmul;
the scan carries only the (N, H) @ (H, 4H) hidden matmul. Gate order
follows torch: [input, forget, cell, output].

Parameters per direction (torch state_dict compatible):
  w_ih: (input, 4H)   — transpose of torch weight_ih_l0
  w_hh: (H, 4H)       — transpose of torch weight_hh_l0
  b_ih, b_hh: (4H,)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vocal_remover_tpu.nn import config, init


def init_direction(key, input_size: int, hidden: int):
    k = jax.random.split(key, 4)
    return {
        "w_ih": init.lstm_param(k[0], (input_size, 4 * hidden), hidden),
        "w_hh": init.lstm_param(k[1], (hidden, 4 * hidden), hidden),
        "b_ih": init.lstm_param(k[2], (4 * hidden,), hidden),
        "b_hh": init.lstm_param(k[3], (4 * hidden,), hidden),
    }


def init_bilstm(key, input_size: int, hidden: int):
    kf, kb = jax.random.split(key)
    return {
        "fwd": init_direction(kf, input_size, hidden),
        "bwd": init_direction(kb, input_size, hidden),
    }


def _scan_direction(p, x, reverse: bool, unroll: int = 4):
    """x: (T, N, In) -> (T, N, H)."""
    prec = config.get_precision()
    hidden = p["w_hh"].shape[0]
    xg = (
        jnp.einsum("tni,ih->tnh", x, p["w_ih"], precision=prec)
        + p["b_ih"]
        + p["b_hh"]
    )
    n = x.shape[1]
    h0 = jnp.zeros((n, hidden), x.dtype)
    c0 = jnp.zeros((n, hidden), x.dtype)

    def step(carry, xg_t):
        h, c = carry
        gates = xg_t + jnp.matmul(h, p["w_hh"], precision=prec)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, c0), xg, reverse=reverse, unroll=unroll)
    return hs


def bilstm(params, x, unroll: int = 4):
    """Bidirectional LSTM: (T, N, In) -> (T, N, 2H), zero initial state."""
    fwd = _scan_direction(params["fwd"], x, reverse=False, unroll=unroll)
    bwd = _scan_direction(params["bwd"], x, reverse=True, unroll=unroll)
    return jnp.concatenate([fwd, bwd], axis=-1)

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


def bilstm(params, x, unroll: int = 8):
    """Bidirectional LSTM: (T, N, In) -> (T, N, 2H), zero initial state.

    Both directions run in ONE `lax.scan`: the backward input is
    time-reversed and stacked on the batch axis, so each sequential step
    does a single (2N, H) @ (H, 4H) matmul instead of two scans — halves
    the serial critical path, the TPU's weak spot for recurrence.

    With `config.set_lstm_impl('pallas')`, dispatches to the fused
    Pallas kernel (nn/lstm_pallas.py) that runs the whole recurrence in
    one kernel with VMEM-resident state (inference paths only — no VJP).
    """
    if x.dtype != jnp.float64:  # f64 only in x64 parity-test mode
        x = x.astype(jnp.float32)  # the recurrence always runs f32 (tiny)
    if config.get_lstm_impl() == "pallas":
        from vocal_remover_tpu.nn.lstm_pallas import bilstm_pallas

        return bilstm_pallas(params, x)
    prec = config.get_precision()
    pf, pb = params["fwd"], params["bwd"]
    hidden = pf["w_hh"].shape[0]
    n = x.shape[1]

    # per-direction input projections for all timesteps (one MXU matmul)
    xg_f = (
        jnp.einsum("tni,ih->tnh", x, pf["w_ih"], precision=prec)
        + pf["b_ih"] + pf["b_hh"]
    )
    xg_b = (
        jnp.einsum("tni,ih->tnh", x[::-1], pb["w_ih"], precision=prec)
        + pb["b_ih"] + pb["b_hh"]
    )
    xg = jnp.concatenate([xg_f, xg_b], axis=1)  # (T, 2N, 4H)
    w_hh = jnp.stack([pf["w_hh"], pb["w_hh"]])  # (2, H, 4H)

    h0 = jnp.zeros((2 * n, hidden), x.dtype)
    c0 = jnp.zeros((2 * n, hidden), x.dtype)

    def step(carry, xg_t):
        h, c = carry
        hh = h.reshape(2, n, hidden)
        rec = jnp.einsum("dnh,dhg->dng", hh, w_hh, precision=prec)
        gates = xg_t + rec.reshape(2 * n, 4 * hidden)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, c0), xg, unroll=unroll)  # (T, 2N, H)
    fwd = hs[:, :n]
    bwd = hs[::-1, n:]
    return jnp.concatenate([fwd, bwd], axis=-1)

"""Pallas TPU kernel for the bidirectional LSTM recurrence.

The BiLSTM is the only serial computation in the model (SURVEY.md §7
"hard parts #1"). The `lax.scan` implementation (nn/lstm.py) pays XLA
while-loop overhead every timestep; this kernel runs the WHOLE
recurrence in a single `pallas_call`: the sequential grid dimension is
time, the (h, c) state lives in VMEM scratch across grid steps, and the
per-step work is one small MXU matmul + VPU gate math. The input
projection (the big matmul) stays in XLA where it belongs.

Used for inference paths (no custom VJP is defined — training keeps the
scan implementation, which JAX differentiates); selected via
`nn.config.set_lstm_impl('pallas')`. On non-TPU backends the kernel
runs in interpreter mode so unit tests exercise the same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vocal_remover_tpu.nn import config


def _make_cell_kernel(time_block: int):
    def kernel(xg_ref, whh_ref, out_ref, h_sc, c_sc):
        """`time_block` timesteps per grid iteration (statically
        unrolled in VMEM — amortizes the per-grid-step overhead that
        dominates this tiny recurrence).

        xg_ref: (TB, 2N, 4H) input projections (both directions stacked
                on the batch axis; backward pre-reversed in time)
        whh_ref: (2, H, 4H) recurrent weights per direction
        out_ref: (TB, 2N, H)
        h_sc, c_sc: (2N, H) VMEM state persisting across the time grid
        """
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            h_sc[:] = jnp.zeros_like(h_sc)
            c_sc[:] = jnp.zeros_like(c_sc)

        two_n, hidden = h_sc.shape
        n = two_n // 2

        h = h_sc[:]
        c = c_sc[:]
        for k in range(time_block):
            rec_f = jnp.dot(h[:n], whh_ref[0],
                            preferred_element_type=jnp.float32)
            rec_b = jnp.dot(h[n:], whh_ref[1],
                            preferred_element_type=jnp.float32)
            gates = xg_ref[k] + jnp.concatenate([rec_f, rec_b], axis=0)

            i = jax.nn.sigmoid(gates[:, :hidden])
            f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
            o = jax.nn.sigmoid(gates[:, 3 * hidden :])

            c = f * c + i * g
            h = o * jnp.tanh(c)
            out_ref[k] = h
        c_sc[:] = c
        h_sc[:] = h

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "time_block"))
def _run_recurrence(xg, w_hh, interpret=False, time_block=8):
    """xg: (T, 2N, 4H), w_hh: (2, H, 4H) -> hs (T, 2N, H)."""
    t_len, two_n, four_h = xg.shape
    hidden = four_h // 4
    while t_len % time_block:
        time_block //= 2
    return pl.pallas_call(
        _make_cell_kernel(time_block),
        grid=(t_len // time_block,),
        in_specs=[
            pl.BlockSpec((time_block, two_n, four_h), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hidden, four_h), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((time_block, two_n, hidden),
                               lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_len, two_n, hidden), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((two_n, hidden), jnp.float32),
            pltpu.VMEM((two_n, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xg, w_hh)


def bilstm_pallas(params, x):
    """Drop-in equivalent of nn/lstm.bilstm: (T, N, In) -> (T, N, 2H)."""
    prec = config.get_precision()
    pf, pb = params["fwd"], params["bwd"]
    n = x.shape[1]
    hidden = pf["w_hh"].shape[0]

    xg_f = (
        jnp.einsum("tni,ih->tnh", x, pf["w_ih"], precision=prec)
        + pf["b_ih"] + pf["b_hh"]
    )
    xg_b = (
        jnp.einsum("tni,ih->tnh", x[::-1], pb["w_ih"], precision=prec)
        + pb["b_ih"] + pb["b_hh"]
    )
    xg = jnp.concatenate([xg_f, xg_b], axis=1).astype(jnp.float32)
    w_hh = jnp.stack([pf["w_hh"], pb["w_hh"]]).astype(jnp.float32)

    interpret = jax.default_backend() == "cpu"
    hs = _run_recurrence(xg, w_hh, interpret=interpret)
    fwd = hs[:, :n]
    bwd = hs[::-1, n:]
    return jnp.concatenate([fwd, bwd], axis=-1)

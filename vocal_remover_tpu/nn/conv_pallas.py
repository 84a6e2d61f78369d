"""Fused Pallas TPU convolution for the serving path.

Why: the serving profile (BENCH_NOTES.md round 3) shows the mask
model's time goes to bandwidth-bound small-channel NHWC convolutions —
XLA runs each Conv2DBNActiv as several elementwise/fusion passes plus
layout copies, and with C in {8..64} the MXU's 128-lane dimension is
mostly padding. This kernel instead:

  * runs in channel-major (N, C, H, W) layout with W (the 256-frame
    time axis of a patch) in the lane dimension — full lanes at the
    shallow levels where the pixels are;
  * reduces over K = taps x Cin on the MXU via an in-VMEM im2col
    (for 3x3, K = 9*Cin: far better MXU K-utilization than lane-padded
    NHWC dots at these widths);
  * fuses bias add (the folded eval BatchNorm, models/serving.py) and
    the activation into the same VMEM pass, so each activation is read
    once from HBM and written once.

Stride-2 convolutions are handled by space-to-depth outside the kernel
(z[(pr, pc, c)][a, b] = x[c][2a + pr, 2b + pc]) plus a remapped static
tap table: out(i, j) needs input rows u in {2i-1, 2i, 2i+1}; writing
u = 2a + p and shifting a by the 1-row top/left zero pad gives taps
(phase p, offset) of (1,0), (0,1), (1,1) for dy = 0, 1, 2 — a 2x2
window over the half-resolution grid, same im2col kernel.

Reference contract: lib/layers.py:8-26 (Conv2DBNActiv); numerics match
the XLA path (tests/test_conv_pallas.py) — eval/serving only, no VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_conv_chw", "prepare_weights_s1", "prepare_weights_s2",
           "space_to_depth"]


def _act_fn(name):
    if name == "relu":
        return lambda v: jnp.maximum(v, 0.0)
    if name == "leaky_relu":
        return lambda v: jnp.where(v >= 0, v, 0.01 * v)
    if name in (None, "none", "identity"):
        return lambda v: v
    raise ValueError(f"unsupported fused activation {name!r}")


def prepare_weights_s1(w):
    """HWIO (kh, kw, Cin, Cout) kernel -> ((kh*kw*Cin, Cout) im2col
    matrix, tap table, pad). Rows ordered [(dy, dx) taps x Cin] to
    match the kernel's tap loop. Taps are (channel_block, dy, dx) with
    a single channel block covering the whole input."""
    kh, kw, cin, cout = w.shape
    taps = tuple((0, dy, dx) for dy in range(kh) for dx in range(kw))
    w2 = jnp.asarray(w).reshape(kh * kw * cin, cout)
    return w2, taps, (kh - 1, kw - 1)


def prepare_weights_s2(w):
    """HWIO (3, 3, Cin, Cout) stride-2 kernel -> im2col matrix over the
    space-to-depth input (4 phase blocks of Cin channels, ordered
    [(0,0), (0,1), (1,0), (1,1)]), 2x2-window taps, pad (1, 1)."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3), "stride-2 remap is for 3x3 kernels"

    # d=0 -> (phase 1, off 0), d=1 -> (0, 1), d=2 -> (1, 1); see module
    # docstring for the derivation
    PO = ((1, 0), (0, 1), (1, 1))
    taps = []
    rows = []
    for dy in range(3):
        for dx in range(3):
            (pr, offr), (pc, offc) = PO[dy], PO[dx]
            taps.append((pr * 2 + pc, offr, offc))
            rows.append(np.asarray(w[dy, dx]))  # (Cin, Cout)
    w2 = jnp.asarray(np.concatenate(rows, axis=0))  # (9*Cin, Cout)
    return w2, tuple(taps), (1, 1)


def space_to_depth(x):
    """(N, C, H, W) -> (N, 4*C, H//2, W//2), phase blocks ordered
    [(0,0), (0,1), (1,0), (1,1)] to match prepare_weights_s2."""
    n, c, h, w = x.shape
    x = x.reshape(n, c, h // 2, 2, w // 2, 2)
    x = jnp.transpose(x, (0, 3, 5, 1, 2, 4))  # (N, 2, 2, C, H/2, W/2)
    return x.reshape(n, 4 * c, h // 2, w // 2)


def _pick_tile(ho, wp, k_rows, c_total, cout, itemsize,
               budget=11 * 1024 * 1024):
    """Output rows per tile: fit the double-buffered input tiles and
    output tiles, the im2col scratch, and the f32 accumulator in a
    VMEM budget (hardware limit 16 MB)."""
    wp_al = -(-wp // 128) * 128
    per_row = (
        (k_rows + 2 * c_total) * wp_al * itemsize  # im2col + 2x input
        + cout * wp_al * (4 + 2 * itemsize)        # f32 acc + 2x out
    )
    th = max(1, int(budget // max(per_row, 1)))
    th = int(min(th, ho, 64))
    # Mosaic requires DMA slices and blocks 8-row aligned
    return max(8, (th // 8) * 8)


@functools.partial(
    jax.jit,
    static_argnames=("taps", "pad_hw", "act", "out_dtype", "interpret"),
)
def _conv_call(x, w2, b2, taps, pad_hw, act, out_dtype, interpret=False):
    """x: (N, C_total, H + ph, W + pw) zero-padded for the tap reach.
    w2: (len(taps) * cin_blk, Cout). Returns (N, Cout, Ho, Wo)."""
    n, c_total, hp, wp = x.shape
    ph, pw = pad_hw
    ho, wo = hp - ph, wp - pw
    k_rows, cout = w2.shape
    n_taps = len(taps)
    cin_blk = k_rows // n_taps
    assert cin_blk * n_taps == k_rows

    if wo % 128 != 0 and not interpret:
        # the im2col flatten (k, th, wo) -> (k, th*wo) is layout-free
        # only when wo fills whole lane groups; narrower layers (the
        # deep, small-W levels) stay on the XLA path
        raise ValueError(
            f"fused_conv_chw needs W % 128 == 0 on TPU (got {wo})"
        )
    th = _pick_tile(ho, wp, k_rows, c_total, cout, x.dtype.itemsize)
    n_tiles = -(-ho // th)
    ho_pad = n_tiles * th
    # HBM DMA slices must be 8-row aligned: fetch th + ceil8(ph) rows
    # (the tap loop reads only the first th + ph of them)
    rows_dma = th + ((ph + 7) // 8) * 8
    need = (n_tiles - 1) * th + rows_dma
    # lane dim of the DMA must be 128-aligned as well: fetch the full
    # (lane-padded) width, taps read only [dx, dx + wo)
    wp_al = -(-wp // 128) * 128
    if need > hp or wp_al != wp:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, max(0, need - hp)),
                        (0, wp_al - wp)))
    act_f = _act_fn(act)

    def kernel(x_hbm, w_ref, b_ref, o_hbm, xt, xp, ot, isem, osem):
        """Grid over batch; in-kernel tile loop with double-buffered
        input AND output DMAs so HBM traffic overlaps the im2col+dot —
        the non-overlapped variant measured at ~70 GB/s effective vs
        the chip's ~415 GB/s elementwise rate (BENCH_NOTES round 3)."""
        i = pl.program_id(0)

        def in_dma(slot, j):
            return pltpu.make_async_copy(
                x_hbm.at[i, :, pl.ds(j * th, rows_dma), :],
                xt.at[slot], isem.at[slot],
            )

        def out_dma(slot, j):
            return pltpu.make_async_copy(
                ot.at[slot],
                o_hbm.at[i, :, pl.ds(j * th, th), :],
                osem.at[slot],
            )

        in_dma(0, 0).start()

        def body(j, carry):
            slot = j % 2

            @pl.when(j + 1 < n_tiles)
            def _():
                in_dma((j + 1) % 2, j + 1).start()

            in_dma(slot, j).wait()
            for t, (cblk, dy, dx) in enumerate(taps):
                xp[t * cin_blk : (t + 1) * cin_blk] = xt[
                    slot,
                    cblk * cin_blk : (cblk + 1) * cin_blk,
                    dy : dy + th,
                    dx : dx + wo,
                ]
            acc = jax.lax.dot_general(
                w_ref[:],
                xp[:].reshape(k_rows, th * wo),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Cout, th*wo)
            y = act_f(acc + b_ref[:])

            @pl.when(j >= 2)  # this slot's previous output DMA
            def _():
                out_dma(slot, j - 2).wait()

            ot[slot] = y.reshape(cout, th, wo).astype(ot.dtype)
            out_dma(slot, j).start()
            return carry

        jax.lax.fori_loop(0, n_tiles, body, 0)

        @pl.when(n_tiles >= 2)
        def _():
            out_dma((n_tiles - 2) % 2, n_tiles - 2).wait()

        out_dma((n_tiles - 1) % 2, n_tiles - 1).wait()

    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k_rows, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, cout, ho_pad, wo), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, c_total, rows_dma, wp_al), x.dtype),
            pltpu.VMEM((k_rows, th, wo), x.dtype),
            pltpu.VMEM((2, cout, th, wo), out_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, w2, b2)
    return out[:, :, :ho, :] if ho_pad != ho else out


def fused_conv_chw(x, w2, b, taps, pad_hw, *, act="relu",
                   out_dtype=None, interpret=False):
    """Fused conv + bias + activation in (N, C, H, W) layout.

    Args:
      x: (N, C, H, W) input, NOT padded (this pads zeros for the taps).
      w2: (len(taps) * cin_blk, Cout) im2col weights from
        prepare_weights_* (same dtype as x).
      b: (Cout,) bias (the folded BatchNorm shift).
      taps: static tap table ((channel_block, dy, dx), ...).
      pad_hw: total tap reach beyond the output grid: (2, 2) for the
        stride-1 3x3 'same' form (split 1+1), (1, 1) for the s2d
        stride-2 form (top/left only).
      act: 'relu' | 'leaky_relu' | None.
    """
    ph, pw = pad_hw
    if (ph, pw) == (2, 2):
        cfg = ((0, 0), (0, 0), (1, 1), (1, 1))
    else:
        cfg = ((0, 0), (0, 0), (ph, 0), (pw, 0))
    xpad = jnp.pad(x, cfg)
    b2 = jnp.asarray(b, jnp.float32).reshape(-1, 1)
    return _conv_call(
        xpad, jnp.asarray(w2, x.dtype), b2, tuple(taps), (ph, pw), act,
        jnp.dtype(out_dtype or x.dtype), interpret,
    )

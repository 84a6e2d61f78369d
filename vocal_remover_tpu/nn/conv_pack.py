"""Pixel-packed flat-layout Pallas conv for the serving path.

Why another conv kernel: the im2col kernel (nn/conv_pallas.py) matched
XLA but never beat it — both are bound by the same in-VMEM data
movement: every 3x3 tap materializes a shifted copy of the input tile
(9x the input bytes through the VPU) before the MXU sees it, and XLA's
native NHWC conv additionally runs the MXU at K = Cin (a 32-channel
layer fills 32 of the 128 contraction lanes: 4x idle).

This kernel removes BOTH costs with a layout change instead of copies:

  * **Flat pixel packing.** NHWC `(N, H, W, C)` with `C <= 128` is
    viewed as `(N, H*WB, 128)` where each sublane row packs
    `pack = 128 // C` consecutive pixels: lane = (pixel_in_block,
    channel). This is a pure `reshape` of contiguous NHWC — zero-cost
    in HBM, in both directions, for every C in {8, 16, 32, 64, 128}.
    The MXU contraction dim is always the full 128 lanes.

  * **Taps as weight structure, not data movement.** A kw-tap reaches
    at most one block left/right, so the conv becomes, per kernel row
    `dy` and block shift `s in {-1, 0, +1}`, ONE dense matmul
    `acc_s += x_flat[dy*WB + m] @ W[dy, s]` with
    `W[dy, s][p_in*C + ci, p_out*Cout + co] = w[dy, dx, ci, co]`
    (q = p_out + dx - pad_left, s = q // pack, p_in = q % pack).
    Every operand slice starts at `dy*WB` — sublane-aligned (WB is a
    multiple of 8) — so the MXU reads the input tile IN PLACE: no
    im2col, no shifted copies, one DMA in and one DMA out per tile.

  * **Shifts on the output, once.** The +-1 block shifts land on the
    f32 accumulators (`out[m] = acc_-1[m-1] + acc_0[m] + acc_+1[m+1]`),
    two single-sublane-shifted adds per tile instead of nine shifted
    operand copies. Contributions that would wrap across an image row
    (block g-1 of g=0 / g+1 of g=WB-1 belong to the neighboring H row)
    are exactly the zero-padding taps of 'SAME' convolution, so a
    per-position `(m % WB)` mask zeroes them — no separator blocks, no
    extra M.

MXU cycle accounting for the flagship hot shape (Cin=32, Cout=64,
pack=4): 9 dense dots of (M x 128)x(128 x 256) = 25% of peak utilization
upper bound vs the ~10% XLA delivers on these layers (BENCH_NOTES.md
round 3 roofline) — with the VPU epilogue (2 shifted adds + masks +
bias + activation) an order of magnitude below the MXU time and DMA
fully overlapped.

Stride-2 convolutions route through a space-to-depth relayout (the one
real extra pass) and become a 2x2-window conv over 4C channels with
the same kernel. 1x1 convolutions are the degenerate single-tap case —
they gain the most (K 32 -> 128) and need no halo or masks at all.

Serving/eval only (no VJP). Reference contract: lib/layers.py:8-26
(Conv2DBNActiv); numerics vs the XLA path in tests/test_conv_pack.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flat_conv", "flat_conv_supported", "prepare_flat_weights",
           "space_to_depth_nhwc"]


def _act_fn(name):
    if name == "relu":
        return lambda v: jnp.maximum(v, 0.0)
    if name == "leaky_relu":
        return lambda v: jnp.where(v >= 0, v, 0.01 * v)
    if name in (None, "none", "identity"):
        return lambda v: v
    raise ValueError(f"unsupported fused activation {name!r}")


def space_to_depth_nhwc(x):
    """(N, H, W, C) -> (N, H//2, W//2, 4C), phase-major channel blocks
    ordered [(0,0), (0,1), (1,0), (1,1)] — turns a stride-2 3x3 conv
    into a stride-1 2x2-window conv (pad top/left 1) over 4C channels.
    """
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h // 2, w // 2, 4 * c)


def _window_taps(kh, kw, cin, cout, pad_t, pad_l, pack, w_np):
    """Build the per-(dy, s) dense weight matrices.

    w_np: (kh, kw, cin, cout) numpy kernel already in the flat-domain
    window form (for stride-2, the caller has folded the 3x3 kernel
    into a 2x2 window over 4C phase channels).

    Returns (taps, wst): taps = tuple of (dy, s) in wst order; wst =
    (n_taps, pack*cin, pack*cout) stacked matrices.
    """
    mats = {}
    for dy in range(kh):
        for dx in range(kw):
            for p_out in range(pack):
                q = p_out + dx - pad_l
                s, p_in = q // pack, q % pack
                key = (dy, s)
                if key not in mats:
                    mats[key] = np.zeros(
                        (pack * cin, pack * cout), np.float32
                    )
                mats[key][
                    p_in * cin : (p_in + 1) * cin,
                    p_out * cout : (p_out + 1) * cout,
                ] += w_np[dy, dx]
    taps = tuple(sorted(mats.keys()))
    wst = np.stack([mats[t] for t in taps])
    return taps, wst


def prepare_flat_weights(w, stride=1):
    """HWIO kernel -> (taps, wst, pad_t, window kh, cin_flat, cout).

    stride 1: 'SAME' 3x3/1x1 taps directly. stride 2: fold into the
    2x2 space-to-depth window (pair with space_to_depth_nhwc input).
    """
    w = np.asarray(w, np.float32)
    kh, kw, cin, cout = w.shape
    if stride == 1:
        pad_t = pad_l = (kh - 1) // 2
        return w, kh, kw, cin, pad_t, pad_l
    assert stride == 2 and (kh, kw) == (3, 3), "stride-2 remap is 3x3"
    # tap (dy) of the stride-2 'SAME' conv reads x[2i + dy - 1] =
    # z[phase pr][i + offr - 1] with (pr, offr) below; see
    # conv_pallas.prepare_weights_s2 for the derivation
    PO = ((1, 0), (0, 1), (1, 1))
    w4 = np.zeros((2, 2, 4 * cin, cout), np.float32)
    for dy in range(3):
        for dx in range(3):
            (pr, offr), (pc, offc) = PO[dy], PO[dx]
            w4[offr, offc, (pr * 2 + pc) * cin : (pr * 2 + pc + 1) * cin
               ] += w[dy, dx]
    return w4, 2, 2, 4 * cin, 1, 1


def flat_conv_supported(x_shape, w_shape, stride=1, dilation=1):
    """Static predicate: can flat_conv run this conv?"""
    if dilation not in (1, (1, 1)):
        return False
    if stride not in (1, 2, (1, 1), (2, 2)):
        return False
    st = stride if isinstance(stride, int) else stride[0]
    kh, kw, cin, cout = w_shape
    n, h, w, c = x_shape
    if c != cin:
        return False
    if st == 1 and (kh, kw) not in ((3, 3), (1, 1)):
        return False
    if st == 2 and ((kh, kw) != (3, 3) or h % 2 or w % 2):
        return False
    c_flat = c * (4 if st == 2 else 1)
    w_flat = w // st
    if c_flat > 128 or 128 % c_flat:
        return False
    pack = 128 // c_flat
    if w_flat % pack:
        return False
    wb = w_flat // pack
    # aligned operand slices need WB % 8 == 0; tiny widths not worth it
    return wb % 8 == 0


@functools.partial(
    jax.jit,
    static_argnames=("wb", "h", "taps", "kh", "act", "out_dtype",
                     "m_target", "interpret"),
)
def _flat_conv_call(xf, wst, b, *, wb, h, taps, kh, act, out_dtype,
                    m_target=1024, interpret=False):
    """xf: (N, H*WB, 128) flat input, UNPADDED. wst: (n_taps, 128, NL)
    per-(dy, s) matrices. b: (NL,) f32. Returns (N, H*WB, NL)."""
    n, hf, kl = xf.shape
    n_taps, klw, nl = wst.shape
    assert hf == h * wb and kl == 128 and klw == 128
    th = max(1, m_target // wb)          # output rows per tile
    m = th * wb
    n_tiles = -(-h // th)
    m_acc = m + 8                        # +1 lookahead for s=+1, 8-align
    rows_x = (th + kh - 1) * wb + 8      # operand reach + aligned tail
    pad_t = (kh - 1) // 2 if kh != 2 else 1  # 2x2 s2d window: top 1
    # top halo + bottom halo/tail so every tile's aligned DMA is in
    # bounds; one XLA pad pass (the only non-DMA HBM traffic here)
    need = (n_tiles - 1) * m + rows_x
    xp = jnp.pad(xf, ((0, 0), (pad_t * wb, max(0, need - pad_t * wb - hf)),
                      (0, 0)))
    act_f = _act_fn(act)
    s_list = sorted({s for _, s in taps})
    by_s = {s: [(dy, i) for i, (dy, sv) in enumerate(taps) if sv == s]
            for s in s_list}

    def kernel(x_hbm, w_ref, b_ref, o_hbm, xt, ot, isem, osem):
        i = pl.program_id(0)

        def in_dma(slot, j):
            return pltpu.make_async_copy(
                x_hbm.at[i, pl.ds(j * m, rows_x), :],
                xt.at[slot], isem.at[slot],
            )

        def out_dma(slot, j):
            return pltpu.make_async_copy(
                ot.at[slot],
                o_hbm.at[i, pl.ds(j * m, m), :],
                osem.at[slot],
            )

        in_dma(0, 0).start()

        # block index within the row, for the +-1 wrap masks
        g = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % wb

        def body(j, carry):
            slot = j % 2

            @pl.when(j + 1 < n_tiles)
            def _():
                in_dma((j + 1) % 2, j + 1).start()

            in_dma(slot, j).wait()
            xv = xt[slot]

            accs = {}
            for s in s_list:
                acc = None
                for dy, t_idx in by_s[s]:
                    d = jax.lax.dot_general(
                        jax.lax.slice(
                            xv, (dy * wb, 0), (dy * wb + m_acc, 128)
                        ),
                        w_ref[t_idx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = d if acc is None else acc + d
                accs[s] = acc  # (m_acc, NL) f32

            y = jax.lax.slice(accs[0], (0, 0), (m, nl)) \
                if 0 in accs else jnp.zeros((m, nl), jnp.float32)
            if 1 in accs:
                y = y + jnp.where(
                    g != wb - 1,
                    jax.lax.slice(accs[1], (1, 0), (m + 1, nl)), 0.0
                )
            if -1 in accs:
                lo = jnp.concatenate(
                    [jnp.zeros((1, nl), jnp.float32),
                     jax.lax.slice(accs[-1], (0, 0), (m - 1, nl))], 0
                )
                y = y + jnp.where(g != 0, lo, 0.0)
            y = act_f(y + b_ref[:])

            @pl.when(j >= 2)
            def _():
                out_dma(slot, j - 2).wait()

            ot[slot] = y.astype(ot.dtype)
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
            pl.BlockSpec((n_taps, 128, nl), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nl), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * m, nl), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows_x, 128), xf.dtype),
            pltpu.VMEM((2, m, nl), out_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wst, b.reshape(1, -1))
    return out[:, :hf, :] if n_tiles * m != hf else out


def flat_conv(x, w, b=None, *, stride=1, act=None, out_dtype=None,
              m_target=1024, interpret=False):
    """Fused conv + bias + activation, NHWC in / NHWC out.

    Args:
      x: (N, H, W, C) input. w: HWIO kernel ('SAME' geometry, 3x3 or
      1x1 stride 1, or 3x3 stride 2). b: (Cout,) bias (the folded
      BatchNorm shift) or None. act: 'relu' | 'leaky_relu' | None.
    Returns (N, H//stride, W//stride, Cout). Eval/serving only.
    """
    st = stride if isinstance(stride, int) else stride[0]
    assert flat_conv_supported(x.shape, w.shape, stride), (
        x.shape, w.shape, stride)
    n, h, wd, c = x.shape
    cout = w.shape[3]
    if st == 2:
        x = space_to_depth_nhwc(x)
        n, h, wd, c = x.shape
    wk, kh, kw, cin_flat, pad_t, pad_l = prepare_flat_weights(
        np.asarray(w), st
    )
    pack = 128 // cin_flat
    wb = wd // pack
    taps, wst = _window_taps(kh, kw, cin_flat, cout, pad_t, pad_l,
                             pack, wk)
    nl = pack * cout
    bias = np.zeros(cout, np.float32) if b is None else np.asarray(
        b, np.float32)
    xf = x.reshape(n, h * wb, 128)
    out = _flat_conv_call(
        xf, jnp.asarray(wst, x.dtype), jnp.asarray(np.tile(bias, pack)),
        wb=wb, h=h, taps=taps, kh=kh, act=act,
        out_dtype=jnp.dtype(out_dtype or x.dtype),
        m_target=m_target, interpret=interpret,
    )
    return out.reshape(n, h, wd, cout)

"""Pixel-packed flat-layout Pallas convs for the serving path.

Why another conv kernel: the im2col kernel (nn/conv_pallas.py) matched
XLA but never beat it — both are bound by the same in-VMEM data
movement: every 3x3 tap materializes a shifted copy of the input tile
(9x the input bytes through the VPU) before the MXU sees it, and XLA's
native NHWC conv additionally runs the MXU at K = Cin (a 32-channel
layer fills 32 of the 128 contraction lanes: 4x idle).

This kernel family removes BOTH costs with a layout change instead of
copies:

  * **Flat pixel packing.** A feature map lives as `(N, M, L)` where
    each sublane row packs P consecutive time-axis pixels:
    lane = (pixel_in_block, channel), M = H * WB, WB = W / P. For
    P = 128/C this is a pure reshape of contiguous NHWC. The MXU
    contraction dim is the full block (K = P*C).

  * **Taps as weight structure, not data movement.** A kw-tap reaches
    at most one block left/right, so the conv becomes, per kernel row
    tap and block shift `s in {-1, 0, +1}`, ONE dense matmul
    `acc += x_flat[m + off*WB] @ W[tap]` with
    `W[tap, s][p_in*C + ci, p_out*Cout + co] = w[dy, dx, ci, co]`.
    Every operand slice starts at `off*WB` — sublane-aligned (WB is a
    multiple of 8) — so the MXU reads the input tile IN PLACE: no
    im2col, no shifted copies, one DMA in and one DMA out per tile.

  * **Shifts on the output, once.** The +-1 block shifts land on the
    f32 accumulator (`out[m] = acc_-1[m-1] + acc_0[m] + acc_+1[m+1]`),
    two single-sublane-shifted adds per tile instead of nine shifted
    operand copies. Contributions that would wrap across an image row
    are exactly the zero-padding taps of 'SAME' convolution, so a
    per-position `(m % WB)` mask zeroes them.

  * **Stride 2 without relayout.** A stride-2 conv reads input rows
    `2a + dy - 1`: the input is viewed `(N, H/2, 2, WB, L)` — a free
    bitcast (the minor (WB, L) tile pair is unchanged) — and the
    kernel DMAs the two row-parity planes separately (full-row bursts,
    no bandwidth waste). Pixel stride is absorbed by packing the input
    at P_in = 2 * P_out, which is also exactly what keeps the packing
    optimal across channel-doubling encoder levels.

  * **Flat-to-flat chaining.** Kernel outputs stay flat; converting
    to/from XLA's NHWC (whose tiled layout pads C < 128 to full lanes)
    costs ~1 ms per 128 MB (measured), so conversions happen once per
    chain, not per conv.

Measured on the r03 hot shape (8,1024,256,C32->32): 23 TF/s useful
sustained in a flat-to-flat chain vs 4.8 TF/s for XLA's NHWC conv —
4.7x (BENCH_NOTES round 4). Serving/eval only (no VJP). Reference
contract: lib/layers.py:8-40; numerics vs XLA in
tests/test_conv_pack.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flat_conv", "flat_conv_supported", "build_flat_layer",
           "flat_layer_apply", "flat_geometry", "to_flat", "from_flat"]


def _act_fn(name):
    if name == "relu":
        return lambda v: jnp.maximum(v, 0.0)
    if name == "leaky_relu":
        return lambda v: jnp.where(v >= 0, v, 0.01 * v)
    if name in (None, "none", "identity"):
        return lambda v: v
    raise ValueError(f"unsupported fused activation {name!r}")


# ---------------------------------------------------------------------------
# host-side layer compiler: HWIO kernel -> flat tap matrices
# ---------------------------------------------------------------------------

def flat_geometry(kh, stride):
    """Static tap geometry for a 'SAME' conv: (rowtaps, s_list).
    Deterministic from (kh, stride) alone so the apply side can
    reconstruct it without touching the packed weight arrays."""
    if stride == 1:
        rowtaps = tuple((None, dy) for dy in range(kh))
        s_list = (0,) if kh == 1 else (-1, 0, 1)
    else:
        rowtaps = ((1, 0), (0, 1), (1, 1))
        s_list = (-1, 0)
    return rowtaps, s_list


def build_flat_layer(w, bias, p_out, stride=1, act="leaky_relu"):
    """Compile one Conv2DBNActiv to flat-kernel operands (host numpy).

    Args:
      w: HWIO (kh, kw, cin, cout) kernel, 'SAME' geometry (3x3 or 1x1
        stride 1; 3x3 stride 2).
      bias: (cout,) folded-BN shift (or None).
      p_out: output pixels per block. Input packing is implied:
        p_in = p_out * stride.
    Returns a dict with static geometry and the stacked tap matrices:
      {"wst": (n_rowtaps, p_in*cin, |s_list|*p_out*cout) f32,
       "bias": (p_out*cout,) f32, "rowtaps": ((plane, off), ...)
       (plane None for stride 1), "s_list", "p_in", "p_out", "stride",
       "act", "cin", "cout"}.
    """
    w = np.asarray(w, np.float32)
    kh, kw, cin, cout = w.shape
    p_in = p_out * stride
    if stride == 1:
        pad = (kh - 1) // 2
        rowtaps = tuple((None, dy) for dy in range(kh))

        def src(dy, dx, p):
            q = p + dx - pad
            return dy, q // p_in, q % p_in
    else:
        assert stride == 2 and (kh, kw) == (3, 3)
        # x row 2a+dy-1 with a top pad of 2 flat rows (x'[r] = x[r-2]):
        # even plane e[r] = x[2r-2], odd plane o[r] = x[2r-1] ->
        # dy=0: o[a] (plane1, off0); dy=1: e[a+1]; dy=2: o[a+1]
        rowtaps = ((1, 0), (0, 1), (1, 1))

        def src(dy, dx, p):
            q = 2 * p + dx - 1
            return dy, q // p_in, q % p_in

    mats = {}
    for dy in range(kh):
        for dx in range(kw):
            for p in range(p_out):
                t, s, p_src = src(dy, dx, p)
                key = (t, s)
                if key not in mats:
                    mats[key] = np.zeros(
                        (p_in * cin, p_out * cout), np.float32
                    )
                mats[key][
                    p_src * cin : (p_src + 1) * cin,
                    p * cout : (p + 1) * cout,
                ] += w[dy, dx]
    _, s_list = flat_geometry(kh, stride)
    assert {s for _, s in mats} <= set(s_list)
    nl = p_out * cout
    wst = np.zeros((kh, p_in * cin, len(s_list) * nl), np.float32)
    for (t, s), mat in mats.items():
        j = s_list.index(s)
        wst[t, :, j * nl : (j + 1) * nl] = mat
    b = np.zeros(cout, np.float32) if bias is None else np.asarray(
        bias, np.float32)
    return {
        "wst": wst, "bias": np.tile(b, p_out), "rowtaps": rowtaps,
        "s_list": s_list, "p_in": p_in, "p_out": p_out,
        "stride": stride, "act": act, "cin": cin, "cout": cout,
    }


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("wb", "h_out", "rowtaps", "s_list", "act",
                     "out_dtype", "m_target", "interpret"),
)
def _flat_conv_core(xf, wst, b, *, wb, h_out, rowtaps, s_list, act,
                    out_dtype, m_target=2048, interpret=False):
    """xf: stride 1: (N, H*WB + pads, L) flat, already top-padded by
    pad_t rows and bottom-padded for DMA reach. stride 2: the parity
    view (N, Hp/2, 2, WB, L) of the padded flat input.
    wst: (n_rowtaps, L, |s_list|*NL). Returns (N, H_out*WB, NL)."""
    parity = xf.ndim == 5
    n = xf.shape[0]
    l_in = xf.shape[-1]
    n_rt, klw, nst = wst.shape
    nl = nst // len(s_list)
    assert klw == l_in and n_rt == len(rowtaps)
    th = max(8, (m_target // wb) // 8 * 8)
    m = th * wb
    n_tiles = -(-h_out // th)
    m_acc = m + 8
    max_off = max(off for _, off in rowtaps)
    rows_x = (th + max_off) * wb + 8
    act_f = _act_fn(act)

    def kernel(x_hbm, w_ref, b_ref, o_hbm, xt, ot, isem, osem):
        i = pl.program_id(0)

        def in_dma(slot, j, pr):
            if parity:
                return pltpu.make_async_copy(
                    x_hbm.at[i, pl.ds(j * th, (rows_x + wb - 1) // wb),
                             pr, :, :],
                    xt.at[slot, pr], isem.at[slot, pr],
                )
            return pltpu.make_async_copy(
                x_hbm.at[i, pl.ds(j * m, rows_x), :],
                xt.at[slot, 0], isem.at[slot, 0],
            )

        planes = (0, 1) if parity else (0,)

        def start_in(slot, j):
            for pr in planes:
                in_dma(slot, j, pr).start()

        def wait_in(slot, j):
            for pr in planes:
                in_dma(slot, j, pr).wait()

        def out_dma(slot, j):
            return pltpu.make_async_copy(
                ot.at[slot],
                o_hbm.at[i, pl.ds(j * m, m), :],
                osem.at[slot],
            )

        start_in(0, 0)
        g = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % wb

        def body(j, carry):
            slot = j % 2

            @pl.when(j + 1 < n_tiles)
            def _():
                start_in((j + 1) % 2, j + 1)

            wait_in(slot, j)

            acc = None
            for t, (plane, off) in enumerate(rowtaps):
                xv = xt[slot, plane if parity else 0]
                if parity:
                    xv = xv.reshape(-1, l_in)
                d = jax.lax.dot_general(
                    jax.lax.slice(
                        xv, (off * wb, 0), (off * wb + m_acc, l_in)
                    ),
                    w_ref[t],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = d if acc is None else acc + d

            def block(s):
                jj = s_list.index(s)
                lo, hi = (1, m + 1) if s == 1 else (0, m) if s == 0 \
                    else (0, m - 1)
                v = jax.lax.slice(acc, (lo, jj * nl), (hi, (jj + 1) * nl))
                if s == -1:
                    v = jnp.concatenate(
                        [jnp.zeros((1, nl), jnp.float32), v], 0
                    )
                return v

            y = block(0) if 0 in s_list else jnp.zeros(
                (m, nl), jnp.float32)
            if 1 in s_list:
                y = y + jnp.where(g != wb - 1, block(1), 0.0)
            if -1 in s_list:
                y = y + jnp.where(g != 0, block(-1), 0.0)
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

    rows_p = (rows_x + wb - 1) // wb  # parity-plane rows per DMA
    xt_shape = (2, 2, rows_p, wb, l_in) if parity else (
        2, 1, rows_x, l_in)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(wst.shape, lambda i: (0,) * 3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nl), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * m, nl), out_dtype),
        scratch_shapes=[
            pltpu.VMEM(xt_shape, xf.dtype),
            pltpu.VMEM((2, m, nl), out_dtype),
            pltpu.SemaphoreType.DMA((2, 2) if parity else (2, 1)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xf, wst, b.reshape(1, -1))
    mf = h_out * wb
    return out[:, :mf, :] if n_tiles * m != mf else out


def flat_layer_apply(layer, xf, h, wb_out, *, out_dtype=None,
                     m_target=2048, interpret=False):
    """Apply a build_flat_layer product to a flat tensor.

    xf: (N, H*WB_in, L_in) with WB_in = wb_out * ... — for stride 1,
    WB_in == wb_out; for stride 2 the input has the same W in pixels
    but double pack, so WB_in == wb_out as well (W_in / p_in ==
    W_out / p_out). h: input H (rows). Returns
    (N, H_out * wb_out, p_out*cout), H_out = h // stride.
    """
    st = layer["stride"]
    wb = wb_out
    n, mf, l_in = xf.shape
    assert mf == h * wb, (mf, h, wb)
    assert l_in == layer["wst"].shape[1]
    wst = layer["wst"]
    if l_in % 128:
        # Mosaic scratch slices need full (8,128) lane tiles: pad the
        # skinny entry lanes (small-C enc1 inputs) to 128 and give the
        # weight matrices matching zero rows
        l_pad = -(-l_in // 128) * 128
        xf = jnp.pad(xf, ((0, 0), (0, 0), (0, l_pad - l_in)))
        wst = np.pad(np.asarray(wst),
                     ((0, 0), (0, l_pad - l_in), (0, 0))) \
            if isinstance(wst, np.ndarray) else jnp.pad(
                wst, ((0, 0), (0, l_pad - l_in), (0, 0)))
        l_in = l_pad
    h_out = h // st
    th = max(8, (m_target // wb) // 8 * 8)
    m = th * wb
    n_tiles = -(-h_out // th)
    max_off = max(off for _, off in layer["rowtaps"])
    rows_x = (th + max_off) * wb + 8
    if st == 1:
        pad_t = 1 if len(layer["rowtaps"]) == 3 else 0
        need = (n_tiles - 1) * m + rows_x
        xp = jnp.pad(
            xf, ((0, 0), (pad_t * wb, max(0, need - pad_t * wb - mf)),
                 (0, 0)))
    else:
        # top pad 2 rows (parity-preserving halo), bottom so every
        # plane DMA is in bounds; then the free parity bitcast
        rows_p = (rows_x + wb - 1) // wb
        need_half = (n_tiles - 1) * th + rows_p
        pad_b = max(0, 2 * need_half - 2 - h)
        if (h + 2 + pad_b) % 2:
            pad_b += 1
        xp = jnp.pad(xf, ((0, 0), (2 * wb, pad_b * wb), (0, 0)))
        xp = xp.reshape(n, (h + 2 + pad_b) // 2, 2, wb, l_in)
    return _flat_conv_core(
        xp, jnp.asarray(wst, xf.dtype),
        jnp.asarray(layer["bias"]),
        wb=wb, h_out=h_out, rowtaps=layer["rowtaps"],
        s_list=layer["s_list"], act=layer["act"],
        out_dtype=jnp.dtype(out_dtype or xf.dtype),
        m_target=m_target, interpret=interpret,
    )


# ---------------------------------------------------------------------------
# NHWC boundary helpers + single-conv wrapper (tests, simple callers)
# ---------------------------------------------------------------------------

def to_flat(x, p):
    """(N, H, W, C) -> (N, H*(W/p), p*C). Row-major reshape; at an XLA
    boundary this is a relayout (~1 ms / 128 MB measured) — do it once
    per chain, not per conv."""
    n, h, w, c = x.shape
    return x.reshape(n, h * (w // p), p * c)


def from_flat(xf, h, w, c):
    n = xf.shape[0]
    return xf.reshape(n, h, w, c)


def flat_conv_supported(x_shape, w_shape, stride=1, dilation=1):
    """Static predicate: can the flat kernel run this conv (via the
    NHWC wrapper, p_out = max(1, 128 // (cin*stride)))?"""
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
    p_out = max(1, 128 // (cin * st))
    p_in = p_out * st
    if w % p_in:
        return False
    if p_out * cout < 128:
        # output scratch lane dim must fill a (8,128) tile for the
        # out-DMA slices; channel-shrinking convs stay on XLA for now
        return False
    wb = (w // st) // p_out
    return wb % 8 == 0


def flat_conv(x, w, b=None, *, stride=1, act=None, out_dtype=None,
              m_target=2048, interpret=False):
    """Fused conv + bias + activation, NHWC in / NHWC out (pays the
    boundary relayout; for chains use build_flat_layer +
    flat_layer_apply on flat tensors directly).
    """
    st = stride if isinstance(stride, int) else stride[0]
    assert flat_conv_supported(x.shape, w.shape, stride), (
        x.shape, w.shape, stride)
    n, h, wd, c = x.shape
    cout = w.shape[3]
    p_out = max(1, 128 // (c * st))
    layer = build_flat_layer(np.asarray(w), b, p_out, st,
                             act=act)
    xf = to_flat(x, layer["p_in"])
    out = flat_layer_apply(layer, xf, h, (wd // st) // p_out,
                           out_dtype=out_dtype, m_target=m_target,
                           interpret=interpret)
    return from_flat(out, h // st, wd // st, cout)

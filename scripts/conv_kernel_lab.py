#!/usr/bin/env python
"""Conv kernel architecture lab: measured candidates to break the
small-channel conv plateau (BENCH_NOTES round 3: the im2col kernel and
XLA both sit at 10-12.6 TF/s on (8,32,1024,256) vs a 119 TF/s MXU and
415 GB/s HBM — the gap is in-VMEM data movement, the 9 lane/sublane
tap copies feeding the MXU).

Candidates (all channel-major (N, C, H, W), fused bias+act, stride 1):
  A  baseline: in-VMEM im2col (9 VPU tap copies) + one K=9*Cin dot
     (nn/conv_pallas.py, double-buffered DMAs).
  C  output-shift: ONE sublane stack (3*Cin rows: dy in {0,1,2}) built
     with 3 VPU copies, then 3 dots (one per dx, K=3*Cin) on the
     UNSHIFTED full-width stack; the dx alignment happens on the
     output side as 3 lane-offset slice-adds of the (Cout, th, W)
     partials. VPU traffic: 3 input copies + 3 output adds vs 9 input
     copies.
  D  tap-dot: no scratch at all — 9 accumulating K=Cin dots on
     sublane/lane OFFSET VIEWS of the resident input tile (tests
     whether Mosaic feeds the MXU from offset views without
     materializing; if it materializes, this degenerates to A with
     smaller dots).

Run (real TPU):  python scripts/conv_kernel_lab.py [--shapes ...]
Each candidate runs as a scan chain of identical layers so one
dispatch amortizes the tunnel RTT; numerics are checked against the
XLA conv before timing.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _geometry(x_shape, dtype, th=32):
    """(n, c, hp, wp_al, th, n_tiles, rows_dma, ho, wo, ph) for a
    'SAME' 3x3 stride-1 conv tiled into th output rows."""
    n, c, h, w = x_shape
    ph, pw = 2, 2
    ho, wo = h, w
    wp_al = -(-(w + pw) // 128) * 128
    n_tiles = -(-ho // th)
    rows_dma = th + ((ph + 7) // 8) * 8
    return (n, c, h + ph, wp_al, th, n_tiles, rows_dma, ho, wo, ph)


def _pad_input(x, geom):
    """zero-pad (N,C,H,W) -> (N,C,need_h,wp_al): 1 top/left ('SAME'),
    the rest tail padding for aligned tile DMAs."""
    import jax.numpy as jnp

    (n, c, hp, wp_al, th, n_tiles, rows_dma, ho, wo, ph) = geom
    need_h = (n_tiles - 1) * th + rows_dma
    return jnp.pad(
        jnp.asarray(x),
        ((0, 0), (0, 0), (1, max(0, need_h - ho - 1)),
         (1, wp_al - wo - 1)))


# --------------------------------------------------------------------
# candidate C: output-shift (3 sublane copies, 3 dots, 3 shifted adds)

def build_call_c():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @functools.partial(jax.jit,
                       static_argnames=("geom", "act", "out_dtype"))
    def call(x, w2, b2, geom, act, out_dtype):
        (n, c, hp, wp_al, th, n_tiles, rows_dma, ho, wo, ph) = geom
        cout = b2.shape[0]

        def act_f(v):
            return jnp.where(v >= 0, v, 0.01 * v) if act else v

        def kernel(x_hbm, w_ref, b_ref, o_hbm, xt, ot, xs, isem, osem):
            i = pl.program_id(0)

            def in_dma(slot, j):
                return pltpu.make_async_copy(
                    x_hbm.at[i, :, pl.ds(j * th, rows_dma), :],
                    xt.at[slot], isem.at[slot])

            def out_dma(slot, j):
                return pltpu.make_async_copy(
                    ot.at[slot], o_hbm.at[i, :, pl.ds(j * th, th), :],
                    osem.at[slot])

            in_dma(0, 0).start()

            def body(j, carry):
                slot = j % 2

                @pl.when(j + 1 < n_tiles)
                def _():
                    in_dma((j + 1) % 2, j + 1).start()

                in_dma(slot, j).wait()
                for dy in range(3):
                    xs[dy * c:(dy + 1) * c] = xt[slot, :, dy:dy + th, :]
                flat = xs[:].reshape(3 * c, th * wp_al)
                acc = None
                for dx in range(3):
                    p = jax.lax.dot_general(
                        w_ref[dx * 3 * c:(dx + 1) * 3 * c, :], flat,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(cout, th, wp_al)[:, :, dx:dx + wo]
                    acc = p if acc is None else acc + p
                y = act_f(acc + b_ref[:].reshape(cout, 1, 1))

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
                pl.BlockSpec((w2.shape[0], cout), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cout, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(
                (n, cout, n_tiles * th, wo), jnp.dtype(out_dtype)),
            scratch_shapes=[
                pltpu.VMEM((2, c, rows_dma, wp_al), x.dtype),
                pltpu.VMEM((2, cout, th, wo), jnp.dtype(out_dtype)),
                pltpu.VMEM((3 * c, th, wp_al), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(x, w2, b2)
        return out[:, :, :ho, :]

    return call


def weights_c(wk, dtype):
    """HWIO (3,3,cin,cout) -> (3*3*cin, cout) rows ordered [dx][dy][ci]."""
    import jax.numpy as jnp

    kh, kw, cin, cout = wk.shape
    rows = []
    for dx in range(3):
        for dy in range(3):
            rows.append(np.asarray(wk[dy, dx]))
    return jnp.asarray(np.concatenate(rows, 0), dtype)


# --------------------------------------------------------------------
# candidate D: 9 accumulating tap dots on offset views

def build_call_d():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @functools.partial(jax.jit,
                       static_argnames=("geom", "act", "out_dtype"))
    def call(x, w2, b2, geom, act, out_dtype):
        (n, c, hp, wp_al, th, n_tiles, rows_dma, ho, wo, ph) = geom
        cout = b2.shape[0]

        def act_f(v):
            return jnp.where(v >= 0, v, 0.01 * v) if act else v

        def kernel(x_hbm, w_ref, b_ref, o_hbm, xt, ot, isem, osem):
            i = pl.program_id(0)

            def in_dma(slot, j):
                return pltpu.make_async_copy(
                    x_hbm.at[i, :, pl.ds(j * th, rows_dma), :],
                    xt.at[slot], isem.at[slot])

            def out_dma(slot, j):
                return pltpu.make_async_copy(
                    ot.at[slot], o_hbm.at[i, :, pl.ds(j * th, th), :],
                    osem.at[slot])

            in_dma(0, 0).start()

            def body(j, carry):
                slot = j % 2

                @pl.when(j + 1 < n_tiles)
                def _():
                    in_dma((j + 1) % 2, j + 1).start()

                in_dma(slot, j).wait()
                acc = None
                for t in range(9):
                    dy, dx = t // 3, t % 3
                    v = xt[slot, :, dy:dy + th, dx:dx + wo]
                    p = jax.lax.dot_general(
                        w_ref[t * c:(t + 1) * c, :],
                        v.reshape(c, th * wo),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = p if acc is None else acc + p
                y = act_f(acc + b_ref[:])

                @pl.when(j >= 2)
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
                pl.BlockSpec((w2.shape[0], cout), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((cout, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(
                (n, cout, n_tiles * th, wo), jnp.dtype(out_dtype)),
            scratch_shapes=[
                pltpu.VMEM((2, c, rows_dma, wp_al), x.dtype),
                pltpu.VMEM((2, cout, th, wo), jnp.dtype(out_dtype)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(x, w2, b2)
        return out[:, :, :ho, :]

    return call


def weights_d(wk, dtype):
    """rows ordered [(dy,dx)][ci] (same as im2col baseline)."""
    import jax.numpy as jnp

    kh, kw, cin, cout = wk.shape
    return jnp.asarray(np.asarray(wk).reshape(9 * cin, cout), dtype)


# --------------------------------------------------------------------

def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--len", type=int, default=16, dest="length")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--repeat", type=int, default=4)
    p.add_argument("--th", type=int, default=32)
    p.add_argument("--variants", type=str, default="A,C,D")
    p.add_argument("--shapes", type=str,
                   default="8,32,1024,256;8,64,512,128")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vocal_remover_tpu import enable_compile_cache
    from vocal_remover_tpu.nn.conv_pallas import (
        fused_conv_chw, prepare_weights_s1)

    enable_compile_cache()
    dt = jnp.dtype(args.dtype)
    L = args.length
    call_c = build_call_c()
    call_d = build_call_d()

    for spec in args.shapes.split(";"):
        n, c, h, w = (int(v) for v in spec.split(","))
        print(f"=== shape (N={n}, C={c}, H={h}, W={w}) {args.dtype} ===")
        rng = np.random.default_rng(0)
        x0 = (rng.standard_normal((n, c, h, w)) * 0.1).astype(np.float32)
        wk = (rng.standard_normal((3, 3, c, c)) * 0.05).astype(np.float32)
        b = (rng.standard_normal(c) * 0.01).astype(np.float32)
        flops = 2 * 9 * c * c * n * h * w

        # XLA reference for numerics
        ref = jax.jit(lambda x, k, b: jnp.where(
            (y := jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NCHW", "HWIO", "NCHW"))
             + b[None, :, None, None]) >= 0, y, 0.01 * y))(
            x0, wk, b)

        geom = _geometry((n, c, h, w), dt, th=args.th)

        def chain(callable_, xpadded, w2, b2):
            @jax.jit
            def run(x, w2, b2):
                def step(carry, _):
                    y = callable_(carry, w2, b2, geom, True, dt)
                    return _pad_input(y, geom), None
                out, _ = jax.lax.scan(step, x, None, length=L)
                return out
            return run

        variants = {}
        if "A" in args.variants:
            w2a, taps, pad = prepare_weights_s1(wk)

            @jax.jit
            def run_a(x, w2, b2):
                def step(carry, _):
                    return fused_conv_chw(
                        carry, w2, b2, taps, pad, act="leaky_relu",
                        out_dtype=dt), None
                out, _ = jax.lax.scan(step, x, None, length=L)
                return out
            variants["A im2col (baseline)"] = (
                run_a, jnp.asarray(x0, dt), jnp.asarray(w2a, dt),
                jnp.asarray(b))
        if "C" in args.variants:
            variants["C output-shift"] = (
                chain(call_c, None, None, None),
                _pad_input(jnp.asarray(x0, dt), geom),
                weights_c(wk, dt),
                jnp.asarray(b, jnp.float32).reshape(-1, 1))
        if "D" in args.variants:
            variants["D tap-dots"] = (
                chain(call_d, None, None, None),
                _pad_input(jnp.asarray(x0, dt), geom),
                weights_d(wk, dt),
                jnp.asarray(b, jnp.float32).reshape(-1, 1))

        for name, (run, xin, w2, b2) in variants.items():
            try:
                out = np.asarray(run(xin, w2, b2), np.float32)
            except Exception as e:
                print(f"{name:24s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}")
                continue
            # numerics: single-layer check
            if name.startswith("A"):
                one = fused_conv_chw(
                    jnp.asarray(x0, dt), w2, b2, taps, pad,
                    act="leaky_relu", out_dtype=dt)
            elif name.startswith("C"):
                one = call_c(_pad_input(jnp.asarray(x0, dt), geom),
                             w2, b2, geom, True, dt)
            else:
                one = call_d(_pad_input(jnp.asarray(x0, dt), geom),
                             w2, b2, geom, True, dt)
            err = float(np.max(np.abs(
                np.asarray(one, np.float32) - np.asarray(ref))))
            scale = float(np.max(np.abs(np.asarray(ref))))
            best = 1e9
            for _ in range(args.repeat):
                t0 = time.perf_counter()
                jax.block_until_ready(run(xin, w2, b2))
                best = min(best, time.perf_counter() - t0)
            ms = best / L * 1e3
            print(f"{name:24s} {ms:7.2f} ms/conv  "
                  f"{flops / (ms * 1e-3) / 1e12:6.2f} TF/s   "
                  f"maxerr={err:.2e} (scale {scale:.1f})")


if __name__ == "__main__":
    main()

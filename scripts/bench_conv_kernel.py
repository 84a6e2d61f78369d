#!/usr/bin/env python
"""Fused Pallas conv vs XLA NHWC conv on the real TPU.

Runs a scan-chain of identical conv+bias+act layers (so one dispatch
amortizes the tunnel RTT) for both implementations and prints ms/conv.
Shapes model the serving hot loop's shallow levels.

Usage: python scripts/bench_conv_kernel.py [--len 16] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--len", type=int, default=16, dest="length")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--repeat", type=int, default=4)
    p.add_argument("--shapes", type=str,
                   default="8,32,1024,256;8,64,512,128")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vocal_remover_tpu import enable_compile_cache
    from vocal_remover_tpu.nn import functional as F
    from vocal_remover_tpu.nn.conv_pallas import (
        fused_conv_chw,
        prepare_weights_s1,
    )

    enable_compile_cache()
    dt = jnp.dtype(args.dtype)
    L = args.length

    for spec in args.shapes.split(";"):
        n, c, h, w = (int(v) for v in spec.split(","))
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((n, c, h, w)) * 0.1).astype(np.float32)
        wk = (rng.standard_normal((3, 3, c, c)) * 0.05).astype(np.float32)
        b = (rng.standard_normal(c) * 0.01).astype(np.float32)
        w2, taps, pad = prepare_weights_s1(wk)
        w2 = jnp.asarray(w2, dt)
        wk_d = jnp.asarray(wk, dt)
        b_d = jnp.asarray(b)

        @jax.jit
        def chain_pallas(x0, w2, b):
            def step(carry, _):
                y = fused_conv_chw(carry, w2, b, taps, pad,
                                   act="leaky_relu")
                return y, ()
            y, _ = jax.lax.scan(step, x0, None, length=L)
            return y

        @jax.jit
        def chain_xla(x0, wk, b):
            def step(carry, _):
                y = F.conv2d(carry, wk, stride=1, padding=1)
                y = y + b[None, None, None, :].astype(y.dtype)
                y = jnp.where(y >= 0, y, 0.01 * y)
                return y.astype(x0.dtype), ()
            y, _ = jax.lax.scan(step, x0, None, length=L)
            return y

        @jax.jit
        def chain_xla_nchw(x0, wk, b):
            # same conv via NCHW/OIHW dimension numbers
            w_oihw = jnp.transpose(wk, (3, 2, 0, 1))

            def step(carry, _):
                y = jax.lax.conv_general_dilated(
                    carry, w_oihw, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                )
                y = y + b[None, :, None, None].astype(y.dtype)
                y = jnp.where(y >= 0, y, 0.01 * y)
                return y.astype(x0.dtype), ()
            y, _ = jax.lax.scan(step, x0, None, length=L)
            return y

        @jax.jit
        def chain_xla_taps(x0, wk, b):
            # conv as 9 shifted (M, Cin) @ (Cin, Cout) dots in NHWC
            def step(carry, _):
                nb, hh, ww, cc = carry.shape
                xp = jnp.pad(carry, ((0, 0), (1, 1), (1, 1), (0, 0)))
                acc = None
                for dy in range(3):
                    for dx in range(3):
                        xs = jax.lax.slice(
                            xp, (0, dy, dx, 0),
                            (nb, dy + hh, dx + ww, cc),
                        )
                        d = jnp.einsum(
                            "nhwc,cd->nhwd", xs, wk[dy, dx],
                            preferred_element_type=jnp.float32,
                        )
                        acc = d if acc is None else acc + d
                y = acc + b[None, None, None, :]
                y = jnp.where(y >= 0, y, 0.01 * y)
                return y.astype(x0.dtype), ()
            y, _ = jax.lax.scan(step, x0, None, length=L)
            return y

        x_chw = jax.device_put(jnp.asarray(x, dt))
        x_nhwc = jax.device_put(jnp.asarray(
            np.transpose(x, (0, 2, 3, 1)), dt))

        tiny = jax.jit(lambda a: jnp.sum(a[:1, :1, :1, :8]))

        for name, fn, xin, warg in (
            ("pallas  ", chain_pallas, x_chw, w2),
            ("xla     ", chain_xla, x_nhwc, wk_d),
            ("xla_nchw", chain_xla_nchw, x_chw, wk_d),
            ("xla_taps", chain_xla_taps, x_nhwc, wk_d),
        ):
            out = fn(xin, warg, b_d)
            np.asarray(tiny(out))  # compile+sync (no bulk download)
            t0 = time.time()
            for _ in range(args.repeat):
                out = fn(xin, warg, b_d)
            np.asarray(tiny(out))
            per = (time.time() - t0) / (args.repeat * L) * 1e3
            gb = 2 * x.size * jnp.dtype(dt).itemsize / 1e9
            fl = 2 * 9 * n * h * w * c * c
            print(f"({n},{c},{h},{w}) {name}: {per:7.3f} ms/conv  "
                  f"{gb / (per / 1e3):6.0f} GB/s  "
                  f"{fl / (per / 1e3) / 1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()

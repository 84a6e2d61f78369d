#!/usr/bin/env python
"""Pixel-packed flat conv (nn/conv_pack.py) vs XLA on the serving conv
shapes — does removing the im2col copies and filling the 128-lane MXU
contraction beat the small-channel plateau (VERDICT r03 #2)?

Methodology matches scripts/conv_kernel_lab.py: scan-chained single
dispatches so the tunnel RTT amortizes; numerics checked against XLA
before timing; comparisons within one run are like-for-like.

Run (real TPU): python scripts/bench_conv_pack.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (N, H, W, C, Cout, stride) serving conv shape classes of the flagship
# CascadedNet at crop 256 / 1024 (stg3 BaseNet encoders + a 1x1)
SHAPES = (
    (8, 1024, 256, 32, 32, 1),    # enc1 conv2 class (the r03 hot shape)
    (8, 512, 128, 64, 64, 1),     # enc2 conv2
    (8, 1024, 256, 32, 64, 2),    # enc2 conv1 (strided)
    (8, 512, 128, 64, 128, 2),    # enc3 conv1 (strided)
    (8, 256, 64, 128, 128, 1),    # enc3 conv2
    (4, 1024, 1024, 32, 32, 1),   # wide-crop enc1 conv2
)
L = 6  # chain length


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--m_target", type=int, default=1024)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from vocal_remover_tpu import enable_compile_cache
    from vocal_remover_tpu.nn.conv_pack import flat_conv

    enable_compile_cache(".jax_bench_cache")
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    def med(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            f()
            ts.append(time.time() - t0)
        return sorted(ts)[reps // 2]

    for n, h, w, c, cout, st in SHAPES:
        rng = np.random.default_rng(c + cout)
        x = (rng.standard_normal((n, h, w, c)) * 0.5).astype(np.float32)
        wk = (rng.standard_normal((3, 3, c, cout)) * 0.1).astype(
            np.float32)
        b = (rng.standard_normal(cout) * 0.1).astype(np.float32)

        xd = jax.device_put(jnp.asarray(x, dt))
        wk_d = jax.device_put(jnp.asarray(wk, dt))
        b_d = jax.device_put(jnp.asarray(b))

        def xla_conv(xi):
            y = lax.conv_general_dilated(
                xi, wk_d.astype(xi.dtype), (st, st), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = y + b_d.astype(y.dtype)
            return jnp.where(y >= 0, y, 0.01 * y).astype(xi.dtype)

        def pack_conv(xi):
            return flat_conv(xi, wk, b, stride=st, act="leaky_relu",
                             m_target=args.m_target)

        # numerics check
        ref = np.asarray(jax.jit(xla_conv)(xd)).astype(np.float32)
        got = np.asarray(jax.jit(pack_conv)(xd)).astype(np.float32)
        scale = max(np.abs(ref).max(), 1e-6)
        err = np.abs(ref - got).max() / scale
        tol = 0.05 if args.dtype == "bf16" else 1e-4
        tag = "OK" if err < tol else f"MISMATCH({err:.2e})"

        # chained timing: L layers; output perturbs next input so XLA
        # can't hoist; shapes kept closed by a renorm back to x's dims
        def chain(fn):
            @jax.jit
            def run(x0):
                def step(carry, _):
                    y = fn(carry)
                    c2 = carry * 0.999 + jnp.mean(y).astype(
                        carry.dtype) * 0.001
                    return c2, jnp.sum(y[:1, :1, :1, :1])
                _, outs = lax.scan(step, x0, None, length=L)
                return outs
            return run

        flops = 2 * 9 * c * cout * (h // st) * (w // st) * n
        row = f"({n},{h},{w},{c}->{cout},s{st})"
        for name, fn in (("xla ", xla_conv), ("pack", pack_conv)):
            try:
                r = chain(fn)
                np.asarray(r(xd))  # compile + warm
                per = med(lambda: np.asarray(r(xd))) / L
                print(
                    f"{row:>26s} {name}: {per * 1e3:7.2f} ms "
                    f"{flops / per / 1e12:6.2f} TF/s  [{tag}]",
                    flush=True,
                )
            except Exception as e:
                print(f"{row:>26s} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measure int8 MXU throughput and an int8 im2col conv on the serving
hot-loop shape — the "precision halves the relayout bytes" lever the
conv-kernel lab left as the remaining path past the small-channel
plateau (BENCH_NOTES.md, kernel-architecture lab).

Methodology matches bench_roofline.py / conv_kernel_lab.py: chained
single-dispatch scans so the tunnel RTT amortizes; comparisons within
one run are like-for-like.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, x, reps=4, label=""):
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda a: jnp.sum(a[:1, ...].astype(jnp.float32)))
    np.asarray(tiny(fn(x)))          # compile + warm
    t0 = time.time()
    out = x
    for _ in range(reps):
        out = fn(x)
    np.asarray(tiny(out))
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from vocal_remover_tpu import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    L = 8

    # ---- square matmul chains: bf16 vs int8 --------------------------
    # m=2048 keeps the compile cheap; the chain amortizes dispatch, and
    # 2048^3 dots are already far past the MXU's compute-bound knee.
    m = 2048
    for name, dt in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
        if dt == jnp.int8:
            a = jax.device_put(jnp.asarray(
                rng.integers(-100, 100, (m, m)), jnp.int8))
        else:
            a = jax.device_put(jnp.asarray(
                rng.standard_normal((m, m)) * 0.01, dt))

        @jax.jit
        def chain(a0, dt=dt):
            def step(c, _):
                if dt == jnp.int8:
                    d = lax.dot(c, c, preferred_element_type=jnp.int32)
                    # requantize so the chain stays int8 (realistic
                    # quantized-serving shape: shift + saturate)
                    c2 = jnp.clip(d >> 8, -127, 127).astype(jnp.int8)
                else:
                    c2 = lax.dot(c, c,
                                 preferred_element_type=jnp.float32
                                 ).astype(dt)
                return c2, ()
            y, _ = lax.scan(step, a0, None, length=L)
            return y

        try:
            print(f"matmul {name}: compiling...", flush=True)
            per = timeit(chain, a) / L
            tops = 2 * m ** 3 / per / 1e12
            print(f"matmul {name} {m}x{m}: {per * 1e3:7.2f} ms  "
                  f"{tops:6.1f} T{'OP' if name == 'int8' else 'F'}/s",
                  flush=True)
        except Exception as e:
            print(f"matmul {name}: UNSUPPORTED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)

    # ---- serving hot conv shape as im2col dot: bf16 vs int8 ----------
    # (8, 32, 1024, 256) NHWC-ish: batch 8, C 32, F 1024, T 256; 3x3.
    B, C, H, W = 8, 32, 1024, 256
    K = 3 * 3 * C
    x_f = rng.standard_normal((B * H * W, K)).astype(np.float32)
    w_f = (rng.standard_normal((K, C)) * 0.05).astype(np.float32)
    for name, dt in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
        if dt == jnp.int8:
            xx = jax.device_put(jnp.asarray(
                np.clip(np.round(x_f * 40), -127, 127), jnp.int8))
            ww = jax.device_put(jnp.asarray(
                np.clip(np.round(w_f * 300), -127, 127), jnp.int8))
        else:
            xx = jax.device_put(jnp.asarray(x_f, dt))
            ww = jax.device_put(jnp.asarray(w_f, dt))

        @jax.jit
        def conv_chain(x0, w0=ww, dt=dt):
            def step(_, xi):
                if dt == jnp.int8:
                    d = lax.dot(xi, w0,
                                preferred_element_type=jnp.int32)
                    return None, jnp.sum(d, dtype=jnp.int32)
                d = lax.dot(xi, w0,
                            preferred_element_type=jnp.float32)
                return None, jnp.sum(d, dtype=jnp.float32)
            xs = x0.reshape(L // 2, -1, K)
            _, outs = lax.scan(step, None, xs)
            return outs

        try:
            print(f"im2col-dot {name}: compiling...", flush=True)
            per = timeit(conv_chain, xx) / (L // 2)
            flops = 2 * (B * H * W // (L // 2)) * K * C
            print(f"im2col-dot {name} (hot conv shape): "
                  f"{per * 1e3:7.2f} ms/slice  "
                  f"{flops / per / 1e12:6.1f} T/s", flush=True)
        except Exception as e:
            print(f"im2col-dot {name}: UNSUPPORTED "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)


if __name__ == "__main__":
    main()

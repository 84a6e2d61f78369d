#!/usr/bin/env python
"""Measure this chip's achievable HBM bandwidth and MXU throughput —
the roofline that bounds every other optimization.

Chained elementwise pass over a large array (reads+writes 2x size) and
a chained large square matmul, one dispatch each.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from vocal_remover_tpu import enable_compile_cache

    enable_compile_cache()
    L = 16
    rng = np.random.default_rng(0)

    for dt, mb in ((jnp.bfloat16, 256), (jnp.float32, 256)):
        n = mb * 1024 * 1024 // jnp.dtype(dt).itemsize // 256
        x = jax.device_put(jnp.asarray(
            rng.standard_normal((n, 256)), dt))

        @jax.jit
        def chain(x0):
            def step(c, _):
                return c * 1.0001 + 0.001, ()
            y, _ = jax.lax.scan(step, x0, None, length=L)
            return y

        tiny = jax.jit(lambda a: jnp.sum(a[:1, :8]))
        np.asarray(tiny(chain(x)))
        t0 = time.time()
        for _ in range(4):
            out = chain(x)
        np.asarray(tiny(out))
        per = (time.time() - t0) / (4 * L)
        bw = 2 * x.size * jnp.dtype(dt).itemsize / per / 1e9
        print(f"elementwise {jnp.dtype(dt).name} {mb}MB: "
              f"{per * 1e3:6.2f} ms/pass  {bw:6.0f} GB/s", flush=True)

    for dt, m in ((jnp.bfloat16, 4096), (jnp.float32, 2048)):
        a = jax.device_put(jnp.asarray(
            rng.standard_normal((m, m)) * 0.01, dt))

        @jax.jit
        def mm_chain(a0):
            def step(c, _):
                y = jnp.dot(c, c, preferred_element_type=jnp.float32)
                y = y * (1.0 / m)
                return y.astype(a0.dtype), ()
            y, _ = jax.lax.scan(step, a0, None, length=L)
            return y

        tiny = jax.jit(lambda a: jnp.sum(a[:1, :8]))
        np.asarray(tiny(mm_chain(a)))
        t0 = time.time()
        for _ in range(4):
            out = mm_chain(a)
        np.asarray(tiny(out))
        per = (time.time() - t0) / (4 * L)
        tf = 2 * m**3 / per / 1e12
        print(f"matmul {jnp.dtype(dt).name} {m}x{m}: "
              f"{per * 1e3:6.2f} ms  {tf:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()

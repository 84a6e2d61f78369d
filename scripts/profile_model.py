#!/usr/bin/env python
"""Profile the bare mask-model forward (one B-patch chunk, no lax.map)
to expose the per-op cost of the conv/LSTM stack that the serving
pipeline's `while` loop hides.

Usage:
  python scripts/profile_model.py [--runs 8] [--batchsize 8]
      [--precision default] [--fold_bn]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_device import aggregate  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--runs", type=int, default=8)
    p.add_argument("--batchsize", type=int, default=8)
    p.add_argument("--precision", type=str, default="default")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--trace_dir", type=str, default="/tmp/vrt_model_profile")
    args = p.parse_args(argv)

    import jax

    from vocal_remover_tpu import enable_compile_cache
    from vocal_remover_tpu.models import CascadedNet
    from vocal_remover_tpu.nn import config as nn_config

    enable_compile_cache()
    nn_config.set_precision(args.precision)
    model = CascadedNet(2048, 1024, 32, 128)
    variables = jax.device_put(model.init(jax.random.PRNGKey(0)))

    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.standard_normal((args.batchsize, 1025, 256, 2)).astype(np.float32)
    )

    fwd = jax.jit(lambda v, xb: model(v, xb))
    np.asarray(fwd(variables, x)[:1, :1, :1])  # compile + warm

    t0 = time.time()
    out = None
    for _ in range(args.runs):
        out = fwd(variables, x)
    np.asarray(out[:1, :1, :1])
    dt = time.time() - t0
    per = dt / args.runs * 1e3
    print(f"model fwd B={args.batchsize}: {per:.1f} ms/chunk "
          f"({per / args.batchsize:.2f} ms/patch)")

    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.runs):
        out = fwd(variables, x)
    np.asarray(out[:1, :1, :1])
    jax.profiler.stop_trace()

    aggregate(args.trace_dir, args.top)


if __name__ == "__main__":
    main()

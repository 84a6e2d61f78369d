#!/usr/bin/env python
"""Grouped wide-crop serving: device rate vs (group, batchsize).

Cross-song patch batching (Separator.separate_waves /
SeparatorService(group=N)) merges N equal-length songs' patches into
one batchsize-chunked model stream, recovering the chip utilization a
single wide-crop song (3 patches at cropsize 1024 for 60 s) can't
provide. This sweeps group size and model-chunk batchsize at crop 1024
with the same RTT-amortized methodology as bench.py's
group_wide_device_xrt (one dispatch separates the whole stack; a
device checksum forces every output; measured dispatch RTT
subtracted).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100
SECONDS = 60

# (group songs, cropsize, model-chunk batchsize)
DEFAULT_CONFIGS = (
    (8, 1024, 24),
    (10, 1024, 30),
    (12, 1024, 36),
    (16, 1024, 24),
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument(
        "--configs", type=str, default=None,
        help="comma list of group:cropsize:batchsize triples, e.g. "
             "'8:2048:16,8:2048:8' (default: the crop-1024 sweep)")
    p.add_argument(
        "--dtype", type=str, default="bfloat16",
        choices=["bfloat16", "int8"],
        help="serving weight transform: bf16-resident weights or the "
             "per-channel int8 conv stack (models/serving.quantize_int8)")
    p.add_argument(
        "--flat", action="store_true",
        help="pixel-packed flat Pallas kernels for the band-net "
             "enc1..enc3 convs (models/serving.pack_flat_encoders)")
    args = p.parse_args(argv)
    CONFIGS = DEFAULT_CONFIGS
    if args.configs:
        CONFIGS = tuple(
            tuple(int(v) for v in spec.split(":"))
            for spec in args.configs.split(",")
        )
    import jax
    import jax.numpy as jnp

    from vocal_remover_tpu import enable_compile_cache
    from vocal_remover_tpu.models import CascadedNet, serving
    from vocal_remover_tpu.nn import config as nn_config
    from vocal_remover_tpu.separate.separator import Separator
    from vocal_remover_tpu.separate.service import SeparatorService

    enable_compile_cache(".jax_bench_cache")
    nn_config.set_precision("bfloat16")

    model = CascadedNet(2048, 1024, 32, 128)
    cal = None
    if args.dtype == "int8":
        # static activation scales: one synthetic magnitude batch is
        # enough for a SPEED measurement (scales don't change timing)
        cal = [np.abs(np.random.default_rng(1).standard_normal(
            (2, model.output_bin, 256, 2))).astype(np.float32) * 0.3]
    variables = serving.serving_variables(
        model.init(jax.random.PRNGKey(0)), args.dtype,
        model=model, calibration_batches=cal, flat=args.flat,
    )

    rng = np.random.default_rng(0)
    max_group = max(g for g, _, _ in CONFIGS)
    songs = [
        (rng.standard_normal((2, SR * SECONDS)) * 0.1).astype(np.float32)
        for _ in range(max_group)
    ]
    svc_prep = SeparatorService(
        Separator(model, variables), pcm16_io=True, vocals_residual=True
    )
    pcm_all = np.stack([svc_prep._prepare(s) for s in songs])

    def med(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            f()
            ts.append(time.time() - t0)
        return sorted(ts)[reps // 2]

    for group, crop, bs in CONFIGS:
        sep = Separator(model, variables, batchsize=bs, cropsize=crop)
        try:
            run_g = sep._multiwave_fn(group, pcm_all.shape[-1], False,
                                      True, True)

            @jax.jit
            def dispatch(waves, variables):
                y = run_g(waves, variables)[0]
                return jnp.sum(y.astype(jnp.int32))[None]

            dev = jax.device_put(pcm_all[:group])
            tiny = jax.jit(lambda w: w[0, :1, :1].astype(jnp.int32))
            np.asarray(dispatch(dev, sep.variables))  # compile + warm
            np.asarray(tiny(dev))
            rtt = med(lambda: np.asarray(tiny(dev)))
            t = med(lambda: np.asarray(dispatch(dev, sep.variables)))
            xrt = group * SECONDS / max(t - rtt, 1e-9)
            print(
                f"group={group:3d} crop={crop} bs={bs:3d}  "
                f"device xRT {xrt:7.1f}   chip {t - rtt:6.3f}s "
                f"rtt {rtt * 1e3:6.1f}ms"
            )
        except Exception as e:
            print(f"group={group:3d} crop={crop} bs={bs:3d}  FAILED: "
                  f"{type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()

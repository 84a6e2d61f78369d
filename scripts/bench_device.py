#!/usr/bin/env python
"""Device-only separation throughput sweep (inputs resident on device).

Isolates chip performance from the host link: dispatches the whole-song
pipeline back-to-back with one tiny fetch to synchronize, per batchsize.
Use to pick the lax.map chunk size (bench.py's B=8 default came from
this sweep — larger chunks raise per-patch MXU efficiency until stage-3
activations thrash HBM).

Usage: python scripts/bench_device.py [--batchsizes 8,12,16] [--runs 6]
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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batchsizes", type=str, default="8,12,16")
    p.add_argument("--runs", type=int, default=6)
    p.add_argument("--precision", type=str, default="default")
    p.add_argument("--serving", action="store_true",
                   help="apply the serving transform (fold BatchNorms, "
                        "bf16-resident weights)")
    p.add_argument("--dsp_only", action="store_true",
                   help="measure the non-model pipeline shell alone "
                        "(STFT -> mag/patch/stitch geometry with a "
                        "constant mask -> iSTFT -> PCM16)")
    args = p.parse_args(argv)

    import jax

    from vocal_remover_tpu import enable_compile_cache
    from vocal_remover_tpu.models import CascadedNet
    from vocal_remover_tpu.nn import config as nn_config
    from vocal_remover_tpu.separate.separator import Separator

    enable_compile_cache()
    nn_config.set_precision(args.precision)
    model = CascadedNet(2048, 1024, 32, 128)
    variables = model.init(jax.random.PRNGKey(0))
    if args.serving:
        from vocal_remover_tpu.models import serving

        dt = "bfloat16" if args.precision == "bfloat16" else None
        variables = serving.serving_variables(variables, dt)

    rng = np.random.default_rng(0)
    wave = np.round(
        np.clip(rng.standard_normal((2, SR * SECONDS)) * 0.1, -1, 0.999)
        * 32768.0
    ).astype(np.int16)

    if args.dsp_only:
        import jax.numpy as jnp

        class _ShellModel:
            """Identity mask: isolates the pipeline's DSP shell."""
            n_fft, hop_length = model.n_fft, model.hop_length
            offset, is_complex = model.offset, False

            def __call__(self, variables, x):
                return jnp.ones_like(x)

        model, variables = _ShellModel(), {}

    for bs in [int(b) for b in args.batchsizes.split(",")]:
        sep = Separator(model, variables, batchsize=bs, cropsize=256)
        run = sep._wave_fn(wave.shape[-1], False, True, True)
        dev = jax.device_put(wave)
        np.asarray(run(dev, sep.variables)[0][:1, :1])  # compile + warm
        t0 = time.time()
        out = None
        for _ in range(args.runs):
            out = run(dev, sep.variables)
        np.asarray(out[0][:1, :1])
        dt = time.time() - t0
        print(
            f"B={bs:3d}: {dt / args.runs * 1e3:7.1f} ms/song  "
            f"device xRT {args.runs * SECONDS / dt:7.1f}"
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""One-off: grouped serving at crop 2048 (overlap redundancy 1.07x).

Same RTT-amortized methodology as scripts/bench_group.py. A 60 s song
at cropsize 2048 (offset 64, roi 1920) is 2 patches; group=8 gives 16
patches per dispatch. Sweeps model-chunk batchsize.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100
SECONDS = 60

CONFIGS = (
    (8, 2048, 16),
    (8, 2048, 8),
)


def main():
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
    variables = serving.serving_variables(
        model.init(jax.random.PRNGKey(0)), "bfloat16"
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
                f"rtt {rtt * 1e3:6.1f}ms", flush=True
            )
        except Exception as e:
            print(f"group={group:3d} crop={crop} bs={bs:3d}  FAILED: "
                  f"{type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()

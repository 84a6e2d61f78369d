#!/usr/bin/env python
"""Quality delta of the serving numerics vs strict-f32.

Separates one synthetic 30 s song through the identical pipeline in
(a) --precision highest with raw weights, (b) the bf16 serving mode
(bf16 activations + folded-BN bf16-resident weights), and (c) the int8
serving mode (per-channel int8 conv kernels, dynamic activation quant,
f32 LSTM/heads), then reports instrument-wave SNR vs (a) for each.
Records the numbers BENCH_NOTES.md cites for the bench.py modes; the
int8 gate is SNR >= 40 dB (VERDICT r03 #1).

Usage: python scripts/check_serving_snr.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100


def main():
    import jax

    from vocal_remover_tpu import enable_compile_cache
    from vocal_remover_tpu.models import CascadedNet, serving
    from vocal_remover_tpu.nn import config as nn_config
    from vocal_remover_tpu.separate.separator import Separator

    enable_compile_cache()
    model = CascadedNet(2048, 1024, 32, 128)
    variables = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)
    t = np.arange(SR * 30) / SR
    wave = np.stack([
        0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(len(t)),
        0.3 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.standard_normal(len(t)),
    ]).astype(np.float32)

    outs = {}
    for mode in ("highest", "serving", "int8"):
        t0 = time.time()
        if mode == "highest":
            nn_config.set_precision("highest")
            v = variables
        else:
            nn_config.set_precision("bfloat16")
            v = serving.serving_variables(
                variables, "int8" if mode == "int8" else "bfloat16"
            )
        sep = Separator(model, v, batchsize=24, cropsize=256)
        y, vwave = sep.separate_wave(wave, bucket=30 * SR)
        outs[mode] = y
        print(f"{mode}: {time.time() - t0:.1f}s", flush=True)

    ref = outs["highest"].astype(np.float64)
    ok = True
    for mode, gate in (("serving", 60.0), ("int8", 40.0)):
        test = outs[mode].astype(np.float64)
        num = np.sum(ref**2)
        den = np.sum((ref - test) ** 2)
        snr = 10 * np.log10(num / max(den, 1e-300))
        print(f"instrument-wave SNR {mode} vs f32: {snr:.1f} dB "
              f"(gate {gate:.0f} dB: {'OK' if snr >= gate else 'FAIL'})")
        print(f"max abs sample delta: {np.abs(ref - test).max():.2e}")
        ok &= snr >= gate
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

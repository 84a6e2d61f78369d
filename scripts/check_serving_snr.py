#!/usr/bin/env python
"""Quality delta of the serving numerics vs strict-f32, as a recorded
artifact (VERDICT r04 #7).

Separates one synthetic 30 s song through the identical pipeline in
(a) --precision highest with raw weights, (b) the bf16 serving mode
(bf16 activations + folded-BN bf16-resident weights), (c) the int8
serving mode (per-channel int8 conv kernels, calibrated static
activation scales, f32 LSTM/heads), and (d) the flat pixel-packed
encoder path on bf16, then reports instrument-wave SNR vs (a) for
each — at the FLAGSHIP geometry (CascadedNet(2048, 1024, 32, 128)).

Writes the JSON artifact the repo commits per round
(SERVING_SNR_r{N}.json); tests/test_serving_transforms.py
test_serving_snr_artifact asserts the committed numbers hold the
gates, so a quality regression in a serving transform cannot ship
behind a bench note.

Usage: python scripts/check_serving_snr.py [--json SERVING_SNR_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100
GATES = {"bfloat16": 60.0, "int8": 40.0, "flat": 60.0}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--json", type=str, default=None,
                   help="write the artifact JSON here")
    p.add_argument("--modes", type=str, default="bfloat16,int8,flat")
    args = p.parse_args(argv)

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

    def separate(v):
        sep = Separator(model, v, batchsize=24, cropsize=256)
        y, _ = sep.separate_wave(wave, bucket=30 * SR)
        return y

    t0 = time.time()
    nn_config.set_precision("highest")
    ref = separate(variables).astype(np.float64)
    print(f"highest: {time.time() - t0:.1f}s", flush=True)

    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    report = {"geometry": "CascadedNet(2048, 1024, 32, 128)",
              "song_seconds": 30, "cropsize": 256, "batchsize": 24,
              "modes": {}}
    ok = True
    for mode in modes:
        t0 = time.time()
        nn_config.set_precision("bfloat16")
        if mode == "bfloat16":
            v = serving.serving_variables(variables, "bfloat16")
        elif mode == "int8":
            # calibration batches: NHWC magnitude patches (N, F, T, 2)
            cal = [np.abs(rng.standard_normal(
                (2, model.output_bin, 256, 2))).astype(np.float32)]
            v = serving.serving_variables(
                variables, "int8", model=model, calibration_batches=cal)
        elif mode == "flat":
            v = serving.serving_variables(variables, "bfloat16",
                                          model=model, flat=True)
        else:
            print(f"unknown mode {mode}", file=sys.stderr)
            continue
        test = separate(v).astype(np.float64)
        num = float(np.sum(ref ** 2))
        den = float(np.sum((ref - test) ** 2))
        snr = 10 * np.log10(num / max(den, 1e-300))
        gate = GATES.get(mode, 40.0)
        entry = {
            "snr_db": round(snr, 2),
            "max_abs_delta": float(np.abs(ref - test).max()),
            "gate_db": gate,
            "seconds": round(time.time() - t0, 1),
        }
        report["modes"][mode] = entry
        print(f"instrument-wave SNR {mode} vs f32: {snr:.1f} dB "
              f"(gate {gate:.0f} dB: {'OK' if snr >= gate else 'FAIL'})",
              flush=True)
        ok &= snr >= gate

    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.json}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Device-only serving rate vs patch geometry (--cropsize).

The reference's windowing contract (lib/dataset.py:198-205) makes each
patch contribute only its central `roi = cropsize - 2*offset` frames,
so the fraction of model FLOPs that is overlap redundancy is
`cropsize/roi` — 2.0x at the default cropsize=256 (offset=64), 1.14x at
cropsize=1024. `--cropsize` is a first-class reference CLI flag
(reference inference.py:116), so wide-crop serving is the same knob,
not a semantics change; outputs at any cropsize match the reference at
that cropsize (oracle parity, tests/test_separator.py).

For each geometry this measures, with inputs device-resident (same
methodology as bench.py's device_only_xrt):
  - device-only xRT on a 60 s song
  - XLA cost-analysis FLOPs/song (the redundancy shows up here)
  - instrument-wave SNR vs the strict-f32 cropsize=256 pipeline on a
    30 s synthetic song (geometry changes the mask via the BiLSTM's
    time context, so this is a quality-delta measurement, not a
    numerics check)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100
SECONDS = 60
N_RUNS = 6


def synth_song(seconds, sr=SR, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(seconds * sr) / sr
    inst = sum(
        0.12 * np.sin(2 * np.pi * f * t + p)
        for f, p in ((110, 0.0), (220, 1.1), (440, 2.2), (881, 0.4))
    )
    inst = inst + 0.02 * rng.standard_normal(t.shape)
    vox = 0.15 * np.sin(2 * np.pi * 330 * t) * (np.sin(2 * np.pi * 3 * t) > 0)
    mix = np.stack([inst + vox, inst * 0.9 + vox * 1.1]).astype(np.float32)
    return mix, np.stack([inst, inst * 0.9]).astype(np.float32)


def main():
    import jax

    from vocal_remover_tpu import enable_compile_cache
    from vocal_remover_tpu.models import serving
    from vocal_remover_tpu.models.cascaded import CascadedNet
    from vocal_remover_tpu.nn import config as nn_config
    from vocal_remover_tpu.separate.separator import Separator
    from vocal_remover_tpu.separate.service import SeparatorService

    enable_compile_cache()

    model = CascadedNet(2048, 1024, 32, 128)
    f32_vars = model.init(jax.random.PRNGKey(0))

    song, _ = synth_song(SECONDS)
    short, _ = synth_song(30, seed=1)

    # quality reference: strict f32, default geometry
    nn_config.set_precision("float32")
    sep_ref = Separator(model, f32_vars, batchsize=4, cropsize=256)
    y_ref, _ = sep_ref.separate_wave(short)
    y_ref = np.asarray(y_ref, np.float32)

    nn_config.set_precision("bfloat16")
    bf16_vars = serving.serving_variables(f32_vars, "bfloat16")

    results = []
    for cropsize, batchsize in ((256, 24), (512, 12), (1024, 6), (1024, 3)):
        sep = Separator(model, bf16_vars, batchsize=batchsize,
                        cropsize=cropsize)
        svc = SeparatorService(sep, pcm16_io=True, vocals_residual=True)
        pcm = svc._prepare(song)
        run = sep._wave_fn(pcm.shape[-1], False, True, True)
        dev = jax.device_put(pcm)
        np.asarray(run(dev, sep.variables)[0][:1, :1])  # compile + warm
        t0 = time.time()
        out = None
        for _ in range(N_RUNS):
            out = run(dev, sep.variables)
        np.asarray(out[0][:1, :1])
        xrt = N_RUNS * SECONDS / (time.time() - t0)

        flops = None
        try:
            comp = run.lower(
                jax.ShapeDtypeStruct(pcm.shape, pcm.dtype), sep.variables
            ).compile()
            cost = comp.cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(cost["flops"])
        except Exception:
            pass

        y, _ = sep.separate_wave(short)
        y = np.asarray(y, np.float32)
        err = y - y_ref
        snr = 10 * np.log10(
            float(np.mean(y_ref**2)) / max(float(np.mean(err**2)), 1e-30)
        )
        mfu = (100 * flops * xrt / SECONDS / 197e12) if flops else None
        results.append((cropsize, batchsize, xrt, flops, mfu, snr))
        print(
            f"crop={cropsize:5d} bs={batchsize:3d}  "
            f"device xRT {xrt:7.1f}  "
            f"flops/song {flops / 1e12 if flops else -1:6.3f} T  "
            f"MFU {mfu if mfu else -1:5.2f}%  "
            f"SNR vs f32@256 {snr:6.1f} dB",
            flush=True,
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: sustained separation throughput on one TPU chip.

Metric (BASELINE.md): xRT = audio-seconds separated per wall-clock
second at 44.1 kHz, flagship CascadedNet(2048, 1024, 32, 128), whole
songs in, separated PCM16 stereo waves out. Target >= 50x per v5e chip.

Measures the pipelined serving path (SeparatorService): device STFT ->
batched mask model -> complex recon -> device iSTFT, PCM16 host I/O,
uploads/dispatch/downloads overlapped. Compile time is excluded (one
warmup song); the steady-state rate over N songs is reported.

`vs_baseline` compares against the reference implementation measured on
this machine's CPU (tsurumeso/vocal-remover, torch 2.13 CPU, 1 thread):
0.83 xRT for the same 60 s separation workload (Separator.separate,
batchsize 4 — measured 2026-08-16, see BENCH_NOTES.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np

REFERENCE_CPU_XRT = 0.83  # measured on this host; see BENCH_NOTES.md
SR = 44100
SECONDS = 60
N_WARMUP = 2  # compile + jit/tunnel warm-up songs, excluded from timing
N_SONGS = 8


def main():
    import jax

    from vocal_remover_tpu.models import CascadedNet
    from vocal_remover_tpu.nn import config as nn_config
    from vocal_remover_tpu.separate.separator import Separator
    from vocal_remover_tpu.separate.service import SeparatorService

    nn_config.set_precision("default")  # bf16 MXU; f32 accumulate

    model = CascadedNet(2048, 1024, 32, 128)
    variables = model.init(jax.random.PRNGKey(0))
    sep = Separator(model, variables, batchsize=8, cropsize=256)
    svc = SeparatorService(sep, pcm16_io=True, vocals_residual=True)

    rng = np.random.default_rng(0)
    songs = [
        (rng.standard_normal((2, SR * SECONDS)) * 0.1).astype(np.float32)
        for _ in range(N_SONGS + N_WARMUP)
    ]

    t_start = None
    done = 0
    for i, (y, v) in enumerate(svc.map(songs)):
        if i == 0:
            assert y.shape == (2, SR * SECONDS)
            assert np.isfinite(y.astype(np.float32)).all()
        if i == N_WARMUP - 1:
            t_start = time.time()
        elif i >= N_WARMUP:
            done += 1
    elapsed = time.time() - t_start
    xrt = done * SECONDS / elapsed

    print(
        json.dumps(
            {
                "metric": "separation_throughput_xrt",
                "value": round(xrt, 2),
                "unit": "audio_sec/sec/chip @44.1kHz",
                "vs_baseline": round(xrt / REFERENCE_CPU_XRT, 1),
            }
        )
    )


if __name__ == "__main__":
    main()

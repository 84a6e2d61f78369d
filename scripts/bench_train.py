#!/usr/bin/env python
"""Training-throughput microbench (flagship model, one chip).

Measures sustained fused-step time and audio-seconds/second of training
for each batch staging mode (f32 / bf16 / int8 host staging, plus
`device` = device-resident dataset: crops + augmentation on-chip, only
index/flag bytes over the link). Synthetic magnitude batches, batch 4 x
crop 256 (the reference's defaults, train.py:139-166).

Usage: python scripts/bench_train.py [--steps 20] [--modes f32,bf16,int8,device]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100
HOP = 1024


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--batchsize", type=int, default=4)
    p.add_argument("--cropsize", type=int, default=256)
    p.add_argument("--modes", type=str, default="f32,bf16,int8,device")
    p.add_argument("--precision", type=str, default="default",
                   choices=["highest", "default", "bfloat16"])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vocal_remover_tpu import enable_compile_cache
    from vocal_remover_tpu.models import CascadedNet
    from vocal_remover_tpu.nn import config as nn_config
    from vocal_remover_tpu.train.step import Trainer

    enable_compile_cache()
    nn_config.set_precision(args.precision)
    model = CascadedNet(2048, 1024, 32, 128)
    variables = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    F = model.output_bin
    B, T = args.batchsize, args.cropsize
    X = np.abs(rng.standard_normal((B, 2, F, T))).astype(np.float32)
    y = (X * rng.uniform(0, 1, X.shape)).astype(np.float32)
    audio_sec_per_step = B * T * HOP / SR

    modes = {
        "f32": None,
        "bf16": jnp.bfloat16,
        "int8": "int8",
    }
    for name in args.modes.split(","):
        name = name.strip()
        if name == "device":
            from vocal_remover_tpu.data.device_cache import (
                DeviceLoader,
                DeviceTrainingSource,
            )

            # 2 synthetic "songs" x enough patches for warmup+steps
            songs = [
                (
                    np.abs(rng.standard_normal((2, F, 2048)))
                    .astype(np.float32),
                    np.abs(rng.standard_normal((2, F, 2048)))
                    .astype(np.float32),
                )
                for _ in range(2)
            ]
            n_items = (args.warmup + args.steps) * B
            src = DeviceTrainingSource.from_magnitudes(
                songs, cropsize=T, patches=n_items // 2
            )
            tr = Trainer(model, variables, learning_rate=1e-3)
            warm = DeviceLoader(src, batchsize=B, seed=0)
            tr.train_epoch_device(
                src, list(warm)[: args.warmup]
            )  # compile + warm
            batches = list(DeviceLoader(src, batchsize=B, seed=1))
            t0 = time.time()
            loss = tr.train_epoch_device(src, batches[: args.steps])
            dt = (time.time() - t0) / args.steps
        else:
            tr = Trainer(model, variables, learning_rate=1e-3,
                         transfer_dtype=modes[name], prefetch=0)
            batches = [(X.copy(), y.copy()) for _ in range(args.warmup)]
            tr.train_epoch(batches)  # compile + warm
            t0 = time.time()
            loss = tr.train_epoch(
                [(X.copy(), y.copy()) for _ in range(args.steps)]
            )
            dt = (time.time() - t0) / args.steps
        print(
            f"{name:6s}: {dt * 1e3:7.1f} ms/step  "
            f"{audio_sec_per_step / dt:7.1f} audio-sec/s  "
            f"loss {loss:.5f}"
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Training-throughput sweep: precision x remat x batch x crop (+ the
wave-loss step), one JSON per config (VERDICT r04 #3).

Measures the fused jitted update step (train/step.py Trainer, device-
resident batches so host staging is excluded) for:

  * precision: default (f32 storage, bf16 MXU multiplies) vs bfloat16
    (bf16 compute/activations, f32 master weights in Adam);
  * remat: band-net rematerialization in backward (jax.checkpoint);
  * batch x crop: the reference default (4 x 256) and wider shapes at
    the same audio-seconds/step (16 x 256, 4 x 1024, 8 x 512);
  * --wave_loss sdr: the device-iSTFT wave-loss training option's
    step cost (round 4 shipped it unmeasured).

Usage: python scripts/bench_train_sweep.py [--steps 12] [--json OUT]
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
HOP = 1024
V5E_BF16_PEAK = 197e12


def measure(precision, remat, B, T, steps, warmup, wave_loss=None):
    import jax
    import jax.numpy as jnp

    from vocal_remover_tpu.models import CascadedNet
    from vocal_remover_tpu.nn import config as nn_config
    from vocal_remover_tpu.train.step import Trainer

    nn_config.set_precision(precision)
    model = CascadedNet(2048, 1024, 32, 128,
                        is_complex=wave_loss is not None)
    variables = model.init(jax.random.PRNGKey(0))
    kwargs = {"wave_loss": wave_loss} if wave_loss else {}
    trainer = Trainer(model, variables, learning_rate=1e-3,
                      remat=remat, **kwargs)
    rng = np.random.default_rng(0)
    F = model.output_bin
    if wave_loss:
        # complex batches travel as stacked re/im channels (N, 4, F, T)
        # like data/dataset.py:183-184 emits them
        Xc = (rng.standard_normal((B, 2, F, T))
              + 1j * rng.standard_normal((B, 2, F, T)))
        yc = Xc * rng.uniform(0, 1, Xc.shape)
        X = np.concatenate([Xc.real, Xc.imag], 1).astype(np.float32)
        y = np.concatenate([yc.real, yc.imag], 1).astype(np.float32)
    else:
        X = np.abs(rng.standard_normal((B, 2, F, T))).astype(np.float32)
        y = (X * rng.uniform(0, 1, X.shape)).astype(np.float32)
    key = jax.random.PRNGKey(1)

    def one_step():
        Xd, yd = trainer._put_batch(X, y)
        (loss, trainer.params, trainer.stats,
         trainer.opt_state) = trainer._fused(
            trainer.params, trainer.stats, trainer.opt_state, Xd, yd, key)
        return loss

    # per-step FLOPs from XLA cost analysis of the fused step
    flops = None
    try:
        Xd, yd = trainer._put_batch(X, y)
        lowered = jax.jit(trainer._fused_fn).lower(
            trainer.params, trainer.stats, trainer.opt_state, Xd, yd, key)
        cost = lowered.compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost["flops"])
    except Exception:
        pass
    loss = None
    for _ in range(warmup):
        loss = one_step()
    jnp.asarray(loss).block_until_ready()
    t0 = time.time()
    for _ in range(steps):
        loss = one_step()
    jnp.asarray(loss).block_until_ready()
    dt = (time.time() - t0) / steps
    out = {
        "precision": precision, "remat": bool(remat), "batch": B,
        "crop": T, "wave_loss": wave_loss,
        "step_ms": round(dt * 1e3, 1),
        "samples_per_sec": round(B / dt, 1),
        "audio_xrt": round(B * T * HOP / SR / dt, 1),
    }
    if flops:
        out["train_mfu_pct"] = round(100 * flops / dt / V5E_BF16_PEAK, 2)
        out["flops_per_step"] = flops
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=12)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--json", type=str, default=None)
    p.add_argument("--quick", action="store_true",
                   help="only the headline configs")
    args = p.parse_args(argv)

    import jax  # noqa: F401

    from vocal_remover_tpu import enable_compile_cache

    enable_compile_cache()
    configs = [
        # (precision, remat, B, T, wave_loss)
        ("default", False, 4, 256, None),      # r03/r04 scoreboard config
        ("bfloat16", False, 4, 256, None),
        ("bfloat16", True, 4, 256, None),
        ("default", True, 4, 256, None),
    ]
    if not args.quick:
        configs += [
            ("bfloat16", False, 16, 256, None),
            ("bfloat16", True, 16, 256, None),
            ("bfloat16", True, 4, 1024, None),
            ("bfloat16", True, 8, 512, None),
            ("default", False, 16, 256, None),  # OOMs: f32 B=16 needs remat
            ("default", True, 16, 256, None),
            ("default", False, 4, 256, "sdr"),  # wave-loss step cost
        ]

    results = []
    for precision, remat, B, T, wl in configs:
        try:
            r = measure(precision, remat, B, T, args.steps,
                        args.warmup, wave_loss=wl)
        except Exception as e:
            r = {"precision": precision, "remat": remat, "batch": B,
                 "crop": T, "wave_loss": wl, "error": repr(e)}
        print(json.dumps(r), flush=True)
        results.append(r)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

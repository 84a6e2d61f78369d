#!/usr/bin/env python
"""Device-only serving rate vs patch geometry (--cropsize).

The reference's windowing contract (lib/dataset.py:198-205) makes each
patch contribute only its central `roi = cropsize - 2*offset` frames,
so the fraction of model FLOPs that is overlap redundancy is
`cropsize/roi` — 2.0x at the default cropsize=256 (offset=64), 1.14x at
cropsize=1024. `--cropsize` is a first-class reference CLI flag
(reference inference.py:116), so wide-crop serving is the same knob,
not a semantics change; outputs at any cropsize match the reference at
that cropsize (oracle parity: tests/test_separator.py
test_wide_cropsize_matches_reference).

For each geometry this measures, with inputs device-resident (same
methodology as bench.py's device_only_xrt):
  - device-only xRT on a 60 s song
  - XLA cost-analysis FLOPs/song (the redundancy shows up here) + MFU
  - output SNR vs the cropsize=256 serving output on the SAME song and
    executable (geometry changes the mask via each patch's conv/LSTM
    context, so this is a quality-delta measurement, not numerics)

One compile per geometry and nothing else: the quality delta reuses the
timing executable's own output.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100
SECONDS = 60
N_RUNS = 12

# batchsize = the 60 s song's exact patch count for each geometry (one
# lax.map chunk, no bucket-rounding waste): 21->24 @256, 7 @512, 3 @1024
CONFIGS = ((256, 24), (512, 7), (1024, 3))


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
    return mix


def main():
    import argparse

    import jax

    from vocal_remover_tpu import enable_compile_cache
    from vocal_remover_tpu.models import serving
    from vocal_remover_tpu.models.cascaded import CascadedNet
    from vocal_remover_tpu.nn import config as nn_config
    from vocal_remover_tpu.separate.separator import Separator
    from vocal_remover_tpu.separate.service import SeparatorService

    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=None,
                    help="comma list like 256:24,1024:6 (default: all)")
    args = ap.parse_args()
    configs = CONFIGS
    if args.configs:
        configs = tuple(
            tuple(int(v) for v in c.split(":")) for c in
            args.configs.split(",")
        )

    enable_compile_cache()

    nn_config.set_precision("bfloat16")
    model = CascadedNet(2048, 1024, 32, 128)
    variables = serving.serving_variables(
        model.init(jax.random.PRNGKey(0)), "bfloat16"
    )

    song = synth_song(SECONDS)
    y_ref = None

    for cropsize, batchsize in configs:
        sep = Separator(model, variables, batchsize=batchsize,
                        cropsize=cropsize)
        svc = SeparatorService(sep, pcm16_io=True, vocals_residual=True)
        pcm = svc._prepare(song)
        run = sep._wave_fn(pcm.shape[-1], False, True, True)
        print(f"crop={cropsize} bs={batchsize}: compiling...", flush=True)

        # N_RUNS distinct songs scanned inside ONE dispatch, so the
        # tunnel's per-dispatch RTT (which swings 10x day to day on
        # this host) amortizes out of the device-time measurement —
        # same methodology as bench_roofline.py. Distinct inputs keep
        # XLA from hoisting the body out of the loop.
        import jax.numpy as jnp
        from jax import lax

        stack = np.stack(
            [pcm] + [svc._prepare(synth_song(SECONDS, seed=s + 10))
                     for s in range(N_RUNS - 1)]
        )

        @jax.jit
        def chain(waves, variables):
            def step(_, w):
                y = run(w, variables)[0]
                return None, y[:1, :1].astype(jnp.int32)
            _, outs = lax.scan(step, None, waves)
            return outs

        dev = jax.device_put(stack)
        y = np.asarray(run(jax.device_put(pcm), sep.variables)[0])
        np.asarray(chain(dev, sep.variables))  # compile + warm

        # subtract the per-dispatch RTT (measured with a trivial jitted
        # fetch on the same resident buffer) so the reported number is
        # device time, not today's tunnel weather; raw kept alongside.
        tiny = jax.jit(lambda w: w[0, :1, :1].astype(jnp.int32))
        np.asarray(tiny(dev))
        def med(f, n=3):
            ts = []
            for _ in range(n):
                t0 = time.time()
                f()
                ts.append(time.time() - t0)
            ts.sort()
            return ts[n // 2]

        t_rtt = med(lambda: np.asarray(tiny(dev)))
        t_chain = med(lambda: np.asarray(chain(dev, sep.variables)))
        xrt_raw = N_RUNS * SECONDS / t_chain
        xrt = N_RUNS * SECONDS / max(t_chain - t_rtt, 1e-9)

        flops = mfu = None
        try:
            comp = run.lower(
                jax.ShapeDtypeStruct(pcm.shape, pcm.dtype), sep.variables
            ).compile()
            cost = comp.cost_analysis()
            cost = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(cost["flops"])
            mfu = 100 * flops * xrt / SECONDS / 197e12
        except Exception:
            pass

        if y_ref is None:
            y_ref, snr = y.astype(np.float32), float("inf")
        else:
            err = y.astype(np.float32) - y_ref
            snr = 10 * np.log10(
                float(np.mean(y_ref**2)) / max(float(np.mean(err**2)),
                                               1e-30)
            )
        print(
            f"crop={cropsize:5d} bs={batchsize:3d}  "
            f"device xRT {xrt:7.1f} (raw {xrt_raw:6.1f}, "
            f"rtt {t_rtt * 1e3:5.0f} ms)  "
            f"flops/song {flops / 1e12 if flops else -1:6.3f} T  "
            f"MFU {mfu if mfu else -1:5.2f}%  "
            f"SNR vs crop256 {snr:6.1f} dB",
            flush=True,
        )


if __name__ == "__main__":
    main()

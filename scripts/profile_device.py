#!/usr/bin/env python
"""Profile the device-only serving pipeline and aggregate HLO op time.

Captures a jax.profiler trace of N back-to-back whole-song `_wave_fn`
dispatches (inputs resident on device) and prints, from the TPU device
track of the trace, total time per HLO op name and per op class —
the data that drives layout/kernel work on the conv stack.

Usage:
  python scripts/profile_device.py [--runs 4] [--precision default]
      [--batchsize 8] [--top 40] [--mode serve|train]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 44100
SECONDS = 60


def classify(name: str) -> str:
    n = name.lower()
    for key in ("copy", "fusion", "convolution", "conv", "while", "fft",
                "dot", "transpose", "reduce", "scatter", "dynamic",
                "select", "add", "broadcast", "iota", "pad", "concatenate",
                "custom-call", "bitcast", "slice"):
        if key in n:
            return key
    return "other"


def aggregate(trace_dir: str, top: int):
    files = sorted(
        glob.glob(os.path.join(trace_dir, "plugins", "profile", "*",
                               "*.trace.json.gz"))
    )
    if not files:
        print("no trace files found under", trace_dir)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device pids (process names that look like a TPU/device track)
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if any(k in pname.lower() for k in ("tpu", "device", "/device",
                                                "xla")):
                device_pids.add(e["pid"])
    by_name = collections.Counter()
    by_class = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # microseconds
        # skip trace-framework meta events
        if name.startswith(("$", "process_")):
            continue
        by_name[name] += dur
        by_class[classify(name)] += dur
        total += dur
    print(f"\n== device time by op class (total {total / 1e3:.1f} ms) ==")
    for cls, dur in by_class.most_common():
        print(f"  {dur / 1e3:9.2f} ms  {100 * dur / total:5.1f}%  {cls}")
    print(f"\n== top {top} ops ==")
    for name, dur in by_name.most_common(top):
        print(f"  {dur / 1e3:9.2f} ms  {100 * dur / total:5.1f}%  {name[:110]}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--runs", type=int, default=4)
    p.add_argument("--precision", type=str, default="default")
    p.add_argument("--batchsize", type=int, default=8)
    p.add_argument("--cropsize", type=int, default=256)
    p.add_argument("--group", type=int, default=1,
                   help="profile the merged multi-song stream "
                        "(Separator._multiwave_fn) instead of one song")
    p.add_argument("--serving", action="store_true",
                   help="apply the bf16 serving transform first "
                        "(profiles the bench.py grouped config)")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--mode", type=str, default="serve",
                   choices=["serve", "train"])
    p.add_argument("--trace_dir", type=str, default="/tmp/vrt_profile")
    p.add_argument("--parse_only", action="store_true",
                   help="just re-aggregate an existing trace dir")
    args = p.parse_args(argv)

    if args.parse_only:
        aggregate(args.trace_dir, args.top)
        return

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

        variables = serving.serving_variables(variables, "bfloat16")

    rng = np.random.default_rng(0)
    wave = np.round(
        np.clip(rng.standard_normal((2, SR * SECONDS)) * 0.1, -1, 0.999)
        * 32768.0
    ).astype(np.int16)

    if args.mode == "serve":
        sep = Separator(model, variables, batchsize=args.batchsize,
                        cropsize=args.cropsize)
        if args.group > 1:
            stack = np.stack([wave] * args.group)
            run = sep._multiwave_fn(args.group, wave.shape[-1], False,
                                    True, True)
            dev = jax.device_put(stack)
        else:
            run = sep._wave_fn(wave.shape[-1], False, True, True)
            dev = jax.device_put(wave)
        np.asarray(run(dev, sep.variables)[0][:1, :1])  # compile + warm
        t0 = time.time()
        jax.profiler.start_trace(args.trace_dir)
        out = None
        for _ in range(args.runs):
            out = run(dev, sep.variables)
        np.asarray(out[0][:1, :1])
        jax.profiler.stop_trace()
        dt = time.time() - t0
        songs = args.runs * args.group
        print(f"{songs} songs in {dt:.2f}s "
              f"({dt / songs * 1e3:.1f} ms/song, "
              f"device xRT {songs * SECONDS / dt:.1f})")
    else:
        raise SystemExit("train mode: use scripts/bench_train.py --profile")

    aggregate(args.trace_dir, args.top)


if __name__ == "__main__":
    main()

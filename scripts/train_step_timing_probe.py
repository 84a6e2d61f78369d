#!/usr/bin/env python
"""Settle the training-step measurement discrepancy (round 5).

Three timings of the SAME fused update graph (flagship, B=4 crop 256,
default precision, device-resident batch):

  1. pipelined slope: sequential dependent dispatches, wall time of
     N_hi steps minus N_lo steps (fixed overheads cancel) — what
     train_epoch actually does with prefetched data;
  2. per-dispatch sync: block after every step (upper bound: includes
     a full tunnel RTT per step);
  3. scan-chained: N steps inside one jitted lax.scan dispatch (the
     pre-r05 bench.py methodology).

Usage: python scripts/train_step_timing_probe.py [--json OUT]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--json", type=str, default=None)
    p.add_argument("--lo", type=int, default=5)
    p.add_argument("--hi", type=int, default=25)
    p.add_argument("--precision", type=str, default="default",
                   choices=["highest", "default", "bfloat16"])
    p.add_argument("--skip_scan", action="store_true",
                   help="only the per-dispatch timings (bench.py mode)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from vocal_remover_tpu import enable_compile_cache
    from vocal_remover_tpu.models import CascadedNet
    from vocal_remover_tpu.nn import config as nn_config
    from vocal_remover_tpu.train.step import Trainer

    enable_compile_cache()
    nn_config.set_precision(args.precision)
    model = CascadedNet(2048, 1024, 32, 128)
    variables = model.init(jax.random.PRNGKey(0))
    tr = Trainer(model, variables, learning_rate=1e-3, dropout=True)
    B, F, T = 4, model.output_bin, 256
    rng = np.random.default_rng(1)
    X = np.abs(rng.standard_normal((B, 2, F, T))).astype(np.float32)
    y = (X * rng.uniform(0, 1, X.shape)).astype(np.float32)
    key = jax.random.PRNGKey(1)
    Xd, yd = tr._put_batch(X, y)

    def run(n):
        loss = None
        for _ in range(n):
            loss, tr.params, tr.stats, tr.opt_state = tr._fused(
                tr.params, tr.stats, tr.opt_state, Xd, yd, key)
        jnp.asarray(loss).block_until_ready()

    run(3)
    out = {}

    def timed(n):
        t0 = time.time()
        run(n)
        return time.time() - t0

    t_lo = min(timed(args.lo) for _ in range(3))
    t_hi = min(timed(args.hi) for _ in range(3))
    out["pipelined_slope_ms"] = round(
        1e3 * (t_hi - t_lo) / (args.hi - args.lo), 2)
    out["lo_total_s"] = round(t_lo, 3)
    out["hi_total_s"] = round(t_hi, 3)

    # 2. per-dispatch sync
    ts = []
    for _ in range(10):
        t0 = time.time()
        run(1)
        ts.append(time.time() - t0)
    out["sync_step_ms"] = round(1e3 * sorted(ts)[len(ts) // 2], 2)

    # FLOPs + MFU vs the v5e bf16 peak (197 TF/s)
    try:
        comp = jax.jit(tr._fused_fn).lower(
            tr.params, tr.stats, tr.opt_state, Xd, yd, key).compile()
        cost = comp.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        out["flops_per_step"] = float(cost["flops"])
        out["train_mfu_pct"] = round(
            100.0 * out["flops_per_step"]
            / (out["pipelined_slope_ms"] / 1e3) / 197e12, 2)
    except Exception:
        pass
    out["batch"] = B

    if args.skip_scan:
        print(json.dumps(out))
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out, f, indent=1)
        return

    # 3. scan-chained (pre-r05 bench methodology)
    n_scan = 8
    Xs = jnp.asarray(np.broadcast_to(X, (n_scan,) + X.shape).copy())
    ys = jnp.asarray(np.broadcast_to(y, (n_scan,) + y.shape).copy())
    rngs = jax.random.split(jax.random.PRNGKey(2), n_scan)

    @jax.jit
    def multi(params, stats, opt_state, Xb, yb, rb):
        def step(carry, xyr):
            p, s, o = carry
            Xi, yi, r = xyr
            loss, p, s, o = tr._fused_fn(p, s, o, Xi, yi, r)
            return (p, s, o), loss
        _, losses_ = lax.scan(step, (params, stats, opt_state),
                              (Xb, yb, rb))
        return losses_

    np.asarray(multi(tr.params, tr.stats, tr.opt_state, Xs, ys, rngs))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(multi(tr.params, tr.stats, tr.opt_state, Xs, ys, rngs))
        ts.append(time.time() - t0)
    out["scan_step_ms"] = round(1e3 * sorted(ts)[1] / n_scan, 2)

    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

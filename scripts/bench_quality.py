#!/usr/bin/env python
"""Trainability evidence on a synthetic corpus: run the REAL train CLI
end-to-end and measure separation quality before/after.

Builds a richer synthetic corpus than the e2e test (multi-tone chords,
noise beds, per-song level variation, tone+formant "vocals"), trains
the flagship-width CLI model on it, and records the loss curve plus
before/after SDR of held-out songs into QUALITY_r{N}.json. This is the
strongest available stand-in for the blocked real-checkpoint parity
run (BASELINE.md: models/baseline.pth ships only in release zips).

Usage:
  python scripts/bench_quality.py [--epochs 30] [--songs 8] [--out QUALITY.json]
      [--sr 44100] [--seconds 8] [--workdir /tmp/vrt_quality]

Runs on whatever device JAX selects (TPU when available; set
JAX_PLATFORMS=cpu for a slow CPU drive).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_pair(rng, sr, seconds):
    """(mixture, instruments) stereo pair: chordal instruments + noise
    bed, tonal+noise 'vocals' with vibrato, random levels."""
    n = int(sr * seconds)
    t = np.arange(n) / sr

    def tone(f, amp, vib=0.0):
        ph = 2 * np.pi * f * t
        if vib:
            ph = ph + vib * np.sin(2 * np.pi * 5.0 * t)
        return amp * np.sin(ph)

    root = rng.uniform(80, 220)
    inst_l = sum(
        tone(root * k, rng.uniform(0.05, 0.2)) for k in (1, 1.5, 2, 3)
    )
    inst_r = sum(
        tone(root * k, rng.uniform(0.05, 0.2)) for k in (1, 1.25, 2, 4)
    )
    # percussive noise bursts (shared across channels, level-varied)
    burst = np.zeros(n)
    period = int(sr * rng.uniform(0.4, 0.7))
    for s in range(0, n - period, period):
        dur = int(sr * 0.05)
        burst[s : s + dur] += (
            rng.standard_normal(dur) * np.exp(-np.arange(dur) / (sr * 0.01))
        )
    inst = np.stack([
        inst_l + 0.3 * burst,
        inst_r + 0.25 * burst,
    ])

    # "vocals": gliding tone + formant-ish band noise, amplitude gated
    f0 = rng.uniform(180, 350)
    glide = f0 * (1 + 0.1 * np.sin(2 * np.pi * 0.3 * t))
    voc_core = 0.35 * np.sin(
        2 * np.pi * np.cumsum(glide) / sr
    ) + 0.1 * np.sin(2 * np.pi * np.cumsum(3 * glide) / sr)
    gate = (np.sin(2 * np.pi * rng.uniform(0.2, 0.5) * t) > -0.2).astype(
        np.float64
    )
    voc = voc_core * gate + 0.02 * rng.standard_normal(n)
    vocals = np.stack([voc * rng.uniform(0.8, 1.1), voc * rng.uniform(0.8, 1.1)])

    level = rng.uniform(0.5, 1.0)
    inst = (inst * level).astype(np.float32)
    mixture = (inst + vocals * level).astype(np.float32)
    peak = max(np.abs(mixture).max(), 1e-9)
    if peak > 0.99:
        mixture /= peak / 0.99
        inst /= peak / 0.99
    return mixture, inst


def sdr(ref, est):
    """Plain SDR in dB (utils/metrics has the full harness; a local
    copy keeps this script runnable standalone)."""
    ref = ref.astype(np.float64).ravel()
    est = est.astype(np.float64).ravel()
    num = np.sum(ref**2)
    den = np.sum((ref - est) ** 2)
    if den == 0:
        return float("inf")
    return float(10 * np.log10(num / max(den, 1e-12)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--songs", type=int, default=8)
    p.add_argument("--sr", type=int, default=44100)
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--workdir", type=str, default="/tmp/vrt_quality")
    p.add_argument("--out", type=str, default=os.path.join(REPO, "QUALITY_r03.json"))
    p.add_argument("--batchsize", type=int, default=4)
    p.add_argument("--extra_flags", type=str, default="",
                   help="extra train-CLI flags, space-separated (e.g. "
                        "'--is_complex --wave_loss sdr' or "
                        "'--precision bfloat16')")
    args = p.parse_args(argv)

    from vocal_remover_tpu.utils import audio

    rng = np.random.default_rng(42)
    mix_dir = os.path.join(args.workdir, "dataset", "mixtures")
    inst_dir = os.path.join(args.workdir, "dataset", "instruments")
    hold_mix, hold_inst = [], []
    os.makedirs(mix_dir, exist_ok=True)
    os.makedirs(inst_dir, exist_ok=True)
    n_holdout = 2
    for i in range(args.songs + n_holdout):
        mixture, inst = synth_pair(rng, args.sr, args.seconds)
        if i >= args.songs:  # held out of training entirely
            hold_mix.append(mixture)
            hold_inst.append(inst)
            continue
        audio.write_wav(os.path.join(mix_dir, f"song{i:02d}.wav"),
                        mixture, args.sr)
        audio.write_wav(os.path.join(inst_dir, f"song{i:02d}.wav"),
                        inst, args.sr)

    out_dir = os.path.join(args.workdir, "models")
    os.makedirs(out_dir, exist_ok=True)
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--dataset", os.path.join(args.workdir, "dataset"),
        "--sr", str(args.sr),
        "--epoch", str(args.epochs),
        "--batchsize", str(args.batchsize),
        "--val_rate", "0.25",
        "--output_dir", out_dir,
        "--seed", "2019",
    ]
    if args.extra_flags:
        cmd += args.extra_flags.split()
    if "--is_complex" not in cmd:
        # device-resident corpus holds magnitudes — complex-mask
        # training must stage host batches (data/device_cache.py:117)
        cmd.insert(cmd.index("--output_dir"), "--device_data_cache")
    print("running:", " ".join(cmd), flush=True)
    t0 = time.time()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(cmd, cwd=args.workdir, env=env)
    train_secs = time.time() - t0
    if res.returncode != 0:
        raise SystemExit(f"train CLI failed rc={res.returncode}")

    ckpts = sorted(
        glob.glob(os.path.join(out_dir, "model_iter*.vrt.npz")),
        key=os.path.getmtime,
    )
    if not ckpts:
        raise SystemExit("no checkpoint written")
    ckpt = ckpts[-1]

    loss_files = sorted(glob.glob(os.path.join(args.workdir, "loss_*.json")),
                        key=os.path.getmtime)
    losses = json.load(open(loss_files[-1])) if loss_files else []

    # separate the held-out songs with the trained checkpoint
    from vocal_remover_tpu.models import convert
    from vocal_remover_tpu.separate.separator import Separator

    model, variables = convert.load_model(ckpt, 2048, 1024, 32, 128)
    sep = Separator(model, variables, batchsize=8, cropsize=256)
    sdr_before, sdr_after = [], []
    for mixture, inst in zip(hold_mix, hold_inst):
        y, _ = sep.separate_wave(mixture, pcm16_io=True,
                                 bucket=30 * args.sr)
        y = y.astype(np.float32) / 32768.0
        sdr_before.append(sdr(inst, mixture))  # trivial estimate: mixture
        sdr_after.append(sdr(inst, y))

    report = {
        "metric": "synthetic_corpus_training",
        "epochs": args.epochs,
        "songs": args.songs,
        "sr": args.sr,
        "train_seconds": round(train_secs, 1),
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "loss_curve": losses,
        "holdout_sdr_mixture_db": [round(s, 2) for s in sdr_before],
        "holdout_sdr_separated_db": [round(s, 2) for s in sdr_after],
        "sdr_gain_db": round(
            float(np.mean(sdr_after) - np.mean(sdr_before)), 2
        ),
        "checkpoint": ckpt,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "loss_curve"}, indent=1))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""One-command SDR/output parity flow vs a reference checkpoint.

The released reference checkpoint (`models/baseline.pth`) ships in the
upstream release zips only (reference inference.py:104-105) and is not
available in this environment. When it (or any trained `.pth`) is,
this script runs the whole parity pipeline in one command:

    make parity CHECKPOINT=models/baseline.pth
    # == python scripts/parity.py --checkpoint models/baseline.pth

Steps:
  1. convert  — `.pth` -> native `.vrt.npz` via the strict converter
     (round-trips are tested in tests/test_models.py).
  2. separate — run the reference torch `inference.Separator` (CPU) and
     our TPU `Separator` on the same fixture song with the converted
     weights, compare the `*_Instruments` / `*_Vocals` waves within
     float tolerance (BASELINE.md "output fidelity" target).
  3. evaluate — if `--mixtures/--instruments` (MUSDB18-style dirs) are
     given, run the SDR harness (cli/evaluate) for the quality numbers.

Exit code 0 = waves match within tolerance (and SDR report written when
requested); non-zero with a delta report otherwise.
"""

from __future__ import annotations

import argparse
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_DIR = os.environ.get("VR_REFERENCE_DIR", "/root/reference")
if REPO not in sys.path:
    # append, never prepend: the repo's top-level CLI shims
    # (inference.py/train.py) must not shadow same-named modules for
    # other importers in this process
    sys.path.append(REPO)


def import_reference():
    """Import the upstream reference with its heavy deps stubbed (we
    feed spectrograms directly, so librosa/soundfile/cv2 are unused)."""
    for name in ("librosa", "librosa.effects", "soundfile"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["librosa"].effects = sys.modules["librosa.effects"]
    if "cv2" not in sys.modules:
        cv2 = types.ModuleType("cv2")
        cv2.IMREAD_COLOR = 1
        sys.modules["cv2"] = cv2
    if "tqdm" not in sys.modules:
        mod = types.ModuleType("tqdm")
        mod.tqdm = lambda x, *a, **k: x
        sys.modules["tqdm"] = mod
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    from lib import nets as ref_nets

    # the repo ships its own top-level `inference.py` CLI shim, so the
    # reference's must be loaded by explicit file path
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_reference_inference", os.path.join(REFERENCE_DIR, "inference.py")
    )
    ref_inference = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_inference)

    return ref_nets, ref_inference


def fixture_song(sr: int, seconds: float = 12.0) -> np.ndarray:
    """Deterministic synthetic stereo 'song': tonal bed + noise."""
    t = np.arange(int(sr * seconds)) / sr
    g = np.random.default_rng(11)
    left = (
        0.5 * np.sin(2 * np.pi * 392 * t)
        + 0.2 * np.sin(2 * np.pi * 1175 * t)
        + 0.05 * g.standard_normal(len(t))
    )
    right = (
        0.45 * np.sin(2 * np.pi * 196 * t)
        + 0.15 * np.sin(2 * np.pi * 880 * t + 0.7)
        + 0.05 * g.standard_normal(len(t))
    )
    return np.stack([left, right]).astype(np.float32)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", "-P", required=True,
                   help="reference .pth checkpoint (e.g. baseline.pth)")
    p.add_argument("--song", default=None,
                   help="fixture WAV; default: deterministic synth song")
    p.add_argument("--sr", type=int, default=44100)
    p.add_argument("--n_fft", type=int, default=2048)
    p.add_argument("--hop_length", type=int, default=1024)
    p.add_argument("--batchsize", type=int, default=4)
    p.add_argument("--cropsize", type=int, default=256)
    p.add_argument("--nout", type=int, default=32)
    p.add_argument("--nout_lstm", type=int, default=128)
    p.add_argument("--tta", action="store_true")
    p.add_argument("--tolerance", type=float, default=2e-4,
                   help="max |wave delta| allowed (f32 pipeline noise "
                        "across frameworks measures ~1e-5)")
    p.add_argument("--mixtures", default=None,
                   help="MUSDB18-style mixture dir for the SDR harness")
    p.add_argument("--instruments", default=None)
    p.add_argument("--json", default=None, help="SDR report output path")
    p.add_argument("--report", default=None,
                   help="write the step-2 parity result (per-stem max "
                        "delta + SNR dB, param count) as JSON")
    args = p.parse_args(argv)

    import torch

    from vocal_remover_tpu.models import convert
    from vocal_remover_tpu.ops.stft import istft_np, stft_np
    from vocal_remover_tpu.separate.separator import Separator
    from vocal_remover_tpu.utils import audio

    # -- 1. convert ----------------------------------------------------
    native_path = os.path.splitext(args.checkpoint)[0] + convert.NATIVE_SUFFIX
    model, variables = convert.load_model(
        args.checkpoint, args.n_fft, args.hop_length, args.nout,
        args.nout_lstm
    )
    convert.save_native(native_path, variables, convert.model_config(model))
    print(f"[1/3] converted {args.checkpoint} -> {native_path}")

    # -- 2. output parity on the fixture song ---------------------------
    if args.song:
        wave, _ = audio.load(args.song, sr=args.sr, mono=False)
        if wave.ndim == 1:
            wave = np.stack([wave, wave])
    else:
        wave = fixture_song(args.sr)
    X_spec = stft_np(wave, args.n_fft, args.hop_length)

    ref_nets, ref_inference = import_reference()
    tmod = ref_nets.CascadedNet(args.n_fft, args.hop_length, args.nout,
                                args.nout_lstm)
    tmod.load_state_dict(torch.load(args.checkpoint, map_location="cpu"))
    tmod.eval()
    ref_sp = ref_inference.Separator(
        tmod, torch.device("cpu"), args.batchsize, args.cropsize, False
    )
    ref_fn = ref_sp.separate_tta if args.tta else ref_sp.separate
    y_ref_spec, v_ref_spec = ref_fn(X_spec)

    ours = Separator(model, variables, args.batchsize, args.cropsize)
    our_fn = ours.separate_tta if args.tta else ours.separate
    y_spec, v_spec = our_fn(X_spec)

    deltas = {}
    snrs = {}
    ok = True
    for name, a_spec, b_spec in (
        ("Instruments", y_spec, y_ref_spec),
        ("Vocals", v_spec, v_ref_spec),
    ):
        a = istft_np(a_spec, args.n_fft, args.hop_length, wave.shape[-1])
        b = istft_np(b_spec, args.n_fft, args.hop_length, wave.shape[-1])
        d = float(np.abs(a - b).max())
        num = float(np.sum(b.astype(np.float64) ** 2))
        den = float(np.sum((a - b).astype(np.float64) ** 2))
        snr = float("inf") if den == 0 else 10.0 * np.log10(
            num / max(den, 1e-300)
        )
        deltas[name] = d
        snrs[name] = snr
        ok &= d <= args.tolerance
        print(
            f"[2/3] {name}: max wave delta {d:.3e}  SNR {snr:.1f} dB "
            f"({'OK' if d <= args.tolerance else 'FAIL'}, "
            f"tolerance {args.tolerance:g})"
        )

    if args.report:
        import json as json_lib

        from vocal_remover_tpu.models.cascaded import param_count

        report = {
            "checkpoint": args.checkpoint,
            "param_count": param_count(variables),
            "tolerance": args.tolerance,
            "max_wave_delta": deltas,
            "wave_snr_db": snrs,
            "tta": bool(args.tta),
            "ok": bool(ok),
        }
        with open(args.report, "w") as f:
            json_lib.dump(report, f, indent=1)
        print(f"[2/3] parity report -> {args.report}")

    # -- 3. SDR harness --------------------------------------------------
    if args.mixtures and args.instruments:
        from vocal_remover_tpu.cli import evaluate

        ev = [
            "--pretrained_model", native_path,
            "--mixtures", args.mixtures,
            "--instruments", args.instruments,
            "--sr", str(args.sr), "--n_fft", str(args.n_fft),
            "--hop_length", str(args.hop_length),
            "--batchsize", str(args.batchsize),
            "--cropsize", str(args.cropsize),
        ]
        if args.tta:
            ev.append("--tta")
        if args.json:
            ev += ["--json", args.json]
        print("[3/3] SDR harness:")
        evaluate.main(ev)
    else:
        print("[3/3] SDR harness skipped (pass --mixtures/--instruments "
              "pointing at MUSDB18-style dirs to run it)")

    if not ok:
        print("PARITY FAIL:", deltas)
        return 1
    print("PARITY OK:", deltas)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Pitch shifting (phase vocoder + polyphase resample).

The reference's offline augmentation shells out to the external
`soundstretch` binary for pitch shifting (reference augment.py:28-29,
59-60) — a subprocess boundary and an external dependency. This module
provides a built-in equivalent: a standard phase-vocoder time stretch
followed by resampling, semitone-parameterized like `soundstretch
-pitch=N`. Quality is comparable (both are STFT phase-vocoder family
algorithms); outputs are not bit-identical to soundstretch.
"""

from __future__ import annotations

import numpy as np

from vocal_remover_tpu.ops.stft import istft_np, stft_np
from vocal_remover_tpu.utils.audio import resample


def time_stretch(wave: np.ndarray, rate: float, n_fft: int = 2048,
                 hop_length: int = 512) -> np.ndarray:
    """Phase-vocoder time stretch of a (..., L) wave by `rate`
    (rate > 1 speeds up). Librosa-style implementation."""
    spec = stft_np(wave, n_fft, hop_length)  # (..., F, T)
    n_bins, n_frames = spec.shape[-2], spec.shape[-1]

    steps = np.arange(0, n_frames, rate)
    shape = spec.shape[:-1] + (len(steps),)
    stretched = np.zeros(shape, np.complex64)

    phi_advance = np.linspace(0, np.pi * hop_length, n_bins)
    phase_acc = np.angle(spec[..., 0])

    # pad one frame so steps near the end can interpolate
    spec_pad = np.concatenate(
        [spec, np.zeros(spec.shape[:-1] + (2,), spec.dtype)], axis=-1
    )

    for t, step in enumerate(steps):
        i = int(step)
        frac = step - i
        s0 = spec_pad[..., i]
        s1 = spec_pad[..., i + 1]
        mag = (1 - frac) * np.abs(s0) + frac * np.abs(s1)
        stretched[..., t] = mag * np.exp(1.0j * phase_acc)
        dphase = np.angle(s1) - np.angle(s0) - phi_advance
        dphase = dphase - 2 * np.pi * np.round(dphase / (2 * np.pi))
        phase_acc = phase_acc + phi_advance + dphase

    out_len = int(round(wave.shape[-1] / rate))
    return istft_np(stretched, n_fft, hop_length, length=out_len)


def pitch_shift(wave: np.ndarray, sr: int, n_steps: float,
                n_fft: int = 2048, hop_length: int = 512) -> np.ndarray:
    """Shift pitch by `n_steps` semitones, preserving duration."""
    if n_steps == 0:
        return wave.astype(np.float32)
    rate = 2.0 ** (-n_steps / 12.0)
    stretched = time_stretch(wave, rate, n_fft, hop_length)
    # reinterpret at sr/rate and resample to sr: restores the duration
    # while scaling all frequencies by 2**(n_steps/12)
    shifted = resample(
        stretched, orig_sr=int(round(sr / rate)), target_sr=sr
    )
    n = wave.shape[-1]
    if shifted.shape[-1] >= n:
        return shifted[..., :n].astype(np.float32)
    pad = [(0, 0)] * (shifted.ndim - 1) + [(0, n - shifted.shape[-1])]
    return np.pad(shifted, pad).astype(np.float32)

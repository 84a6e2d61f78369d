"""Audio I/O without librosa/soundfile.

The reference loads audio with `librosa.load(..., res_type='kaiser_fast')`
(reference: inference.py:136-138, lib/spec_utils.py:139-142) and writes
16-bit PCM WAV via `soundfile.write` (inference.py:173,178). Neither
library exists in this environment, so this module implements:

  * WAV decode (PCM 8/16/24/32, float32/float64) via scipy.io.wavfile
    plus a manual 24-bit path.
  * Native decoders for FLAC (native/flacdec.c), MP3 (native/mp3dec.c),
    and AAC-LC + HE-AAC (SBR, native/aacdec.c + sbrdec.c) in
    .m4a/.mp4/.aac containers — the reference's full ingest extension
    list (lib/dataset.py:147) without an external backend. An optional
    `ffmpeg` subprocess remains as the fallback for anything else
    (e.g. Vorbis, HE-AAC v2 parametric stereo), gated with a clear
    error when unavailable.
  * Band-limited sinc resampling matching librosa's `kaiser_fast`
    algorithm (utils/resample.py — the reference's res_type,
    inference.py:138); scipy polyphase kept as `res_type='polyphase'`.
  * WAV encode as 16-bit PCM by default (soundfile's WAV default),
    optionally float32.

API shape follows librosa: waves are float32, channel-first (C, L).
"""

from __future__ import annotations

import math
import os
import shutil
import subprocess
import tempfile

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly

__all__ = ["load", "read_wav", "read_flac", "read_mp3", "read_aac",
           "write_wav", "resample", "have_ffmpeg"]

_FFMPEG = shutil.which("ffmpeg")


def have_ffmpeg() -> bool:
    return _FFMPEG is not None


def _pcm24_to_float32(raw: bytes, n_channels: int) -> np.ndarray:
    b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
    x = (
        b[:, 0].astype(np.int32)
        | (b[:, 1].astype(np.int32) << 8)
        | (b[:, 2].astype(np.int32) << 16)
    )
    x = (x ^ 0x800000) - 0x800000  # sign-extend 24 bit
    x = x.astype(np.float32) / 8388608.0
    return x.reshape(-1, n_channels)


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a WAV file -> ((C, L) float32 in [-1, 1], sample_rate)."""
    try:
        sr, data = wavfile.read(path)
    except ValueError:
        # scipy can't do 24-bit; parse manually via the wave module.
        import wave as _wave

        with _wave.open(path, "rb") as f:
            sw = f.getsampwidth()
            if sw != 3:
                raise
            nch = f.getnchannels()
            sr = f.getframerate()
            raw = f.readframes(f.getnframes())
        data = _pcm24_to_float32(raw, nch)

    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)

    if data.ndim == 1:
        data = data[:, None]
    return np.ascontiguousarray(data.T), int(sr)


def write_wav(path: str, wave: np.ndarray, sr: int, subtype: str = "PCM_16"):
    """Write a (C, L) or (L,) float wave. PCM_16 matches soundfile's WAV
    default (what the reference produces); FLOAT writes float32."""
    w = np.asarray(wave, np.float32)
    if w.ndim == 1:
        w = w[None, :]
    data = w.T  # (L, C)
    if subtype == "PCM_16":
        from vocal_remover_tpu import native

        enc = native.pcm16_encode(np.ascontiguousarray(data))
        if enc is not None:
            data = enc
        else:
            data = np.clip(data, -1.0, 1.0 - 1.0 / 32768.0)
            data = np.round(data * 32768.0).astype(np.int16)
    elif subtype == "FLOAT":
        data = data.astype(np.float32)
    else:
        raise ValueError(f"unsupported subtype {subtype!r}")
    if data.shape[1] == 1:
        data = data[:, 0]
    wavfile.write(path, sr, data)


def resample(wave: np.ndarray, orig_sr: int, target_sr: int,
             res_type: str = "kaiser_fast") -> np.ndarray:
    """Resample a (..., L) wave.

    `kaiser_fast` (default) / `kaiser_best`: band-limited sinc
    interpolation with librosa/resampy's constants — the reference's
    loading path (inference.py:138). `polyphase`: scipy polyphase.
    """
    if orig_sr == target_sr:
        return wave.astype(np.float32)
    if res_type == "polyphase":
        g = math.gcd(orig_sr, target_sr)
        up, down = target_sr // g, orig_sr // g
        out = resample_poly(wave.astype(np.float64), up, down, axis=-1)
        return out.astype(np.float32)
    from vocal_remover_tpu.utils import resample as _sinc

    return _sinc.resample(wave, orig_sr, target_sr, res_type)


def read_flac(path: str) -> tuple[np.ndarray, int]:
    """Read a FLAC file via the native decoder (native/flacdec.c)
    -> ((C, L) float32 in [-1, 1], sample_rate)."""
    from vocal_remover_tpu import native

    with open(path, "rb") as f:
        data = f.read()
    out = native.flac_decode(data)
    if out is None:
        raise RuntimeError(
            "FLAC decoding requires the native extension (no C compiler "
            "available) — or install ffmpeg"
        )
    pcm, sr, bps = out
    wave = pcm.astype(np.float32) / float(1 << (bps - 1))
    return np.ascontiguousarray(wave.T), int(sr)


def read_mp3(path: str) -> tuple[np.ndarray, int]:
    """Read an MP3 file via the native decoder (native/mp3dec.c)
    -> ((C, L) float32, sample_rate). MPEG-1/2/2.5 Layer III, CBR/VBR,
    all stereo modes; ID3 and Xing/Info tag frames skipped."""
    from vocal_remover_tpu import native

    with open(path, "rb") as f:
        data = f.read()
    out = native.mp3_decode(data)
    if out is None:
        raise RuntimeError(
            "MP3 decoding requires the native extension (no C compiler "
            "available) — or install ffmpeg"
        )
    wave, sr = out
    return np.ascontiguousarray(wave.T), int(sr)


def read_aac(path: str) -> tuple[np.ndarray, int]:
    """Read an AAC file (.m4a/.mp4 container or raw .aac ADTS) via the
    native decoder (native/aacdec.c) -> ((C, L) float32, sample_rate).
    AAC-LC and HE-AAC (SBR — implicit ADTS or explicit aot-5
    signaling, native/sbrdec.c); HE-AAC v2 (parametric stereo) and
    other object types raise and fall back to ffmpeg when present."""
    from vocal_remover_tpu import native

    with open(path, "rb") as f:
        data = f.read()
    out = native.aac_decode(data)
    if out is None:
        raise RuntimeError(
            "AAC decoding requires the native extension (no C compiler "
            "available) — or install ffmpeg"
        )
    wave, sr = out
    return np.ascontiguousarray(wave.T), int(sr)


def _load_via_ffmpeg(path: str, sr: int | None) -> tuple[np.ndarray, int]:
    if _FFMPEG is None:
        raise RuntimeError(
            f"cannot decode {path!r}: non-WAV input requires ffmpeg, which "
            "is not available in this environment"
        )
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "decoded.wav")
        cmd = [_FFMPEG, "-v", "error", "-i", path, "-f", "wav", "-c:a",
               "pcm_f32le"]
        if sr is not None:
            cmd += ["-ar", str(sr)]
        cmd.append(out)
        subprocess.run(cmd, check=True)
        return read_wav(out)


def load(
    path: str,
    sr: int | None = 44100,
    mono: bool = False,
    dtype=np.float32,
) -> tuple[np.ndarray, int]:
    """librosa.load-compatible entry point.

    Returns ((C, L) float32 — or (L,) when mono=True — , sample_rate).
    Resamples to `sr` when given. Non-WAV containers require ffmpeg.
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        wave, file_sr = read_wav(path)
    elif ext == ".flac":
        try:
            wave, file_sr = read_flac(path)
        except (RuntimeError, ValueError):
            # native decode unavailable or unsupported stream feature:
            # degrade gracefully through ffmpeg when present
            wave, file_sr = _load_via_ffmpeg(path, None)
    elif ext == ".mp3":
        try:
            wave, file_sr = read_mp3(path)
        except (RuntimeError, ValueError):
            wave, file_sr = _load_via_ffmpeg(path, None)
    elif ext in (".m4a", ".mp4", ".aac"):
        try:
            wave, file_sr = read_aac(path)
        except (RuntimeError, ValueError):
            # non-LC object types (e.g. HE-AAC) or a missing compiler:
            # degrade gracefully through ffmpeg when present
            wave, file_sr = _load_via_ffmpeg(path, None)
    else:
        wave, file_sr = _load_via_ffmpeg(path, None)

    if sr is not None and file_sr != sr:
        wave = resample(wave, file_sr, sr)
        file_sr = sr

    if mono and wave.shape[0] > 1:
        wave = wave.mean(axis=0, keepdims=True)
    if mono:
        wave = wave[0]
    elif wave.shape[0] == 1:
        # librosa returns 1-D for mono files even with mono=False
        wave = wave[0]
    return wave.astype(dtype), file_sr

"""Native host-side kernels (optional accelerator).

`get()` returns the compiled `_vrtnative` module or None; every caller
has a numpy fallback. The extension is built on first use when a C
compiler is available (vrtnative.c, ~2 s).
"""

from __future__ import annotations

import numpy as np

_mod = None
_tried = False


def get():
    global _mod, _tried
    if _tried:
        return _mod
    _tried = True
    try:
        from vocal_remover_tpu.native import build as _build

        if _build.ensure_built():
            from vocal_remover_tpu.native import _vrtnative  # type: ignore

            _mod = _vrtnative
    except Exception:
        _mod = None
    return _mod


def load_crop_abs(path: str, start_row: int, n_rows: int,
                  coef: float) -> np.ndarray | None:
    """Fused chunked read + |z|/coef -> (2, F, n_rows) float32, or None
    if the extension is unavailable (caller falls back to numpy)."""
    mod = get()
    if mod is None:
        return None
    data, F = mod.load_crop_abs(path, start_row, n_rows, float(coef))
    return np.frombuffer(data, np.float32).reshape(2, F, n_rows)


def pcm16_encode(wave: np.ndarray) -> np.ndarray | None:
    mod = get()
    if mod is None:
        return None
    w = np.ascontiguousarray(wave, np.float32)
    out = mod.pcm16_encode(w)
    return np.frombuffer(out, np.int16).reshape(wave.shape)


def pcm16_decode(pcm: np.ndarray) -> np.ndarray | None:
    mod = get()
    if mod is None:
        return None
    p = np.ascontiguousarray(pcm, np.int16)
    out = mod.pcm16_decode(p)
    return np.frombuffer(out, np.float32).reshape(pcm.shape)


def flac_decode(data: bytes):
    """FLAC stream bytes -> ((n, ch) int32 pcm, sample_rate, bps), or
    None when the extension is unavailable (caller falls back or
    errors with a clear message)."""
    mod = get()
    if mod is None or not hasattr(mod, "flac_decode"):
        return None
    raw, n, ch, sr, bps = mod.flac_decode(data)
    pcm = np.frombuffer(raw, "<i4").reshape(n, ch)
    return pcm, sr, bps


def mp3_decode(data: bytes):
    """MP3 stream bytes -> ((n, ch) float32 pcm, sample_rate), or None
    when the extension is unavailable (caller falls back to ffmpeg or
    errors with a clear message)."""
    mod = get()
    if mod is None or not hasattr(mod, "mp3_decode"):
        return None
    raw, n, ch, sr = mod.mp3_decode(data)
    pcm = np.frombuffer(raw, np.float32).reshape(n, ch)
    return pcm, sr


def aac_decode(data: bytes):
    """AAC-LC bytes (ADTS stream or MP4/M4A container) -> ((n, ch)
    float32 pcm, sample_rate), or None when the extension is
    unavailable (caller falls back to ffmpeg or errors clearly)."""
    mod = get()
    if mod is None or not hasattr(mod, "aac_decode"):
        return None
    raw, n, ch, sr = mod.aac_decode(data)
    pcm = np.frombuffer(raw, np.float32).reshape(n, ch)
    return pcm, sr


def quantize_u8(a: np.ndarray):
    """float32 array -> ({"q": uint8 array, "scale": f32}, or None when
    the extension is unavailable). Fused max+clip+round single-stream
    pass (the int8 batch-staging hot path)."""
    mod = get()
    if mod is None or not hasattr(mod, "quantize_u8"):
        return None
    a = np.ascontiguousarray(a, np.float32)
    raw, scale = mod.quantize_u8(a)
    return {
        "q": np.frombuffer(raw, np.uint8).reshape(a.shape),
        "scale": np.float32(scale),
    }

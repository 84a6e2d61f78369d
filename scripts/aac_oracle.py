"""Oracle encode/decode helpers for the AAC decoder test/dev harness.

Compiles scripts/aac_oracle_shim.c against the system libavformat/
libavcodec (dev headers) on first use and drives it through ctypes.
ORACLE ONLY: the shipped decoder (native/aacdec.c) has no runtime
dependency on libav*; these wrappers exist so tests can (a) synthesize
real-world AAC-LC fixtures in .m4a/.mp4/.aac containers and (b) compare
the native decoder's output against an independent reference decoder —
the same role libmp3lame/libmpg123 play for the mp3 decoder
(scripts/mp3_oracle.py) and torch plays for the model stack
(SURVEY.md §4).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "aac_oracle_shim.c")
_SO = os.path.join(_HERE, "_aac_oracle_shim.so")

_lib = None


def _build() -> bool:
    cmd = [
        "cc", "-O2", "-shared", "-fPIC", _SRC, "-o", _SO,
        "-lavformat", "-lavcodec", "-lavutil",
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True)
    except FileNotFoundError:
        return False
    return r.returncode == 0 and os.path.exists(_SO)


def _get():
    global _lib
    if _lib is not None:
        return _lib or None
    if not os.path.exists(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        if not _build():
            _lib = False
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _lib = False
        return None
    lib.oracle_decode_file.restype = ctypes.c_int
    lib.oracle_decode_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.oracle_encode_aac.restype = ctypes.c_int
    lib.oracle_encode_aac.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_longlong,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.oracle_free.restype = None
    lib.oracle_free.argtypes = [ctypes.c_void_p]
    lib.oracle_log_capture.restype = None
    lib.oracle_log_capture.argtypes = [ctypes.c_int]
    lib.oracle_last_log.restype = ctypes.c_char_p
    lib.oracle_last_log.argtypes = []
    lib.oracle_clear_log.restype = None
    lib.oracle_clear_log.argtypes = []
    _lib = lib
    return lib


def log_capture(enable: bool = True) -> None:
    """Route libav diagnostics into a ring buffer (read with last_log)
    instead of stderr — the extraction rig classifies probe frames by
    these messages."""
    lib = _get()
    if lib is None:
        raise RuntimeError("libav oracle unavailable")
    lib.oracle_log_capture(1 if enable else 0)


def last_log() -> str:
    lib = _get()
    return lib.oracle_last_log().decode(errors="replace") if lib else ""


def clear_log() -> None:
    lib = _get()
    if lib is not None:
        lib.oracle_clear_log()


def have_oracle() -> bool:
    return _get() is not None


def decode_file(path: str) -> tuple[np.ndarray, int]:
    """Decode any container/codec libav supports.

    Returns ((n, ch) float32, sample_rate)."""
    lib = _get()
    if lib is None:
        raise RuntimeError("libav oracle unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_longlong()
    ch = ctypes.c_int()
    sr = ctypes.c_int()
    err = ctypes.create_string_buffer(256)
    rc = lib.oracle_decode_file(
        path.encode(), ctypes.byref(out), ctypes.byref(n), ctypes.byref(ch),
        ctypes.byref(sr), err, len(err))
    if rc != 0:
        raise RuntimeError(f"oracle decode failed: {err.value.decode()}")
    try:
        arr = np.ctypeslib.as_array(out, shape=(n.value, ch.value)).copy()
    finally:
        lib.oracle_free(out)
    return arr, sr.value


def decode_bytes(data: bytes, suffix: str = ".m4a") -> tuple[np.ndarray, int]:
    with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
        f.write(data)
        path = f.name
    try:
        return decode_file(path)
    finally:
        os.unlink(path)


def encode_aac(wave: np.ndarray, sr: int, container: str = "m4a",
               bitrate: int = 128_000, opts: str = "") -> bytes:
    """Encode a (ch, n) or (n,) float wave as AAC-LC.

    container: "m4a", "mp4", or "adts" (raw .aac stream).
    opts: libav private options, e.g. "aac_pns=0:aac_tns=1"."""
    lib = _get()
    if lib is None:
        raise RuntimeError("libav oracle unavailable")
    w = np.asarray(wave, np.float32)
    if w.ndim == 1:
        w = w[None, :]
    pcm = np.ascontiguousarray(w.T)  # (n, ch) interleaved
    suffix = {"m4a": ".m4a", "mp4": ".mp4", "adts": ".aac"}[container]
    with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
        path = f.name
    try:
        err = ctypes.create_string_buffer(256)
        rc = lib.oracle_encode_aac(
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pcm.shape[0], pcm.shape[1], sr, bitrate, path.encode(),
            opts.encode(), err, len(err))
        if rc != 0:
            raise RuntimeError(f"oracle encode failed: {err.value.decode()}")
        with open(path, "rb") as f:
            return f.read()
    finally:
        os.unlink(path)


if __name__ == "__main__":
    t = np.arange(44100 * 2) / 44100.0
    w = np.stack([
        0.4 * np.sin(2 * np.pi * 440 * t),
        0.4 * np.sin(2 * np.pi * 660 * t),
    ]).astype(np.float32)
    for c in ("m4a", "adts"):
        data = encode_aac(w, 44100, container=c)
        dec, sr = decode_bytes(data, suffix={"m4a": ".m4a", "adts": ".aac"}[c])
        print(c, len(data), "bytes ->", dec.shape, sr)

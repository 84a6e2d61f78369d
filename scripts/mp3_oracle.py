"""Oracle encode/decode helpers for the mp3 decoder test/dev harness.

Drives the system LAME encoder (libmp3lame) and the libmpg123 decoder
bundled with pygame through ctypes. Both are ORACLES ONLY: the shipped
decoder (native/mp3dec.c) has no runtime dependency on either; these
wrappers exist so tests can (a) synthesize real-world mp3 fixtures at
every MPEG version / rate / mode and (b) compare mp3dec's output
against an independent reference decoder, the same role torch plays
for the model stack (SURVEY.md §4).
"""

from __future__ import annotations

import ctypes
import glob
import os

import numpy as np

_LAME_PATHS = [
    "/usr/lib/x86_64-linux-gnu/libmp3lame.so.0",
    "libmp3lame.so.0",
]
_MPG123_GLOBS = [
    "/opt/venv/lib/python*/site-packages/pygame.libs/libmpg123*.so*",
    "/usr/lib/x86_64-linux-gnu/libmpg123.so*",
]

MPG123_ENC_FLOAT_32 = 0x200
MPG123_ADD_FLAGS = 2
MPG123_REMOVE_FLAGS = 13
MPG123_QUIET = 0x20
MPG123_GAPLESS = 0x40
MPG123_IGNORE_INFOFRAME = 0x4000


def _find(paths):
    for p in paths:
        hits = sorted(glob.glob(p)) if any(c in p for c in "*?") else (
            [p] if os.path.exists(p) or "/" not in p else [])
        for h in hits:
            try:
                return ctypes.CDLL(h)
            except OSError:
                continue
    return None


_lame = None
_mpg = None


def have_lame() -> bool:
    global _lame
    if _lame is None:
        _lame = _find(_LAME_PATHS) or False
    return bool(_lame)


def have_mpg123() -> bool:
    global _mpg
    if _mpg is None:
        _mpg = _find(_MPG123_GLOBS) or False
        if _mpg:
            _mpg.mpg123_init()
            _mpg.mpg123_new.restype = ctypes.c_void_p
            _mpg.mpg123_strerror.restype = ctypes.c_char_p
    return bool(_mpg)


def lame_encode(wave: np.ndarray, sr: int, *, bitrate: int = 128,
                mode: int | None = None, out_sr: int | None = None,
                vbr_tag: bool = False, reservoir: bool = True,
                quality: int = 2) -> bytes:
    """Encode a (C, L) or (L,) float wave to an mp3 byte stream.

    mode: LAME enum — 0 stereo, 1 joint stereo, 3 mono (default: per
    channel count). out_sr pins the mp3 sample rate (else lame picks).
    """
    assert have_lame(), "libmp3lame not available"
    w = np.asarray(wave, np.float32)
    if w.ndim == 1:
        w = w[None]
    nch = w.shape[0]
    _lame.lame_init.restype = ctypes.c_void_p  # pointer would truncate to int
    gf = ctypes.c_void_p(_lame.lame_init())
    _lame.lame_set_in_samplerate(gf, sr)
    _lame.lame_set_num_channels(gf, nch)
    _lame.lame_set_brate(gf, bitrate)
    _lame.lame_set_quality(gf, quality)
    _lame.lame_set_bWriteVbrTag(gf, 1 if vbr_tag else 0)
    if not reservoir:
        _lame.lame_set_disable_reservoir(gf, 1)
    if mode is None:
        mode = 3 if nch == 1 else 1
    _lame.lame_set_mode(gf, mode)
    if out_sr is not None:
        _lame.lame_set_out_samplerate(gf, out_sr)
    rc = _lame.lame_init_params(gf)
    assert rc >= 0, f"lame_init_params failed ({rc})"
    left = np.ascontiguousarray(w[0])
    # right MUST be NULL for mono: lame's float entry dereferences the
    # right buffer per-channel and a duplicate pointer crashes it
    right = (np.ascontiguousarray(w[1]).ctypes.data_as(ctypes.c_void_p)
             if nch == 2 else None)
    n = left.size
    buf = ctypes.create_string_buffer(int(1.25 * n) + 7200)
    _lame.lame_encode_buffer_ieee_float.restype = ctypes.c_int
    wrote = _lame.lame_encode_buffer_ieee_float(
        gf, left.ctypes.data_as(ctypes.c_void_p), right, n, buf, len(buf))
    assert wrote >= 0, f"lame encode failed ({wrote})"
    tail = ctypes.create_string_buffer(7200)
    wrote2 = _lame.lame_encode_flush(gf, tail, len(tail))
    out = buf.raw[:wrote] + tail.raw[:wrote2]
    _lame.lame_close(gf)
    return out


def mpg123_decode(data: bytes, *, gapless: bool = False,
                  parse_infoframe: bool = True) -> tuple[np.ndarray, int]:
    """Decode an mp3 byte stream -> ((n, ch) float32, sample_rate).

    gapless=False + parse_infoframe=True matches mp3dec.c's behavior
    (Xing/Info tag frame skipped, no encoder-delay trimming).
    """
    assert have_mpg123(), "libmpg123 not available"
    import tempfile

    h = ctypes.c_void_p(_mpg.mpg123_new(None, None))
    assert h
    try:
        flags_add = MPG123_QUIET | \
            (0 if parse_infoframe else MPG123_IGNORE_INFOFRAME)
        _mpg.mpg123_param(h, MPG123_ADD_FLAGS, flags_add,
                          ctypes.c_double(0))
        if not gapless:
            _mpg.mpg123_param(h, MPG123_REMOVE_FLAGS, MPG123_GAPLESS,
                              ctypes.c_double(0))
        _mpg.mpg123_format_none(h)
        for rate in (8000, 11025, 12000, 16000, 22050, 24000, 32000,
                     44100, 48000):
            _mpg.mpg123_format(h, ctypes.c_long(rate), 3,
                               MPG123_ENC_FLOAT_32)
        with tempfile.NamedTemporaryFile(suffix=".mp3") as f:
            f.write(data)
            f.flush()
            rc = _mpg.mpg123_open(h, f.name.encode())
            assert rc == 0, f"mpg123_open rc={rc}"
            rate = ctypes.c_long()
            ch = ctypes.c_int()
            enc = ctypes.c_int()
            _mpg.mpg123_getformat(h, ctypes.byref(rate), ctypes.byref(ch),
                                  ctypes.byref(enc))
            out = bytearray()
            rb = ctypes.create_string_buffer(1 << 18)
            done = ctypes.c_size_t()
            while True:
                rc = _mpg.mpg123_read(h, rb, len(rb), ctypes.byref(done))
                out += rb.raw[: done.value]
                if rc != 0 and done.value == 0:
                    break
            _mpg.mpg123_close(h)
        pcm = np.frombuffer(bytes(out), np.float32)
        if ch.value > 1:
            pcm = pcm.reshape(-1, ch.value)
        else:
            pcm = pcm.reshape(-1, 1)
        return pcm, int(rate.value)
    finally:
        _mpg.mpg123_delete(h)

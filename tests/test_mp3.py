"""Native MP3 decoder (native/mp3dec.c) vs the libmpg123 oracle.

Closes the reference's mp3 ingest path (reference inference.py:136-138
decodes mp3 via librosa -> audioread -> ffmpeg; lib/dataset.py:147
lists the accepted extensions) without an external backend.

Three evidence layers:
  1. Full-file decodes of LAME-encoded fixtures across MPEG versions,
     sample rates, stereo modes, CBR/VBR, tag framing — >= 90 dB SNR
     against libmpg123 (float decoders agree to ~130 dB in practice).
  2. Feature probes built with the hand-rolled bitstream writer
     (scripts/mp3_bitstream.py) for paths LAME never emits: intensity
     stereo, mixed blocks, subblock gains, scfsi, count1 table B.
  3. A sampled Huffman-table regression re-running the oracle
     extraction rig (scripts/mp3_extract_tables.py) against the baked
     tables.

Oracles (libmp3lame encoder, libmpg123 decoder) are loaded via ctypes
by scripts/mp3_oracle.py; every test skips cleanly when absent. The
shipped decoder itself has no dependency on either.
"""

import os
import sys

import numpy as np
import pytest

from vocal_remover_tpu import native
from vocal_remover_tpu.utils import audio

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from mp3_bitstream import Granule, build_frame, probe_stream, silent  # noqa: E402
import mp3_oracle as oracle  # noqa: E402


@pytest.fixture(scope="module")
def ext():
    mod = native.get()
    if mod is None or not hasattr(mod, "mp3_decode"):
        pytest.skip("native extension unavailable")
    return mod


@pytest.fixture(scope="module")
def lame():
    if not oracle.have_lame():
        pytest.skip("libmp3lame oracle unavailable")
    return oracle.lame_encode


@pytest.fixture(scope="module")
def mpg123():
    if not oracle.have_mpg123():
        pytest.skip("libmpg123 oracle unavailable")
    return oracle.mpg123_decode


def _tone(sr, secs=1.5, ch=1, seed=0):
    t = np.arange(int(sr * secs)) / sr
    rng = np.random.default_rng(seed)
    base = 0.3 * np.sin(2 * np.pi * 440 * t) + \
        0.08 * np.sin(2 * np.pi * 1310 * t) + \
        0.02 * rng.standard_normal(t.size)
    if ch == 1:
        return base.astype(np.float32)
    return np.stack([base, np.roll(base, 97) * 0.8]).astype(np.float32)


def _snr_vs_oracle(ext, mpg123, data):
    """best-aligned SNR (dB) of the native decode vs the oracle"""
    ref, _ = mpg123(data)
    raw, n, ch, sr = ext.mp3_decode(data)
    mine = np.frombuffer(raw, np.float32).reshape(n, ch)
    assert ch == ref.shape[1]
    best = 1e9
    for lag in (-1152, 0, 1152):
        worst = 0.0  # worst channel at this lag (one global decoder delay)
        for c in range(ch):
            a, b = (ref[lag:, c], mine[:, c]) if lag >= 0 else \
                (ref[:, c], mine[-lag:, c])
            L = min(len(a), len(b))
            r = float(np.sqrt(np.mean((a[:L] - b[:L]) ** 2)))
            worst = max(worst, r)
        best = min(best, worst)
    sig = float(np.sqrt(np.mean(ref ** 2)))
    return 20 * np.log10(max(sig, 1e-12) / max(best, 1e-12))


# --------------------------------------------------------------------
# 1. full-file oracle parity over the real-world encoder matrix

CASES = [
    # (name, sr, ch, encode kwargs)
    ("v1_mono_44k", 44100, 1, {}),
    ("v1_stereo_js", 44100, 2, {}),
    ("v1_stereo_plain", 44100, 2, {"mode": 0}),
    ("v1_48k_192", 48000, 2, {"out_sr": 48000, "bitrate": 192}),
    ("v1_32k", 32000, 1, {"out_sr": 32000}),
    ("v1_xing_tag", 44100, 2, {"vbr_tag": True}),
    ("v1_no_reservoir", 44100, 1, {"reservoir": False}),
    ("v2_22k", 22050, 2, {"out_sr": 22050, "bitrate": 64}),
    ("v2_16k", 16000, 1, {"out_sr": 16000, "bitrate": 32}),
    ("v25_11k", 11025, 1, {"out_sr": 11025, "bitrate": 16}),
    ("v25_8k", 8000, 1, {"out_sr": 8000, "bitrate": 16}),
]


@pytest.mark.parametrize("name,sr,ch,kw", CASES, ids=[c[0] for c in CASES])
def test_lame_oracle_parity(ext, lame, mpg123, name, sr, ch, kw):
    data = lame(_tone(sr, ch=ch), sr, **kw)
    assert _snr_vs_oracle(ext, mpg123, data) > 90.0


def test_true_vbr(ext, mpg123):
    if not oracle.have_lame():
        pytest.skip("libmp3lame oracle unavailable")
    import ctypes

    _l = oracle._lame
    _l.lame_init.restype = ctypes.c_void_p
    w = _tone(44100, ch=1)
    gf = ctypes.c_void_p(_l.lame_init())
    _l.lame_set_in_samplerate(gf, 44100)
    _l.lame_set_num_channels(gf, 1)
    _l.lame_set_mode(gf, 3)
    _l.lame_set_VBR(gf, 4)
    _l.lame_set_VBR_q(gf, 3)
    _l.lame_set_bWriteVbrTag(gf, 1)
    assert _l.lame_init_params(gf) >= 0
    buf = ctypes.create_string_buffer(int(1.25 * w.size) + 7200)
    _l.lame_encode_buffer_ieee_float.restype = ctypes.c_int
    n = _l.lame_encode_buffer_ieee_float(
        gf, w.ctypes.data_as(ctypes.c_void_p), None, w.size, buf, len(buf))
    tail = ctypes.create_string_buffer(7200)
    n2 = _l.lame_encode_flush(gf, tail, len(tail))
    data = buf.raw[:n] + tail.raw[:n2]
    _l.lame_close(gf)
    assert _snr_vs_oracle(ext, mpg123, data) > 90.0


def test_id3_tags_skipped(ext, lame, mpg123):
    body = lame(_tone(44100), 44100)
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 2, 0]) + b"\x00" * 256
    data = id3v2 + body + b"TAG" + b"\x00" * 125
    assert _snr_vs_oracle(ext, mpg123, data) > 90.0
    # length identical to the untagged stream
    assert ext.mp3_decode(data)[1] == ext.mp3_decode(body)[1]


# --------------------------------------------------------------------
# 2. feature probes for paths LAME never emits

T1 = {(0, 0): "1", (0, 1): "001", (1, 0): "01", (1, 1): "000"}
PAIR = T1[(1, 1)] + "00"


def _probe_snr(ext, mpg123, granule, **kw):
    data = probe_stream([granule], **kw)
    return _snr_vs_oracle(ext, mpg123, data)


def test_probe_short_blocks_with_gains(ext, mpg123):
    g = Granule(bits=(PAIR) * 3, big_values=3, window_switching=1,
                block_type=2, table_select=(1, 1, 0),
                subblock_gain=(1, 2, 3))
    assert _probe_snr(ext, mpg123, g) > 90.0


def test_probe_mixed_block(ext, mpg123):
    g = Granule(bits=PAIR * 4, big_values=4, window_switching=1,
                block_type=2, mixed_block=1, table_select=(1, 1, 0))
    assert _probe_snr(ext, mpg123, g) > 90.0


def test_probe_ws_long_region_boundary(ext, mpg123):
    """bt=1/3 granules straddling the implied region0/region1 split —
    the boundary is table-visible (t1 vs t13 codes): a wrong split
    desynchronizes the whole granule (caught live on LAME attack
    frames; MPEG1 uses 36 lines for ALL ws granules, not 54)."""
    xlen, ylen, lb, lens, codes = ext.mp3_huff_get(13)
    lens = list(lens)
    codes = np.frombuffer(codes, np.uint16)
    idx = 2 * ylen + 1
    c13 = format(codes[idx], f"0{lens[idx]}b")
    for bt in (1, 3):
        g = Granule(bits=PAIR * 18 + (c13 + "00") * 42, big_values=60,
                    window_switching=1, block_type=bt,
                    table_select=(1, 13, 0))
        assert _probe_snr(ext, mpg123, g) > 90.0, f"bt={bt}"


def test_probe_scfsi_partial(ext, mpg123):
    sfbits = "".join(f"{v:03b}" for v in [2] * 11 + [1] * 10)
    part = "".join(f"{v:03b}" for v in [3] * 10)
    g0 = Granule(bits=sfbits + PAIR * 20, big_values=20,
                 scalefac_compress=13, table_select=(1, 1, 1))
    g1 = Granule(bits=part + PAIR * 20, big_values=20,
                 scalefac_compress=13, table_select=(1, 1, 1))
    fr = build_frame([[g0], [g1]], scfsi=[[1, 0, 1, 0]])
    sil = build_frame([[silent()], [silent()]])
    assert _snr_vs_oracle(ext, mpg123, fr + sil * 2) > 90.0


def test_probe_count1_tables(ext, mpg123):
    xlen, ylen, lb, lens, codes = ext.mp3_huff_get(32)
    lens = list(lens)
    codes = np.frombuffer(codes, np.uint16)
    qa = format(codes[15], f"0{lens[15]}b") + "0000"
    for sel, bits in ((0, PAIR * 2 + qa), (1, PAIR * 2 + "1111" + "0000")):
        g = Granule(bits=bits, big_values=2, count1table_select=sel,
                    table_select=(1, 1, 1))
        assert _probe_snr(ext, mpg123, g) > 90.0, f"count1 sel={sel}"


def test_probe_intensity_stereo(ext, mpg123):
    """LSF intensity positions + MPEG1 intensity ratios (LAME never
    writes intensity; ISO 11172-3 2.4.3.4.9.3 semantics)."""
    # MPEG1: left channel carries the signal, right band zero, is_pos
    # from the right channel's scalefactors. mode_ext=1 -> intensity.
    sfbits = "".join(f"{v:03b}" for v in [2] * 11 + [1] * 10)
    gl = Granule(bits=PAIR * 40, big_values=40, table_select=(1, 1, 1))
    gr = Granule(bits=sfbits, big_values=0, scalefac_compress=13)
    fr = build_frame([[gl, gr], [silent(), silent()]], mode=1, mode_ext=1)
    sil = build_frame([[silent(), silent()], [silent(), silent()]],
                      mode=1, mode_ext=1)
    assert _snr_vs_oracle(ext, mpg123, fr + sil * 2) > 90.0


def test_probe_ms_stereo(ext, mpg123):
    ga = Granule(bits=PAIR * 30, big_values=30, table_select=(1, 1, 1))
    gb = Granule(bits=(T1[(1, 0)] + "0") * 30, big_values=30,
                 table_select=(1, 1, 1))
    fr = build_frame([[ga, gb], [silent(), silent()]], mode=1, mode_ext=2)
    sil = build_frame([[silent(), silent()], [silent(), silent()]],
                      mode=1, mode_ext=2)
    assert _snr_vs_oracle(ext, mpg123, fr + sil * 2) > 90.0


# --------------------------------------------------------------------
# 3. sampled Huffman regression against the baked tables

def test_huffman_tables_sampled(ext, mpg123):
    """Re-run the oracle extraction probes on a sample of codewords of
    the big ESC tables and check the baked tables reproduce them."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import mp3_extract_tables as x

    basis = x.build_basis()
    rng = np.random.default_rng(7)
    for tid in (13, 16, 24):
        xlen, ylen, lb, lens_b, codes_b = ext.mp3_huff_get(tid)
        lens = list(lens_b)
        codes = np.frombuffer(codes_b, np.uint16)
        pick = rng.choice(xlen * xlen, size=12, replace=False)
        probes = []
        for idx in pick:
            code = format(codes[idx], f"0{lens[idx]}b")
            # append sign bits (+linbits placeholders are only read for
            # value 15; sampled pairs below 15 keep the probe simple)
            xv, yv = idx // xlen, idx % xlen
            if xv == 15 or yv == 15:
                continue
            bits = code + ("0" if xv else "") + ("0" if yv else "")
            probes.append((xv, yv, Granule(
                bits=bits, big_values=1, table_select=(tid, 0, 0))))
        segs = x.batch_probe([p[2] for p in probes])
        for (xv, yv, _), seg in zip(probes, segs):
            v = x.fit_lines(basis, seg)
            assert (round(v[0]), round(v[1])) == (xv, yv), \
                f"t{tid}: baked code for ({xv},{yv}) decodes to {v[:2]}"


def test_huff_set_alias_id(ext, lame):
    """mp3_huff_set on an ESC alias id (17-23/25-31) must canonicalize
    to the owning base table: the aliases share the base's tree via
    struct copies, and rebuilding one in place would free that shared
    tree out from under its siblings (use-after-free regression)."""
    data = lame(_tone(44100), 44100)
    before = ext.mp3_decode(data)
    x16 = ext.mp3_huff_get(16)
    ext.mp3_huff_set(19, x16[3], x16[4])  # same codes via an alias id
    x19 = ext.mp3_huff_get(19)
    assert x19[3] == x16[3] and x19[4] == x16[4]
    after = ext.mp3_decode(data)  # ESC tables still decode
    assert before[1:] == after[1:] and before[0] == after[0]


# --------------------------------------------------------------------
# malformed input + loader integration

def test_reject_garbage(ext):
    for bad in (b"", bytes(range(256)) * 40,
                b"\xff\xfd\x90\x00" + b"\x00" * 400):  # layer II
        with pytest.raises(ValueError):
            ext.mp3_decode(bad)


def test_truncated_stream_decodes_prefix(ext, lame):
    data = lame(_tone(44100), 44100)
    raw, n, ch, sr = ext.mp3_decode(data[: len(data) // 2])
    assert n > 0 and sr == 44100


def test_audio_load_mp3(ext, lame, tmp_path):
    w = _tone(44100, ch=2)
    p = tmp_path / "song.mp3"
    p.write_bytes(lame(w, 44100))
    out, sr = audio.load(str(p), sr=44100)
    assert sr == 44100 and out.shape[0] == 2
    # mp3 pads with encoder delay; the tone must survive inside
    L = min(out.shape[1], w.shape[1])
    corr = np.corrcoef(
        np.abs(np.fft.rfft(out[0, :L]))[:2000],
        np.abs(np.fft.rfft(w[0, :L]))[:2000])[0, 1]
    assert corr > 0.99
    out22, sr22 = audio.load(str(p), sr=22050)
    assert sr22 == 22050 and out22.shape[1] == pytest.approx(
        out.shape[1] / 2, abs=2)

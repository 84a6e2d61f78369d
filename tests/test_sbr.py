"""SBR (HE-AAC) groundwork: probe-extracted Huffman codebooks, the
bitstream parser model, and the reference SBR chain vs the libav
oracle on hand-minted streams.

Closes the reference's HE-AAC ingest gap (reference decodes HE-AAC via
librosa -> audioread -> ffmpeg, inference.py:136-138).  Evidence
layers, mirroring tests/test_aac.py:

  1. Static codebook invariants: every extracted book is prefix-free,
     Kraft-complete, value-contiguous and matches the spec's entry
     counts (ISO/IEC 14496-3 tables 4.A.74-83 shapes).
  2. Writer -> parser roundtrip over randomized frame grids, delta
     modes and amp-res switches (FIXFIX/1 forces 1.5 dB books).
  3. Closed-loop oracle match: streams whose envelopes/noise floors
     are ACTUALLY Huffman-coded with the extracted books decode on the
     libav oracle to the levels the reference SBR chain
     (scripts/sbr_ref.py) computes from the intended values — a wrong
     codeword or value desyncs the parse and collapses the SNR.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import aac_oracle as oracle  # noqa: E402

_SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")

EXPECT_BOOKS = {
    "f_env_3": (63, -31, 31), "t_env_3": (63, -31, 31),
    "f_env_1": (121, -60, 60), "t_env_1": (121, -60, 60),
    "f_env_bal_3": (25, -12, 12), "t_env_bal_3": (25, -12, 12),
    "f_env_bal_1": (49, -24, 24), "t_env_bal_1": (49, -24, 24),
    "t_noise_3": (63, -31, 31), "t_noise_bal_3": (25, -12, 12),
}


@pytest.fixture(scope="module")
def state():
    with open(os.path.join(_SCRIPTS, "sbr_huff_state.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def orc():
    if not oracle.have_oracle():
        pytest.skip("libav oracle unavailable")
    oracle.log_capture(True)
    return oracle


# ---------------------------------------------------------------------------
# 1. static codebook invariants


def test_books_complete(state):
    for name, (n, lo, hi) in EXPECT_BOOKS.items():
        tbl = state[name]
        assert len(tbl) == n, name
        vals = sorted(int(v) for v in tbl)
        assert vals == list(range(lo, hi + 1)), name
        words = list(tbl.values())
        assert len(set(words)) == n, name
        kraft = sum(2.0 ** -len(w) for w in words)
        assert abs(kraft - 1.0) < 1e-12, (name, kraft)
        # prefix-free
        ws = sorted(words)
        for a, b in zip(ws, ws[1:]):
            assert not b.startswith(a), (name, a, b)


def test_books_zero_is_shortest(state):
    """The most probable symbol (delta 0) must carry the shortest
    codeword in every book — a structural sanity check on values."""
    for name in EXPECT_BOOKS:
        tbl = state[name]
        shortest = min(len(w) for w in tbl.values())
        assert len(tbl["0"]) == shortest, name


# ---------------------------------------------------------------------------
# 2. writer -> parser roundtrip


def _rand_channel(rng, ft, prev_env, prev_noise):
    import sbr_bitstream as sb
    fc = int(rng.integers(0, 4))
    if fc == sb.FIXFIX:
        ne = int(rng.choice([1, 2, 4]))
        ch = sb.SbrChannel(frame_class=fc, num_env=ne,
                           freq_res=[int(rng.integers(0, 2))] * ne)
    else:
        nrel0 = int(rng.integers(0, 2)) if fc != sb.FIXVAR else 0
        nrel1 = int(rng.integers(0, 3)) if fc != sb.VARFIX else 0
        if fc == sb.VARFIX:
            nrel0 = int(rng.integers(0, 3))
        ne = nrel0 + nrel1 + 1
        ch = sb.SbrChannel(
            frame_class=fc, num_env=ne,
            var_bord_0=int(rng.integers(0, 3)),
            var_bord_1=int(rng.integers(0, 3)),
            rel_bord_0=[int(rng.choice([2, 4, 6, 8]))
                        for _ in range(nrel0)],
            rel_bord_1=[int(rng.choice([2, 4, 6, 8]))
                        for _ in range(nrel1)],
            pointer=int(rng.integers(0, ne + 1)),
            freq_res=[int(rng.integers(0, 2)) for _ in range(ne)])
    ch.df_env = [int(rng.integers(0, 2)) for _ in range(ch.num_env)]
    if prev_env is None:
        ch.df_env[0] = 0
    ch.df_noise = [int(rng.integers(0, 2))
                   for _ in range(ch.n_noise_env())]
    if prev_noise is None:
        ch.df_noise[0] = 0
    ch.invf = [int(rng.integers(0, 4)) for _ in range(ft.n_q)]
    env = []
    for l in range(ch.num_env):
        n = ft.env_bands(ch.freq_res[l])
        if ch.df_env[l] == 0:
            vals = [int(rng.integers(10, 40))]
            for _ in range(n - 1):
                vals.append(vals[-1] + int(rng.integers(-3, 4)))
        else:
            vals = [int(rng.integers(-3, 4)) for _ in range(n)]
        env.append(vals)
    ch.env_sf = env
    noise = []
    for l in range(ch.n_noise_env()):
        if ch.df_noise[l] == 0:
            q0 = int(rng.integers(5, 25))
            vals = ([q0] + [q0 + int(rng.integers(-2, 3))
                            for _ in range(ft.n_q - 1)])[:ft.n_q]
        else:
            vals = [int(rng.integers(-2, 3)) for _ in range(ft.n_q)]
        noise.append(vals)
    ch.noise_sf = noise
    if rng.random() < 0.3:
        ch.add_harmonic = [int(rng.integers(0, 2))
                           for _ in range(ft.n_high)]
    return ch


def _abs_env(ch, ft, prev_env):
    """Absolute envelope values a stateful decoder should produce."""
    out = []
    pe = prev_env
    for l in range(ch.num_env):
        n = ft.env_bands(ch.freq_res[l])
        if ch.df_env[l] == 0:
            absv = list(ch.env_sf[l])
        else:
            pv, pres = pe
            ptab, ctab = ft.env_table(pres), ft.env_table(ch.freq_res[l])
            absv = []
            for k in range(n):
                j = 0
                while j + 1 < len(ptab) and ptab[j + 1] <= ctab[k]:
                    j += 1
                absv.append(pv[j] + ch.env_sf[l][k])
        out.append(absv)
        pe = (absv, ch.freq_res[l])
    return out, pe


def test_parser_roundtrip_sce():
    import sbr_bitstream as sb
    import sbr_parse as sp
    from aac_bitstream import BitWriter

    books = sp.Books()
    rng = np.random.default_rng(0)
    hdr = sb.SbrHeader(amp_res=1, start_freq=5, stop_freq=5,
                       xover_band=0)
    ft = hdr.tables(44100)
    parser = sp.SbrParser(44100, books)
    prev_env = prev_noise = None
    for frame in range(150):
        ch = _rand_channel(rng, ft, prev_env, prev_noise)
        huff = books.writer_huff(ch.amp_res_used(hdr.amp_res))
        data = sb.SbrData(header=hdr, channels=[ch], fs_sbr=44100,
                          send_header=(frame == 0), huff=huff)
        w = BitWriter()
        data.write(w)
        got = parser.parse("".join(w.bits), stereo=False).channels[0]
        for f in ("frame_class", "num_env", "freq_res", "df_env",
                  "df_noise", "invf"):
            assert getattr(ch, f) == getattr(got, f), (frame, f)
        assert (ch.add_harmonic or []) == (got.add_harmonic or [])
        absenv, prev_env = _abs_env(ch, ft, prev_env)
        assert got.env_sf == absenv, frame
        pn = prev_noise
        for l in range(ch.n_noise_env()):
            if ch.df_noise[l] == 0:
                absq = list(ch.noise_sf[l])
            else:
                absq = [pn[k] + ch.noise_sf[l][k]
                        for k in range(ft.n_q)]
            assert got.noise_sf[l] == absq, (frame, l)
            pn = absq
        prev_noise = pn


# ---------------------------------------------------------------------------
# 3. closed-loop oracle match with Huffman-coded payloads


def _aligned_snr(a, b, skip=8192, n=16384, max_lag=4096):
    seg = a[skip:skip + n]
    best = (1e30, 0, 1.0)
    for lag in range(-max_lag, max_lag):
        lo = skip + lag
        if lo < 0 or lo + n > len(b):
            continue
        cand = b[lo:lo + n]
        den = float((cand * cand).sum())
        if den == 0:
            continue
        g = float((seg * cand).sum()) / den
        e = float(((seg - g * cand) ** 2).mean())
        if e < best[0]:
            best = (e, lag, g)
    e, lag, g = best
    p = float((seg ** 2).mean())
    return 10 * np.log10(p / max(e, 1e-30))


def _mint_and_compare(orc, hdr, coded_chans, abs_chans, nframes=24):
    """coded_chans feed the writer (df-coded values), abs_chans feed
    the reference chain (absolute values); returns aligned SNR."""
    import aac_lc_encode as lc
    import sbr_bitstream as sb
    import sbr_parse as sp
    import sbr_ref
    from aac_bitstream import adts_frame
    from vocal_remover_tpu import native

    if native.get() is None:
        pytest.skip("native extension unavailable")
    books = sp.Books()
    rng = np.random.default_rng(3)
    sces = [lc.encode_sce(lc.dense_spectrum(22050, 200, 9000, rng=rng),
                          22050, global_gain=170) for _ in range(7)]
    he, lco = [], []
    for i in range(nframes):
        ch = coded_chans[i % len(coded_chans)]
        huff = books.writer_huff(ch.amp_res_used(hdr.amp_res))
        data = sb.SbrData(header=hdr, channels=[ch], fs_sbr=44100,
                          huff=huff)
        fil = sb.sbr_fil(data)
        he.append(adts_frame([sces[i % 7], fil], sr=22050))
        lco.append(adts_frame([sces[i % 7]], sr=22050))
    ref, sr = orc.decode_bytes(b"".join(he), suffix=".aac")
    assert sr == 44100
    ref = ref[:, 0]
    core, _ = native.aac_decode(b"".join(lco))
    core = np.asarray(core)
    if core.ndim == 2:
        core = core[:, 0]
    dec = sbr_ref.SbrDecoder(hdr, 44100)
    ours = np.concatenate([
        dec.frame(core[i * 1024:(i + 1) * 1024],
                  abs_chans[i % len(abs_chans)])
        for i in range(len(core) // 1024)])
    return _aligned_snr(ref, ours)


def test_oracle_huffman_env_f(orc):
    """Multi-band envelopes with freq-delta Huffman coding (3.0 dB)."""
    import sbr_bitstream as sb
    hdr = sb.SbrHeader(amp_res=1, start_freq=5, stop_freq=5,
                       xover_band=0)
    ft = hdr.tables(44100)
    rng = np.random.default_rng(11)
    chans = []
    for _ in range(4):
        vals = [int(rng.integers(18, 26))]
        for _ in range(ft.n_high - 1):
            vals.append(int(np.clip(vals[-1] + rng.integers(-4, 5),
                                    10, 32)))
        chans.append(sb.SbrChannel(
            num_env=2, freq_res=[1, 1], df_env=[0, 0], df_noise=[0, 0],
            invf=[1] * ft.n_q,
            env_sf=[vals, vals[::-1]],
            noise_sf=[[28] * ft.n_q, [28] * ft.n_q]))
    snr = _mint_and_compare(orc, hdr, chans, chans)
    assert snr > 45, snr


def test_oracle_huffman_env_f_amp0(orc):
    """1.5 dB books via amp_res=0 header."""
    import sbr_bitstream as sb
    hdr = sb.SbrHeader(amp_res=0, start_freq=5, stop_freq=5,
                       xover_band=0)
    ft = hdr.tables(44100)
    rng = np.random.default_rng(12)
    chans = []
    for _ in range(4):
        vals = [int(rng.integers(36, 52))]
        for _ in range(ft.n_high - 1):
            vals.append(int(np.clip(vals[-1] + rng.integers(-8, 9),
                                    20, 64)))
        chans.append(sb.SbrChannel(
            num_env=2, freq_res=[1, 1], df_env=[0, 0], df_noise=[0, 0],
            invf=[1] * ft.n_q,
            env_sf=[vals, vals[::-1]],
            noise_sf=[[28] * ft.n_q, [28] * ft.n_q]))
    snr = _mint_and_compare(orc, hdr, chans, chans)
    assert snr > 45, snr


def test_oracle_huffman_env_t(orc):
    """Delta-time envelopes chained across and within frames."""
    import dataclasses
    import sbr_bitstream as sb
    hdr = sb.SbrHeader(amp_res=1, start_freq=5, stop_freq=5,
                       xover_band=0)
    ft = hdr.tables(44100)
    rng = np.random.default_rng(13)
    base = [int(v) for v in rng.integers(18, 30, ft.n_low)]
    coded = [sb.SbrChannel(
        num_env=2, freq_res=[0, 0], df_env=[0, 0], df_noise=[0, 0],
        invf=[1] * ft.n_q, env_sf=[list(base), list(base)],
        noise_sf=[[28] * ft.n_q, [28] * ft.n_q])]
    absc = [dataclasses.replace(coded[0])]
    cur = [list(base), list(base)]
    for _ in range(5):
        deltas = [[int(rng.integers(-2, 3)) for _ in range(ft.n_low)]
                  for _ in range(2)]
        prev = cur[1]
        e1 = [int(np.clip(prev[k] + deltas[0][k], 12, 32))
              for k in range(ft.n_low)]
        deltas[0] = [e1[k] - prev[k] for k in range(ft.n_low)]
        e2 = [int(np.clip(e1[k] + deltas[1][k], 12, 32))
              for k in range(ft.n_low)]
        deltas[1] = [e2[k] - e1[k] for k in range(ft.n_low)]
        coded.append(sb.SbrChannel(
            num_env=2, freq_res=[0, 0], df_env=[1, 1],
            df_noise=[0, 0], invf=[1] * ft.n_q,
            env_sf=deltas, noise_sf=[[28] * ft.n_q, [28] * ft.n_q]))
        absc.append(sb.SbrChannel(
            num_env=2, freq_res=[0, 0], df_env=[0, 0],
            df_noise=[0, 0], invf=[1] * ft.n_q,
            env_sf=[e1, e2], noise_sf=[[28] * ft.n_q, [28] * ft.n_q]))
        cur = [e1, e2]
    snr = _mint_and_compare(orc, hdr, coded, absc)
    assert snr > 50, snr


def test_oracle_huffman_noise(orc):
    """Noise floors coded with freq deltas (f_env_3 book) and time
    deltas (t_noise_3 book) on a multi-noise-band grid.

    Grid note: start_freq=6 is used instead of 8 because the sf8/st5
    grid hits a degenerate patch shape where libav's kept patch ends
    two subbands short of our spec reading (see PARITY.md, "SBR patch
    construction divergence")."""
    import dataclasses
    import sbr_bitstream as sb
    hdr = sb.SbrHeader(amp_res=1, start_freq=6, stop_freq=5,
                       xover_band=0, noise_bands=2)
    ft = hdr.tables(44100)
    assert ft.n_q >= 2, ft.n_q
    env = [[24] * ft.n_low] * 2
    q1 = [12, 9][:ft.n_q] + [10] * max(0, ft.n_q - 2)
    q2 = [8, 13][:ft.n_q] + [11] * max(0, ft.n_q - 2)
    coded = [sb.SbrChannel(
        num_env=2, freq_res=[0, 0], df_env=[0, 0], df_noise=[0, 0],
        invf=[2] * ft.n_q, env_sf=[list(e) for e in env],
        noise_sf=[list(q1), list(q2)])]
    # second frame: noise env 1 time-delta from q2, env 2 freq-coded
    d = [2, -3][:ft.n_q] + [0] * max(0, ft.n_q - 2)
    q3 = [q2[k] + d[k] for k in range(ft.n_q)]
    coded.append(sb.SbrChannel(
        num_env=2, freq_res=[0, 0], df_env=[0, 0], df_noise=[1, 0],
        invf=[2] * ft.n_q, env_sf=[list(e) for e in env],
        noise_sf=[list(d), list(q1)]))
    absc = [coded[0],
            dataclasses.replace(coded[1], df_noise=[0, 0],
                                noise_sf=[list(q3), list(q1)])]
    snr = _mint_and_compare(orc, hdr, coded, absc, nframes=16)
    assert snr > 50, snr


# ---------------------------------------------------------------------------
# 4. baked C header: regenerable and valid C

def test_sbr_tables_header_compiles(tmp_path):
    """The generated native/sbr_tables.h must be valid C (advisor r4:
    %.17g dropped decimal points, producing '0f' integer-suffix
    errors); compile a TU that includes it and touches every array."""
    import shutil
    import subprocess

    cc = os.environ.get("CC") or shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        pytest.skip("no C compiler available")
    hdr = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "vocal_remover_tpu", "native",
        "sbr_tables.h")
    assert os.path.exists(hdr), "sbr_tables.h missing — run " \
        "scripts/sbr_bake_tables.py"
    src = tmp_path / "smoke.c"
    src.write_text(
        f'#include "{hdr}"\n'
        "float touch(void) {\n"
        "  float s = SBR_QMF_WIN[639] + SBR_NOISE[1023];\n"
        "  s += sbr_f_env_3_len[62] + sbr_f_env_3_code[62];\n"
        "  s += sbr_t_env_1_len[120] + sbr_t_env_1_code[120];\n"
        "  s += sbr_t_noise_3_len[62] + sbr_t_noise_bal_3_len[24];\n"
        "  return s;\n"
        "}\n"
    )
    res = subprocess.run(
        [cc, "-c", "-Wall", "-Werror", "-o", str(tmp_path / "smoke.o"),
         str(src)], capture_output=True, text=True, timeout=60)
    assert res.returncode == 0, res.stderr


# ---------------------------------------------------------------------------
# 5. native C decoder end-to-end (the shipped HE-AAC ingest path)


@pytest.fixture(scope="module")
def ext():
    from vocal_remover_tpu import native
    if native.get() is None:
        pytest.skip("native extension unavailable")
    return native


def _mk_sce(rng, gain=170):
    import aac_lc_encode as lc
    return lc.encode_sce(lc.dense_spectrum(22050, 200, 9000, rng=rng),
                         22050, global_gain=gain)


def _mint_he(hdr, chans, nframes=24, coupling=False, seed=3):
    """ADTS HE-AAC stream (+ matching core-only stream) from SbrChannel
    params; mono SCE unless `coupling` (then a stereo coupled CPE)."""
    import sbr_bitstream as sb
    import sbr_parse as sp
    from aac_bitstream import CPE, adts_frame

    books = sp.Books()
    rng = np.random.default_rng(seed)
    he, lco = [], []
    for i in range(nframes):
        if coupling:
            c0, c1 = chans[0], chans[1]
            huff = books.writer_huff(c0.amp_res_used(hdr.amp_res))
            d = sb.SbrData(header=hdr, channels=[c0, c1], fs_sbr=44100,
                           huff=huff, send_header=(i == 0),
                           coupling=True)
            els = [CPE(left=_mk_sce(rng, 170), right=_mk_sce(rng, 168))]
            he.append(adts_frame(els + [sb.sbr_fil(d)], sr=22050,
                                 channel_config=2))
            lco.append(adts_frame(els, sr=22050, channel_config=2))
        else:
            ch = chans[i % len(chans)]
            huff = books.writer_huff(ch.amp_res_used(hdr.amp_res))
            d = sb.SbrData(header=hdr, channels=[ch], fs_sbr=44100,
                           huff=huff, send_header=(i == 0))
            els = [_mk_sce(rng)]
            he.append(adts_frame(els + [sb.sbr_fil(d)], sr=22050))
            lco.append(adts_frame(els, sr=22050))
    return b"".join(he), b"".join(lco)


def _flat_chan(ft):
    import sbr_bitstream as sb
    return sb.SbrChannel(num_env=1, freq_res=[0], df_env=[0],
                         df_noise=[0], invf=[2] * ft.n_q,
                         env_sf=[[24] * ft.n_low],
                         noise_sf=[[10] * ft.n_q])


def test_native_heaac_adts(ext, orc):
    """The shipped decoder reconstructs the full band of an HE-AAC
    ADTS stream: ~80 dB vs the libav oracle (the reference decodes the
    same input via ffmpeg, inference.py:136-138) and >120 dB vs the
    pinned Python reference chain — proving the C port is exact."""
    import sbr_bitstream as sb
    import sbr_ref

    hdr = sb.SbrHeader(amp_res=1, start_freq=5, stop_freq=5,
                       xover_band=0)
    ft = hdr.tables(44100)
    he, lco = _mint_he(hdr, [_flat_chan(ft)])
    ref, sr = orc.decode_bytes(he, suffix=".aac")
    got, sr2 = ext.aac_decode(he)
    got = np.asarray(got)[:, 0]
    assert sr == sr2 == 44100
    snr = _aligned_snr(ref[:, 0].astype(np.float64),
                       got.astype(np.float64), max_lag=64)
    assert snr > 70, snr
    # exactness vs the Python reference chain on the same stream
    core, csr = ext.aac_decode(lco)
    assert csr == 22050
    core = np.asarray(core)[:, 0]
    dec = sbr_ref.SbrDecoder(hdr, 44100)
    pyo = np.concatenate([
        dec.frame(core[i * 1024:(i + 1) * 1024].astype(np.float64),
                  _flat_chan(ft))
        for i in range(len(core) // 1024)])
    n = min(len(pyo), len(got))
    err = got[:n].astype(np.float64) - pyo[:n]
    p = float((pyo[:n] ** 2).mean())
    exact = 10 * np.log10(p / max(float((err ** 2).mean()), 1e-30))
    assert exact > 120, exact


def test_native_heaac_dense_transitions_bound(ext, orc):
    """Dense per-frame envelope transitions: the documented worst case
    of the pinned reference chain (~47 dB, PARITY.md). The native
    decoder must (a) stay above the documented 40 dB bound vs the
    oracle and (b) match the Python chain >120 dB — i.e. the gap is
    the shared reference behavior, not a porting defect."""
    import sbr_bitstream as sb
    import sbr_ref

    hdr = sb.SbrHeader(amp_res=1, start_freq=5, stop_freq=5,
                       xover_band=0)
    ft = hdr.tables(44100)
    chans = []
    for v in (20, 24, 28):
        chans.append(sb.SbrChannel(
            num_env=2, freq_res=[1, 1], df_env=[0, 0], df_noise=[0, 0],
            invf=[2] * ft.n_q,
            env_sf=[[v + (j % 5) for j in range(ft.n_high)],
                    [v + 2 + (j % 3) for j in range(ft.n_high)]],
            noise_sf=[[8 + (k % 3) for k in range(ft.n_q)],
                      [11] * ft.n_q]))
    he, lco = _mint_he(hdr, chans)
    ref, _ = orc.decode_bytes(he, suffix=".aac")
    got, _ = ext.aac_decode(he)
    got = np.asarray(got)[:, 0]
    snr = _aligned_snr(ref[:, 0].astype(np.float64),
                       got.astype(np.float64), max_lag=64)
    assert snr > 40, snr
    core, _ = ext.aac_decode(lco)
    core = np.asarray(core)[:, 0]
    dec = sbr_ref.SbrDecoder(hdr, 44100)
    pyo = np.concatenate([
        dec.frame(core[i * 1024:(i + 1) * 1024].astype(np.float64),
                  chans[i % 3])
        for i in range(len(core) // 1024)])
    n = min(len(pyo), len(got))
    err = got[:n].astype(np.float64) - pyo[:n]
    p = float((pyo[:n] ** 2).mean())
    exact = 10 * np.log10(p / max(float((err ** 2).mean()), 1e-30))
    assert exact > 120, exact


def test_native_heaac_coupled_cpe(ext, orc):
    """Stereo CPE with bs_coupling: channel 0 carries energies,
    channel 1 balance values — validates the coupled dequantization
    (pan offsets, doubled balance, +7/+1 exponents) per channel
    against the oracle."""
    import sbr_bitstream as sb

    hdr = sb.SbrHeader(amp_res=1, start_freq=5, stop_freq=5,
                       xover_band=0)
    ft = hdr.tables(44100)
    c0 = _flat_chan(ft)
    c1 = sb.SbrChannel(num_env=1, freq_res=[0], df_env=[0],
                       df_noise=[0], invf=[2] * ft.n_q,
                       env_sf=[[10 + (j % 5)
                                for j in range(ft.n_low)]],
                       noise_sf=[[12] * ft.n_q])
    he, _ = _mint_he(hdr, [c0, c1], coupling=True)
    ref, sr = orc.decode_bytes(he, suffix=".aac")
    got, sr2 = ext.aac_decode(he)
    got = np.asarray(got)
    assert sr == sr2 == 44100 and got.shape[1] == 2
    for c in range(2):
        snr = _aligned_snr(ref[:, c].astype(np.float64),
                           got[:, c].astype(np.float64), max_lag=64)
        assert snr > 60, (c, snr)


def _boxes_m4a(samples, asc):
    """Minimal ISO-BMFF wrapper: one audio track, explicit sample
    sizes, one chunk, mdat appended last (stco patched)."""
    import struct

    def box(typ, payload):
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    esds = box(b"esds", b"\x00\x00\x00\x00"
               + b"\x03\x19\x00\x00\x00"
               + b"\x04\x11\x40\x15\x00\x00\x00\x00\x00\x00\x00"
               + b"\x00\x00\x00\x00"
               + bytes([0x05, len(asc)]) + asc)
    mp4a = box(b"mp4a", b"\x00" * 28 + esds)
    stsd = box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + mp4a)
    stsz = box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, len(samples))
               + b"".join(struct.pack(">I", len(s)) for s in samples))
    stsc = box(b"stsc", b"\x00" * 4 + struct.pack(">I", 1)
               + struct.pack(">III", 1, len(samples), 1))
    hdlr = box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 12)
    ftyp = box(b"ftyp", b"M4A \x00\x00\x00\x00")

    def build(stco_off):
        stco = box(b"stco", b"\x00" * 4 + struct.pack(">I", 1)
                   + struct.pack(">I", stco_off))
        stbl = box(b"stbl", stsd + stsz + stsc + stco)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", hdlr + minf)
        trak = box(b"trak", mdia)
        moov = box(b"moov", trak)
        return ftyp + moov

    head = build(0)
    mdat_payload = b"".join(samples)
    off = len(head) + 8            # first sample offset inside mdat
    head = build(off)
    return head + box(b"mdat", mdat_payload)


def test_native_heaac_m4a_explicit(ext, orc):
    """Explicitly-signaled HE-AAC in an .m4a container (ASC aot=5 with
    extensionSamplingFrequencyIndex): same frames as the ADTS stream
    must decode identically, at the doubled rate."""
    import sbr_bitstream as sb
    from aac_bitstream import BitWriter

    hdr = sb.SbrHeader(amp_res=1, start_freq=5, stop_freq=5,
                       xover_band=0)
    ft = hdr.tables(44100)
    he, _ = _mint_he(hdr, [_flat_chan(ft)])
    # split the ADTS stream back into raw blocks (7-byte headers,
    # protection_absent=1)
    samples = []
    pos = 0
    while pos + 7 <= len(he):
        flen = ((he[pos + 3] & 0x03) << 11) | (he[pos + 4] << 3) \
               | (he[pos + 5] >> 5)
        samples.append(he[pos + 7:pos + flen])
        pos += flen
    # ASC: aot 5, core sfi 7 (22050), 1 ch, ext sfi 4 (44100), aot 2
    w = BitWriter()
    w.put(5, 5)
    w.put(7, 4)
    w.put(1, 4)
    w.put(4, 4)
    w.put(2, 5)
    w.put(0, 3)     # frameLength / dependsOnCoreCoder / extensionFlag
    asc = w.tobytes()
    m4a = _boxes_m4a(samples, asc)
    got_adts, sr_a = ext.aac_decode(he)
    got_m4a, sr_m = ext.aac_decode(m4a)
    assert sr_a == sr_m == 44100
    a = np.asarray(got_adts)[:, 0]
    m = np.asarray(got_m4a)[:, 0]
    assert len(a) == len(m)
    assert np.allclose(a, m, atol=1e-7)


def test_native_sbr_mid_stream_rejected(ext):
    """SBR data first appearing after LC frames were already emitted
    must raise (output rate would change mid-stream) so the Python
    layer can fall back to ffmpeg."""
    import sbr_bitstream as sb
    import sbr_parse as sp
    from aac_bitstream import adts_frame

    books = sp.Books()
    rng = np.random.default_rng(3)
    hdr = sb.SbrHeader(amp_res=1, start_freq=5, stop_freq=5,
                       xover_band=0)
    ft = hdr.tables(44100)
    ch = _flat_chan(ft)
    frames = [adts_frame([_mk_sce(rng)], sr=22050) for _ in range(4)]
    huff = books.writer_huff(ch.amp_res_used(hdr.amp_res))
    d = sb.SbrData(header=hdr, channels=[ch], fs_sbr=44100, huff=huff)
    frames.append(adts_frame([_mk_sce(rng), sb.sbr_fil(d)], sr=22050))
    with pytest.raises(ValueError, match="mid-stream"):
        ext.aac_decode(b"".join(frames))


def test_native_heaac_grid_sweep(ext, orc):
    """Grid-shape sweep (VERDICT r04 #6): every non-degenerate band
    grid must hold >= 60 dB vs the oracle; the one known degenerate
    grid (start_freq=8/stop_freq=5: a dropped sub-3-band final patch,
    where libav's patch rule diverges from our spec reading —
    PARITY.md) is asserted at its measured ~50 dB bound."""
    import sbr_bitstream as sb
    import sbr_parse as sp
    from aac_bitstream import adts_frame

    books = sp.Books()

    def snr_for(start, stop, xover, fscale=2):
        hdr = sb.SbrHeader(amp_res=1, start_freq=start, stop_freq=stop,
                           xover_band=xover, freq_scale=fscale)
        ft = hdr.tables(44100)
        rng = np.random.default_rng(3)
        ch = sb.SbrChannel(num_env=1, freq_res=[0], df_env=[0],
                           df_noise=[0], invf=[2] * ft.n_q,
                           env_sf=[[24] * ft.n_low],
                           noise_sf=[[10] * ft.n_q])
        he = []
        for i in range(16):
            huff = books.writer_huff(ch.amp_res_used(hdr.amp_res))
            d = sb.SbrData(header=hdr, channels=[ch], fs_sbr=44100,
                           huff=huff, send_header=(i == 0))
            sce = _mk_sce(rng)
            he.append(adts_frame([sce, sb.sbr_fil(d)], sr=22050))
        stream = b"".join(he)
        ref, _ = orc.decode_bytes(stream, suffix=".aac")
        got, _ = ext.aac_decode(stream)
        got = np.asarray(got)[:, 0]
        return _aligned_snr(ref[:, 0].astype(np.float64),
                            got.astype(np.float64), n=12288, max_lag=8)

    for grid in [(5, 5, 0), (4, 7, 1), (3, 4, 0), (8, 4, 0),
                 (7, 5, 0), (5, 5, 0, 1)]:
        snr = snr_for(*grid)
        assert snr > 60, (grid, snr)
    # the degenerate grid: documented divergence, measured bound
    snr = snr_for(8, 5, 0)
    assert snr > 40, snr

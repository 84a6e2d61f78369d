"""Dev check: the native SBR decoder (native/sbrdec.c) vs the pinned
Python reference chain (scripts/sbr_ref.py + sbr_parse.py).

Feeds IDENTICAL streams through both: the Python side gets the
dataclass parameters directly, the C side parses the actual minted
sbr_extension_data payload — so this validates the C bitstream parser,
the band-table derivation and the DSP chain in one closed loop.
Expected agreement is ~140+ dB (same algorithm, both in f64) — far
above the ~60-83 dB either side scores against the libav oracle.

Run: python scripts/sbr_c_check.py
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

import sbr_bitstream as sb  # noqa: E402
import sbr_parse as sp  # noqa: E402
import sbr_ref  # noqa: E402

NATIVE = os.path.join(os.path.dirname(_HERE), "vocal_remover_tpu",
                      "native")


def build_shim():
    so = os.path.join(tempfile.gettempdir(), "_sbrdec_check.so")
    src = os.path.join(NATIVE, "sbrdec.c")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(
            ["cc", "-O2", "-shared", "-fPIC", "-o", so, src, "-lm"],
            check=True)
    lib = ctypes.CDLL(so)
    lib.sbr_elem_init.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.sbr_parse_payload.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_size_t, ctypes.c_int, ctypes.c_int]
    lib.sbr_parse_payload.restype = ctypes.c_int
    lib.sbr_process.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    return lib


def bits_to_bytes(bits: str) -> bytes:
    pad = (-len(bits)) % 8
    bits = bits + "0" * pad
    return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))


def run_stream(lib, hdr, coded_chans, abs_chans, nframes=24, seed=7,
               fs_core=22050):
    """coded_chans: df-coded channels for the writer; abs_chans: the
    matching absolute-valued channels for sbr_ref."""
    books = sp.Books()
    rng = np.random.default_rng(seed)
    core = (rng.standard_normal(1024 * nframes) * 0.05).astype(np.float32)

    elem = ctypes.create_string_buffer(1 << 20)
    lib.sbr_elem_init(elem, fs_core)
    out_c = np.zeros(2048 * nframes, np.float32)

    ref = sbr_ref.SbrDecoder(hdr, 2 * fs_core)
    out_py = np.zeros(2048 * nframes)

    for i in range(nframes):
        ch = coded_chans[i % len(coded_chans)]
        huff = books.writer_huff(ch.amp_res_used(hdr.amp_res))
        data = sb.SbrData(header=hdr, channels=[ch], fs_sbr=2 * fs_core,
                          send_header=(i == 0), huff=huff)
        from aac_bitstream import BitWriter
        w = BitWriter()
        data.write(w)
        bits = "".join(w.bits)
        payload = bits_to_bytes(bits)
        rc = lib.sbr_parse_payload(elem, payload, 0, len(bits), 0, 0)
        assert rc == 0, f"frame {i}: C parse failed"
        cf = core[i * 1024:(i + 1) * 1024]
        ob = np.zeros(2048, np.float32)
        lib.sbr_process(
            elem, 1, cf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            None, ob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            None)
        out_c[i * 2048:(i + 1) * 2048] = ob
        out_py[i * 2048:(i + 1) * 2048] = ref.frame(
            np.asarray(cf, np.float64), abs_chans[i % len(abs_chans)])

    err = out_c.astype(np.float64) - out_py
    p = float((out_py ** 2).mean())
    e = float((err ** 2).mean())
    return 10 * np.log10(p / max(e, 1e-30))


def main():
    lib = build_shim()
    results = {}

    # 1. FIXFIX single envelope, flat grid, no inverse filtering
    hdr = sb.SbrHeader(amp_res=1, start_freq=5, stop_freq=5,
                       xover_band=0)
    ft = hdr.tables(44100)
    ch = sb.SbrChannel(num_env=1, freq_res=[0], df_env=[0],
                       df_noise=[0], invf=[0] * ft.n_q,
                       env_sf=[[50] * ft.n_low],
                       noise_sf=[[20] * ft.n_q])
    results["fixfix_copy"] = run_stream(lib, hdr, [ch], [ch])

    # 2. chirped inverse filtering + freq-varying envelopes, 2 envs
    env1 = [[40 + (j % 5) * 3 for j in range(ft.n_high)],
            [46 + (j % 4) * 2 for j in range(ft.n_high)]]
    ch2 = sb.SbrChannel(num_env=2, freq_res=[1, 1], df_env=[0, 0],
                        df_noise=[0, 1], invf=[2] * ft.n_q,
                        env_sf=[list(e) for e in env1],
                        noise_sf=[[14, 20][:1] * ft.n_q, [0] * ft.n_q])
    # noise_sf needs proper shapes: abs first env, time-delta second
    q1 = [14 + (k % 3) for k in range(ft.n_q)]
    dq = [1 - (k % 2) for k in range(ft.n_q)]
    ch2.noise_sf = [list(q1), list(dq)]
    ch2abs = sb.SbrChannel(
        num_env=2, freq_res=[1, 1], df_env=[0, 0], df_noise=[0, 0],
        invf=[2] * ft.n_q, env_sf=[list(e) for e in env1],
        noise_sf=[list(q1), [q1[k] + dq[k] for k in range(ft.n_q)]])
    results["two_env_chirp"] = run_stream(lib, hdr, [ch2], [ch2abs])

    # 3. time-delta envelopes across frames + sinusoids + amp_res 0
    hdr3 = sb.SbrHeader(amp_res=0, start_freq=4, stop_freq=7,
                        xover_band=1)
    ft3 = hdr3.tables(44100)
    base = [60 + 2 * (j % 6) for j in range(ft3.n_low)]
    cha = sb.SbrChannel(num_env=1, freq_res=[0], df_env=[0],
                        df_noise=[0], invf=[1] * ft3.n_q,
                        env_sf=[list(base)],
                        noise_sf=[[18] * ft3.n_q],
                        add_harmonic=[j % 3 == 0
                                      for j in range(ft3.n_high)])
    d = [1, -2, 0, 2][:1] * ft3.n_low
    d = [(j % 3) - 1 for j in range(ft3.n_low)]
    chb = sb.SbrChannel(num_env=1, freq_res=[0], df_env=[1],
                        df_noise=[1], invf=[1] * ft3.n_q,
                        env_sf=[list(d)],
                        noise_sf=[[0] * ft3.n_q],
                        add_harmonic=[j % 3 == 0
                                      for j in range(ft3.n_high)])
    chb_abs = sb.SbrChannel(
        num_env=1, freq_res=[0], df_env=[0], df_noise=[0],
        invf=[1] * ft3.n_q,
        env_sf=[[base[j] + d[j] for j in range(ft3.n_low)]],
        noise_sf=[[18] * ft3.n_q],
        add_harmonic=[j % 3 == 0 for j in range(ft3.n_high)])
    results["dt_env_sines_amp0"] = run_stream(
        lib, hdr3, [cha, chb], [cha, chb_abs])

    # 4. FIXVAR / VARFIX grids with transient pointer
    ch4a = sb.SbrChannel(frame_class=sb.FIXVAR, num_env=2,
                         freq_res=[1, 1], pointer=1, var_bord_1=0,
                         rel_bord_1=[8], df_env=[0, 0],
                         df_noise=[0, 0], invf=[2] * ft.n_q,
                         env_sf=[[44] * ft.n_high, [52] * ft.n_high],
                         noise_sf=[[16] * ft.n_q, [22] * ft.n_q])
    ch4b = sb.SbrChannel(frame_class=sb.VARFIX, num_env=2,
                         freq_res=[0, 0], pointer=0, var_bord_0=2,
                         rel_bord_0=[6], df_env=[0, 0],
                         df_noise=[0, 0], invf=[1] * ft.n_q,
                         env_sf=[[48] * ft.n_low, [42] * ft.n_low],
                         noise_sf=[[19] * ft.n_q, [25] * ft.n_q])
    results["fixvar_varfix"] = run_stream(lib, hdr, [ch4a, ch4b],
                                          [ch4a, ch4b])

    ok = True
    for k, v in results.items():
        flag = "OK " if v > 120 else "LOW"
        if v <= 120:
            ok = False
        print(f"{flag} {k:24s} {v:8.1f} dB")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

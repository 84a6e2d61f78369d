#!/usr/bin/env python
"""Extract + verify the AAC-LC Huffman/scalefactor-band tables against
the libav oracle decoder.

Methodology (mirrors scripts/mp3_extract_tables.py for mp3): walk every
Huffman code tree breadth-first with purpose-built ADTS probe frames
(scripts/aac_bitstream.py), classifying each candidate bit prefix as a
codeword or an interior node by the oracle's observable response.
Every entry of every extracted table has, by construction, been
individually confirmed by the reference decoder.

Bootstrap order (no table content is assumed a priori — only the
bitstream LAYOUT from ISO/IEC 14496-3):

  1. Scalefactor codebook, codeword SET: the probe is placed at the
     scale_factor_data position followed by the literal bits "001".
     Iff the probe is a complete codeword, the decoder's next three
     reads are pulse=0, tns=0, gain_control=1 — and "gain control"
     is unimplemented in libav's AAC decoder, producing a distinctive
     diagnostic. Any other completion consumes those bits differently.
  2. Spectral codebook 1 (4-tuples, values in {-1,0,1}): with a known
     scalefactor codeword in place, a probe parses exactly when it is
     one complete codeword — the writer's END element id (0b111)
     lands right after it. Values are read from the decoded PCM via
     an analytic filterbank basis; every fit must land on the integer
     grid c*m^(4/3), which validates the basis and calibrates c.
  3. Spectral books 2-10 (sign-bit and 2-codeword-per-band variants),
     book 11 (ESC escapes enumerated per candidate).
  4. Scalefactor VALUES: each sf codeword scales a known book-1
     codeword by 2^(delta/4); the 121 deltas are exactly -60..+60, so
     the (deterministic) sorted amplitude ladder assigns every value
     with no anchor.
  5. swb offset tables per sample rate: code band k alone and read
     which spectral bins respond; num_swb from the decoder's
     band-limit diagnostic.

Run:  python scripts/aac_extract_tables.py [--stage sf|books|swb|all]
  Results accumulate in /tmp/aac_tables.json; --bake rewrites the
  PLACEHOLDER tables in native/aacdec.c.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import aac_oracle  # noqa: E402
from aac_bitstream import SCE, EIGHT_SHORT, probe_stream  # noqa: E402

SEG = 2048          # probe frame + spacer output samples
N_LONG = 2048
GG = 128            # keeps sf = gg + delta legal for any delta

# spectral codebooks: id -> (dims, LAV, signed)
BOOKS = {1: (4, 1, True), 2: (4, 1, True), 3: (4, 2, False),
         4: (4, 2, False), 5: (2, 4, True), 6: (2, 4, True),
         7: (2, 7, False), 8: (2, 7, False), 9: (2, 12, False),
         10: (2, 12, False), 11: (2, 16, False)}

RATES = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
         16000, 12000, 11025, 8000]


def long_basis(bins: int = 8) -> np.ndarray:
    """(bins, 1024) first-output-frame response of unit spectral
    amplitude at long-window bins (sine window; absolute scale folds
    into the calibration constant c)."""
    n = np.arange(1024)
    w = np.sin(np.pi / N_LONG * (n + 0.5))
    n0 = (N_LONG / 2 + 1) / 2
    k = np.arange(bins)[:, None]
    return (w * np.cos(2 * np.pi / N_LONG * (n + n0) * (k + 0.5))).astype(
        np.float64)


def decode_probe(frame: SCE, sr: int = 44100):
    """-> (pcm_segment | None, log_text)"""
    aac_oracle.clear_log()
    try:
        pcm, _ = aac_oracle.decode_bytes(
            probe_stream([frame], sr=sr), suffix=".aac")
        seg = pcm[:SEG, 0] if len(pcm) >= SEG else None
    except RuntimeError:
        seg = None
    return seg, aac_oracle.last_log()


def batch_pcm(frames: list[SCE], sr: int = 44100) -> list:
    """oracle-decode a batch of MUST-SUCCEED probes -> segments; falls
    back to per-frame decodes when the stream's sample count is off."""
    segs = []
    CHUNK = 256
    for i in range(0, len(frames), CHUNK):
        chunk = frames[i:i + CHUNK]
        try:
            pcm, _ = aac_oracle.decode_bytes(
                probe_stream(chunk, sr=sr), suffix=".aac")
            pcm = pcm[:, 0]
        except RuntimeError:
            pcm = None
        if pcm is None or len(pcm) < len(chunk) * SEG:
            for f in chunk:
                segs.append(decode_probe(f, sr=sr)[0])
        else:
            for k in range(len(chunk)):
                segs.append(pcm[k * SEG:(k + 1) * SEG])
    return segs


# --------------------------------------------------------------------
# stage 1: scalefactor codeword set via the gain-control signature

def extract_sf_codewords(log=print) -> list[str]:
    frontier = ["0", "1"]
    leaves = []
    for depth in range(1, 20):
        if not frontier:
            break
        nxt = []
        for p in frontier:
            # "001" = pulse 0, tns 0, gain 1 when p is complete; the
            # ones-poison makes every misaligned completion hit a
            # DIFFERENT diagnostic first (TNS order / pulse position
            # out of range) before any gain bit can be read
            f = SCE(global_gain=GG, max_sfb=1, sections=[(1, 1)],
                    sf_bits=p + "001" + "1" * 40, spectral_bits="")
            _, text = decode_probe(f)
            if "Gain control" in text:
                leaves.append(p)
            else:
                nxt.extend((p + "0", p + "1"))
        frontier = nxt
        log(f"  sf depth {depth}: {len(leaves)} codes, "
            f"frontier {len(frontier)}")
    if frontier:
        raise RuntimeError(f"sf: unresolved prefixes {frontier[:4]}")
    if len(leaves) != 121:
        raise RuntimeError(f"sf: {len(leaves)} codes != 121")
    kraft = sum(2.0 ** -len(c) for c in leaves)
    if abs(kraft - 1.0) > 1e-12:
        raise RuntimeError(f"sf: Kraft sum {kraft}")
    return leaves


# --------------------------------------------------------------------
# stage 2/3: spectral codebooks

def esc_bits(mantissa: int = 0) -> str:
    """minimal ESC escape word: N=0 ones, a 0, then 4 mantissa bits"""
    return "0" + format(mantissa, "04b")


def candidate_tails(book: int):
    """possible (positive_tail, negative_tail, (nsign, nesc))
    continuations after one codeword of `book`: sign bits for unsigned
    books (0 = positive), escapes for book 11. The negative variant
    flips every sign bit — a true codeword boundary decodes BOTH with
    equal magnitudes and opposite signs, while a misclassified
    boundary (sign bits absorbed into the codeword walk) lands on
    different codewords with different magnitudes."""
    dims, lav, signed = BOOKS[book]
    if signed:
        yield "", "", (0, 0)
        return
    max_esc = dims if book == 11 else 0
    for nsign in range(0, dims + 1):
        for nesc in range(0, min(nsign, max_esc) + 1):
            yield ("0" * nsign + esc_bits() * nesc,
                   "1" * nsign + esc_bits() * nesc, (nsign, nesc))


def find_filler(book: int, sf0: str, log=print) -> str:
    """shortest self-delimiting single-codeword spectral bitstring of
    `book` (codeword + its sign/escape bits), found by trying the
    doubled form (band width 4 needs two 2-dim codewords)."""
    dims, _, _ = BOOKS[book]
    reps = 4 // dims
    for depth in range(1, 14):
        for val in range(1 << depth):
            cw = format(val, f"0{depth}b")
            for tail, _, _ in candidate_tails(book):
                unit = cw + tail
                f = SCE(global_gain=GG, max_sfb=1,
                        sections=[(book, 1)], sf_bits=sf0,
                        spectral_bits=unit * reps)
                seg, text = decode_probe(f)
                if seg is not None:
                    log(f"  book {book}: filler unit {unit!r}")
                    return unit
    raise RuntimeError(f"book {book}: no filler found")


def extract_spectral_book(book: int, sf0: str, log=print) -> dict:
    """-> {codeword: (values...)} confirmed entry by entry."""
    dims, lav, signed = BOOKS[book]
    reps = 4 // dims
    filler = find_filler(book, sf0, log=log) if reps == 2 else ""
    nvals = (2 * lav + 1) ** dims if signed else (lav + 1) ** dims

    # --- BFS for the codeword set ---------------------------------
    basis4 = long_basis(4)

    def fit4(seg):
        a, *_ = np.linalg.lstsq(basis4.T, seg[:1024], rcond=None)
        return a

    def leaf_test(p):
        """-> (tail, (nsign, nesc)) when p is a complete codeword"""
        for t_pos, t_neg, meta in candidate_tails(book):
            f = SCE(global_gain=GG, max_sfb=1, sections=[(book, 1)],
                    sf_bits=sf0, spectral_bits=p + t_pos + filler)
            seg, _ = decode_probe(f)
            if seg is None:
                continue
            if t_pos == t_neg:           # signed book / zero tuple
                if meta == (0, 0) and not BOOKS[book][2]:
                    # unsigned nsign=0: only the all-zero tuple parses
                    # with no sign bits — require a silent first tuple
                    a = fit4(seg)
                    peak = np.abs(a[:BOOKS[book][0]]).max()
                    if peak > np.abs(a).max() * 5e-3 + 1e-12:
                        continue
                return t_pos, meta
            f2 = SCE(global_gain=GG, max_sfb=1, sections=[(book, 1)],
                     sf_bits=sf0, spectral_bits=p + t_neg + filler)
            seg2, _ = decode_probe(f2)
            if seg2 is None:
                continue
            d = BOOKS[book][0]
            a1, a2 = fit4(seg)[:d], fit4(seg2)[:d]
            scale = np.abs(a1).max() + 1e-30
            # flipped sign bits: same magnitudes, opposite signs
            if np.allclose(a1, -a2, rtol=5e-3, atol=scale * 1e-4) and \
                    np.abs(a1).max() > 1e-12:
                # the number of nonzero components must equal the
                # number of sign bits consumed
                nz = int(np.sum(np.abs(a1) > scale * 5e-3))
                if nz == meta[0]:
                    return t_pos, meta
        return None

    frontier = ["0", "1"]
    leaves = {}          # codeword -> (tail bits used, (nsign, nesc))
    for depth in range(1, 22):
        if not frontier:
            break
        nxt = []
        for p in frontier:
            hit = leaf_test(p)
            if hit is not None:
                leaves[p] = hit
            else:
                nxt.extend((p + "0", p + "1"))
        frontier = nxt
        log(f"  book {book} depth {depth}: {len(leaves)} codes, "
            f"frontier {len(frontier)}")
    if frontier:
        raise RuntimeError(f"book {book}: unresolved {frontier[:4]}")
    if len(leaves) != nvals:
        raise RuntimeError(f"book {book}: {len(leaves)} != {nvals}")
    kraft = sum(2.0 ** -len(c) for c in leaves)
    if abs(kraft - 1.0) > 1e-12:
        raise RuntimeError(f"book {book}: Kraft sum {kraft}")

    # --- value readback from PCM ----------------------------------
    basis = long_basis(4)
    frames = [SCE(global_gain=GG, max_sfb=1, sections=[(book, 1)],
                  sf_bits=sf0, spectral_bits=cw + leaves[cw][0] + filler)
              for cw in leaves]
    segs = batch_pcm(frames)
    amps = []
    for cw, seg in zip(leaves, segs):
        if seg is None:
            raise RuntimeError(f"book {book}: readback failed at {cw}")
        a, *_ = np.linalg.lstsq(basis.T, seg[:1024], rcond=None)
        amps.append(a[:dims])
    # calibrate c: the smallest nonzero magnitude class is |q| = 1.
    # Threshold well above the lstsq noise floor (~1e-4 of the peak)
    # but below the smallest real magnitude (peak/40 even for the ESC
    # book's escape values).
    mags = np.abs(np.concatenate(amps))
    mags = mags[mags > np.max(mags) * 5e-3]
    if len(mags) == 0:
        raise RuntimeError(f"book {book}: all-zero readback")
    c = np.median(mags[mags < np.min(mags) * 1.5])
    table = {}
    seen = set()
    for (cw, (tail, (nsign, nesc))), a in zip(leaves.items(), amps):
        q = np.sign(a) * (np.abs(a) / c) ** 0.75
        qi = tuple(int(round(x)) for x in q)
        if np.max(np.abs(np.array(qi) - q)) > 0.2:
            raise RuntimeError(f"book {book}: off-grid {q} at {cw}")
        if not signed:
            # sign bits were written as 0 (positive); escapes with
            # mantissa 0 decode as 16
            if any(v < 0 for v in qi):
                raise RuntimeError(
                    f"book {book}: negative under positive signs {qi}")
            qi = tuple(min(v, 16) for v in qi) if book == 11 else qi
        if sum(1 for v in qi if v != 0) != nsign and not signed:
            raise RuntimeError(
                f"book {book}: {cw} nonzeros {qi} != sign bits {nsign}")
        limit = 16 if book == 11 else lav
        if any(abs(v) > limit for v in qi):
            raise RuntimeError(f"book {book}: out of range {qi}")
        if qi in seen:
            raise RuntimeError(f"book {book}: duplicate tuple {qi}")
        seen.add(qi)
        table[cw] = qi
    return table


# --------------------------------------------------------------------
# stage 4: scalefactor values via the deterministic amplitude ladder

def assign_sf_values(codewords: list[str], book1: dict,
                     log=print) -> dict:
    ref_cw = next(cw for cw, v in book1.items()
                  if tuple(v) == (1, 0, 0, 0))
    basis = long_basis(1)
    frames = [SCE(global_gain=GG, max_sfb=1, sections=[(1, 1)],
                  sf_bits=cw, spectral_bits=ref_cw)
              for cw in codewords]
    segs = batch_pcm(frames)
    amp = {}
    for cw, seg in zip(codewords, segs):
        if seg is None:
            raise RuntimeError(f"sf value readback failed at {cw}")
        a, *_ = np.linalg.lstsq(basis.T, seg[:1024], rcond=None)
        amp[cw] = abs(float(a[0]))
    order = sorted(codewords, key=lambda c: amp[c])
    la = np.log2([amp[c] for c in order])
    steps = np.diff(la)
    if not np.allclose(steps, 0.25, atol=0.02):
        bad = int(np.argmax(np.abs(steps - 0.25)))
        raise RuntimeError(f"sf ladder not 2^(1/4)-spaced at rank "
                           f"{bad}: {steps[bad]:.4f}")
    log(f"  sf ladder: 121 rungs, spacing "
        f"{steps.mean():.4f} +- {steps.std():.1e}")
    return {cw: i - 60 for i, cw in enumerate(order)}


# --------------------------------------------------------------------
# stage 5: swb offset tables

def num_swb_from_log(sr: int, long_win: bool) -> int:
    """ask the decoder: an out-of-range max_sfb makes it print the
    band-count limit."""
    f = SCE(global_gain=GG, max_sfb=63 if long_win else 15,
            window_sequence=0 if long_win else EIGHT_SHORT,
            sections=[(0, 63 if long_win else 15)], sf_bits="")
    _, text = decode_probe(f, sr=sr)
    import re
    m = re.search(r"exceeds limit \((\d+)\)", text)
    if not m:
        if not long_win:
            # short max_sfb is a 4-bit field: when the rate's limit is
            # exactly 15, max_sfb=15 is legal and no diagnostic fires
            return 15
        raise RuntimeError(f"swb[{sr}]: no limit diagnostic: {text!r}")
    return int(m.group(1))


def extract_swb_long(book1: dict, sf0: str, sr: int,
                     log=print) -> list[int]:
    zero_cw = next(cw for cw, v in book1.items()
                   if tuple(v) == (0, 0, 0, 0))
    one_cw = next(cw for cw, v in book1.items()
                  if tuple(v) == (1, 0, 0, 0))
    n_swb = num_swb_from_log(sr, True)
    basis = long_basis(1024)
    offsets = [0]
    for k in range(1, n_swb):
        # adaptive: band k's width (in 4-bin quads) is unknown
        seg = None
        for quads in range(1, 48):
            f = SCE(global_gain=GG, max_sfb=k + 1,
                    sections=[(0, k), (1, 1)], sf_bits=sf0,
                    spectral_bits=one_cw + zero_cw * (quads - 1))
            seg, _ = decode_probe(f, sr=sr)
            if seg is not None:
                break
        if seg is None:
            raise RuntimeError(f"swb[{sr}]: band {k} never parsed")
        a, *_ = np.linalg.lstsq(basis.T, seg[:1024], rcond=None)
        hot = int(np.argmax(np.abs(a)))
        if hot <= offsets[-1]:
            raise RuntimeError(f"swb[{sr}]: non-monotone at band {k}")
        offsets.append(hot)
        log(f"  swb[{sr}] long band {k}: start {hot}")
    offsets.append(1024)
    return offsets


def spectral_index(book: int, vals) -> int:
    dims, lav, signed = BOOKS[book]
    idx = 0
    if signed:
        base = 2 * lav + 1
        for v in vals:
            idx = idx * base + (v + lav)
    else:
        base = lav + 1 if book != 11 else 17
        for v in vals:
            idx = idx * base + abs(v)
    return idx


def apply_tables(mod, state) -> None:
    """push extracted tables into the native module (dev hook), the
    same data --bake writes into aacdec.c"""
    lens = [0] * 121
    codes = [0] * 121
    for cw, delta in state["sf"].items():
        lens[delta + 60] = len(cw)
        codes[delta + 60] = int(cw, 2)
    assert all(lens)
    mod.aac_huff_set(0, bytes(lens),
                     np.asarray(codes, np.uint32).tobytes())
    for b in BOOKS:
        t = state.get(f"book{b}")
        if t is None:
            continue
        dims, lav, signed = BOOKS[b]
        n = ((2 * lav + 1) if signed else (lav + 1 if b != 11 else 17)) \
            ** dims
        lens = [0] * n
        codes = [0] * n
        for cw, vals in t.items():
            idx = spectral_index(b, vals)
            lens[idx] = len(cw)
            codes[idx] = int(cw, 2)
        assert all(lens), f"book {b} incomplete"
        mod.aac_huff_set(b, bytes(lens),
                         np.asarray(codes, np.uint32).tobytes())
    for sr, offs in state.get("swb_long", {}).items():
        idx = RATES.index(int(sr))
        mod.aac_swb_set(idx, 1,
                        np.asarray(offs, np.uint16).tobytes())
    for sr, offs in state.get("swb_short", {}).items():
        idx = RATES.index(int(sr))
        mod.aac_swb_set(idx, 0,
                        np.asarray(offs, np.uint16).tobytes())


def short_basis(bins: int = 128) -> np.ndarray:
    """(bins, 1024) first-output-frame response of unit amplitude at
    SHORT-window-0 bins: a 256-sample sine-windowed IMDCT placed at
    offset 448 (EIGHT_SHORT layout; the previous frame is a sine-shape
    spacer so both halves use the sine window)."""
    n = np.arange(256)
    w = np.sin(np.pi / 256 * (n + 0.5))
    n0 = 64.5
    k = np.arange(bins)[:, None]
    resp = w * np.cos(2 * np.pi / 256 * (n + n0) * (k + 0.5))
    out = np.zeros((bins, 1024))
    out[:, 448:704] = resp
    return out


def extract_swb_short(book1: dict, sf0: str, sr: int,
                      log=print) -> list[int]:
    zero_cw = next(cw for cw, v in book1.items()
                   if tuple(v) == (0, 0, 0, 0))
    one_cw = next(cw for cw, v in book1.items()
                  if tuple(v) == (1, 0, 0, 0))
    n_swb = num_swb_from_log(sr, False)
    basis = short_basis(128)
    offsets = [0]
    for k in range(1, n_swb):
        seg = None
        # per band: 8 windows x width/4 quads; probe value in window 0
        for quads in range(1, 33):
            # zero bands 0..k-1 read no spectral bits; band k reads
            # 8 windows x `quads` codewords (probe value in window 0)
            spec = one_cw + zero_cw * (quads - 1) + \
                (zero_cw * quads) * 7
            f = SCE(global_gain=GG, max_sfb=k + 1,
                    window_sequence=EIGHT_SHORT,
                    scale_factor_grouping=0x7F,
                    sections=([(0, k)] if k else []) + [(1, 1)],
                    sf_bits=sf0, spectral_bits=spec)
            seg, _ = decode_probe(f, sr=sr)
            if seg is not None:
                break
        if seg is None:
            raise RuntimeError(f"swb_short[{sr}]: band {k} never parsed")
        a, *_ = np.linalg.lstsq(basis.T, seg[:1024], rcond=None)
        hot = int(np.argmax(np.abs(a)))
        if hot <= offsets[-1]:
            raise RuntimeError(f"swb_short[{sr}]: non-monotone at {k}")
        offsets.append(hot)
        log(f"  swb_short[{sr}] band {k}: start {hot}")
    offsets.append(128)
    return offsets


def _fmt_arr(vals, per=14):
    out = []
    for i in range(0, len(vals), per):
        out.append("    " + ",".join(str(v) for v in vals[i:i + per]) +
                   ",")
    return "\n".join(out)


def bake(state) -> None:
    """rewrite the EXTRACTED TABLES block in native/aacdec.c"""
    chunks = []
    # scalefactor book (id 0): index delta+60
    lens = [0] * 121
    codes = [0] * 121
    for cw, delta in state["sf"].items():
        lens[delta + 60] = len(cw)
        codes[delta + 60] = int(cw, 2)
    assert all(lens)
    chunks.append(f"static const uint8_t aac_sf_len[121] = {{\n"
                  f"{_fmt_arr(lens)}\n}};\n"
                  f"static const uint32_t aac_sf_code[121] = {{\n"
                  f"{_fmt_arr(codes, 8)}\n}};")
    binds = ["    HCB[0].len = aac_sf_len; HCB[0].code = aac_sf_code;"]
    for b in BOOKS:
        t = state[f"book{b}"]
        dims, lav, signed = BOOKS[b]
        n = ((2 * lav + 1) if signed else
             (lav + 1 if b != 11 else 17)) ** dims
        lens = [0] * n
        codes = [0] * n
        for cw, vals in t.items():
            idx = spectral_index(b, vals)
            lens[idx] = len(cw)
            codes[idx] = int(cw, 2)
        assert all(lens), f"book {b} incomplete"
        chunks.append(
            f"static const uint8_t aac_b{b}_len[{n}] = {{\n"
            f"{_fmt_arr(lens)}\n}};\n"
            f"static const uint32_t aac_b{b}_code[{n}] = {{\n"
            f"{_fmt_arr(codes, 8)}\n}};")
        binds.append(f"    HCB[{b}].len = aac_b{b}_len; "
                     f"HCB[{b}].code = aac_b{b}_code;")
    for sr in RATES:
        i = RATES.index(sr)
        lo = state["swb_long"][str(sr)]
        sh = state["swb_short"][str(sr)]
        chunks.append(
            f"static const uint16_t aac_swbl_{i}[{len(lo)}] = "
            f"{{{','.join(map(str, lo))}}};\n"
            f"static const uint16_t aac_swbs_{i}[{len(sh)}] = "
            f"{{{','.join(map(str, sh))}}};")
        binds.append(
            f"    memcpy(SWB[{i}].off_long, aac_swbl_{i}, "
            f"sizeof(aac_swbl_{i}));\n"
            f"    SWB[{i}].num_long = {len(lo) - 1};\n"
            f"    memcpy(SWB[{i}].off_short, aac_swbs_{i}, "
            f"sizeof(aac_swbs_{i}));\n"
            f"    SWB[{i}].num_short = {len(sh) - 1};\n"
            f"    SWB[{i}].valid = 1;")
    blob = ("/* ORACLE-EXTRACTED tables "
            "(scripts/aac_extract_tables.py --bake): every codeword\n"
            " * individually probed against the libav decoder; see that"
            " file's header. */\n" +
            "\n".join(chunks) +
            "\n\nstatic void aac_tables_bind(void) {\n" +
            "\n".join(binds) + "\n}\n")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "vocal_remover_tpu", "native",
        "aacdec.c")
    src = open(path).read()
    start = src.index("/* BEGIN EXTRACTED TABLES */")
    end = src.index("/* END EXTRACTED TABLES */")
    src = (src[:start] + "/* BEGIN EXTRACTED TABLES */\n" + blob +
           src[end:])
    open(path, "w").write(src)
    print(f"baked tables into {path}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="sf",
                    choices=["sf", "book1", "books", "sfvals", "swb",
                             "swbshort", "bake", "export"])
    ap.add_argument("--books", type=str, default="")
    ap.add_argument("--rates", type=str, default="")
    ap.add_argument("--out", type=str, default="/tmp/aac_tables.json")
    args = ap.parse_args(argv)

    aac_oracle.log_capture(True)
    state = {}
    if os.path.exists(args.out):
        state = json.load(open(args.out))

    if args.stage == "sf":
        print("extracting scalefactor codeword set ...")
        state["sf_codewords"] = extract_sf_codewords()
    elif args.stage == "book1":
        sf0 = state["sf_codewords"][0]  # any leaf works as a known cw
        print(f"extracting book 1 (sf filler {sf0}) ...")
        t = extract_spectral_book(1, sf0)
        state["book1"] = {c: list(v) for c, v in t.items()}
    elif args.stage == "books":
        sf0 = state.get("sf0") or state["sf_codewords"][0]
        wanted = [int(b) for b in args.books.split(",") if b] or \
            list(range(2, 12))
        for b in wanted:
            print(f"extracting book {b} ...")
            t = extract_spectral_book(b, sf0)
            state[f"book{b}"] = {c: list(v) for c, v in t.items()}
    elif args.stage == "sfvals":
        book1 = {c: tuple(v) for c, v in state["book1"].items()}
        print("assigning scalefactor values ...")
        sf = assign_sf_values(state["sf_codewords"], book1)
        state["sf"] = sf
        state["sf0"] = next(c for c, d in sf.items() if d == 0)
    elif args.stage == "swb":
        book1 = {c: tuple(v) for c, v in state["book1"].items()}
        sf0 = state["sf0"]
        rates = [int(r) for r in args.rates.split(",") if r] or RATES
        swb = state.get("swb_long", {})
        for sr in rates:
            print(f"extracting long swb table @ {sr} ...")
            swb[str(sr)] = extract_swb_long(book1, sf0, sr)
        state["swb_long"] = swb
    elif args.stage == "bake":
        bake(state)
        return
    elif args.stage == "export":
        # reverse path: rebuild the rig's state JSON from the BAKED
        # tables (for re-running later stages when /tmp state is gone)
        from vocal_remover_tpu import native
        mod = native.get()
        sf = {}
        _, _, lens_b, codes_b = mod.aac_huff_get(0)
        lens = list(lens_b)
        codes = np.frombuffer(codes_b, np.uint32)
        for i in range(121):
            sf[format(codes[i], f"0{lens[i]}b")] = i - 60
        state["sf"] = sf
        state["sf0"] = next(c for c, d in sf.items() if d == 0)
        state["sf_codewords"] = list(sf)
        for b, (dims, lav, signed) in BOOKS.items():
            _, _, lens_b, codes_b = mod.aac_huff_get(b)
            lens = list(lens_b)
            codes = np.frombuffer(codes_b, np.uint32)
            base = (2 * lav + 1) if signed else \
                (lav + 1 if b != 11 else 17)
            t = {}
            for idx in range(len(lens)):
                vals = []
                ix = idx
                for _ in range(dims):
                    vals.append(ix % base)
                    ix //= base
                vals = vals[::-1]
                if signed:
                    vals = [v - lav for v in vals]
                t[format(codes[idx], f"0{lens[idx]}b")] = vals
            state[f"book{b}"] = t
        state["swb_long"] = {}
        state["swb_short"] = {}
        for sr in RATES:
            i = RATES.index(sr)
            state["swb_long"][str(sr)] = np.frombuffer(
                mod.aac_swb_get(i, 1), np.uint16).tolist()
            state["swb_short"][str(sr)] = np.frombuffer(
                mod.aac_swb_get(i, 0), np.uint16).tolist()
    elif args.stage == "swbshort":
        book1 = {c: tuple(v) for c, v in state["book1"].items()}
        sf0 = state["sf0"]
        rates = [int(r) for r in args.rates.split(",") if r] or RATES
        swb = state.get("swb_short", {})
        for sr in rates:
            print(f"extracting short swb table @ {sr} ...")
            swb[str(sr)] = extract_swb_short(book1, sf0, sr)
        state["swb_short"] = swb

    with open(args.out, "w") as f:
        json.dump(state, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Extract + verify the MP3 Huffman tables against libmpg123.

Walks every Layer III Huffman code tree breadth-first with purpose-
built probe streams (scripts/mp3_bitstream.py): each candidate bit
prefix `p` is probed twice (p+0-pad and p+1-pad); the oracle's decoded
(x, y) pair is read back from the probe frame's PCM via a basis fit,
and the pair of responses classifies `p` as a codeword (both probes
yield the same pair — modulo the ESC-linbits signature 15->16) or an
interior node (the extension bit reaches different leaves). The walk
terminates with the complete code table, every entry of which has, by
construction, been individually confirmed by the oracle decoder.

Run:  python scripts/mp3_extract_tables.py [--bake]
  --bake rewrites the PLACEHOLDER tables in native/mp3dec.c with the
  extracted data.

The same probe rig re-runs in tests/test_mp3.py (sampled) as a
regression against the baked tables.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mp3_bitstream import Granule, probe_stream  # noqa: E402
from mp3_oracle import mpg123_decode  # noqa: E402

FRAME = 1152
SEG = 2 * FRAME          # probe frame + spacer frame
T1 = {(0, 0): "1", (0, 1): "001", (1, 0): "01", (1, 1): "000"}

# pair tables to extract: id -> (xlen, linbits)
PAIR_TABLES = {1: (2, 0), 2: (3, 0), 3: (3, 0), 5: (4, 0), 6: (4, 0),
               7: (6, 0), 8: (6, 0), 9: (6, 0), 10: (8, 0), 11: (8, 0),
               12: (8, 0), 13: (16, 0), 15: (16, 0), 16: (16, 1),
               24: (16, 4)}


def _decode_native(data: bytes) -> np.ndarray:
    from vocal_remover_tpu.native import _vrtnative as mod

    pcm_b, n, ch, sr = mod.mp3_decode(data)
    return np.frombuffer(pcm_b, np.float32)


def build_basis() -> np.ndarray:
    """(8, SEG) PCM response to unit spectral amplitude at lines 0..7,
    generated through the (oracle-validated) native decoder with
    table-1 streams."""
    basis = np.zeros((8, SEG), np.float32)
    for line in range(8):
        npairs = line // 2 + 1
        bits = []
        for k in range(npairs):
            if k < npairs - 1:
                bits.append(T1[(0, 0)])
            else:
                code = T1[(1, 0)] if line % 2 == 0 else T1[(0, 1)]
                bits.append(code + "0")        # positive sign
        p = Granule(bits="".join(bits), big_values=npairs,
                    table_select=(1, 1, 1))
        pcm = _decode_native(probe_stream([p]))
        basis[line] = pcm[:SEG]
    return basis


def fit_lines(basis: np.ndarray, seg: np.ndarray) -> np.ndarray:
    """signed spectral values at lines 0..7 from one probe segment"""
    amp, *_ = np.linalg.lstsq(basis.T, seg[:SEG], rcond=None)
    return np.sign(amp) * np.abs(amp) ** 0.75


def batch_probe(granules: list[Granule]) -> list[np.ndarray]:
    """oracle-decode a batch of probes -> per-probe PCM segments"""
    segs = []
    CHUNK = 1500
    for i in range(0, len(granules), CHUNK):
        chunk = granules[i:i + CHUNK]
        data = probe_stream(chunk)
        pcm, sr = mpg123_decode(data)
        pcm = pcm[:, 0]
        want = len(chunk) * SEG
        assert len(pcm) >= want, (len(pcm), want)
        for k in range(len(chunk)):
            segs.append(pcm[k * SEG:(k + 1) * SEG])
    return segs


def extract_pair_table(tid: int, basis: np.ndarray, log=print) -> dict:
    xlen, linbits = PAIR_TABLES[tid]
    # pad must out-reach the deepest possible code (19) from any probed
    # prefix, plus linbits+sign per value: a too-short zero-path would
    # make the oracle zero BOTH probe frames of an interior node, which
    # would read back as a spurious (0,0) leaf.
    pad = 22 + 2 * linbits
    frontier = ["0", "1"]
    table = {}
    for depth in range(1, 20):
        if not frontier:
            break
        probes = []
        for p in frontier:
            for ext in ("0", "1"):
                bits = p + ext + "0" * (pad - 1)
                probes.append(Granule(bits=bits, big_values=1,
                                      table_select=(tid, 0, 0)))
        segs = batch_probe(probes)
        nxt = []
        for i, p in enumerate(frontier):
            v1 = fit_lines(basis, segs[2 * i])
            v2 = fit_lines(basis, segs[2 * i + 1])
            x1, y1 = int(round(v1[0])), int(round(v1[1]))
            x2, y2 = int(round(v2[0])), int(round(v2[1]))
            a1, b1, a2, b2 = abs(x1), abs(y1), abs(x2), abs(y2)
            leaf = None
            # ESC tables: P2's flipped pad bit lands in the value-15
            # linbits field, reading 15 + 2^(linbits-1)
            esc = 15 + (1 << (linbits - 1)) if linbits else None
            if (a1, b1) == (a2, b2):
                leaf = (a1, b1)
            elif linbits and (a1, b1) == (15, b2) and a2 == esc:
                leaf = (15, b1)          # ESC on x
            elif linbits and a1 == a2 and (b1, b2) == (15, esc):
                leaf = (a1, 15)          # ESC on y
            if leaf is not None:
                if leaf[0] >= xlen or leaf[1] >= xlen:
                    raise RuntimeError(
                        f"t{tid}: probe {p} decoded out-of-range {leaf}")
                if leaf in table.values():
                    raise RuntimeError(
                        f"t{tid}: duplicate pair {leaf} at {p}")
                table[p] = leaf
            else:
                nxt.extend((p + "0", p + "1"))
        frontier = nxt
        log(f"  t{tid} depth {depth}: {len(table)} codes, "
            f"frontier {len(frontier)}")
    if frontier:
        raise RuntimeError(f"t{tid}: unresolved prefixes {frontier[:4]}")
    if len(table) != xlen * xlen:
        raise RuntimeError(f"t{tid}: {len(table)} codes != {xlen * xlen}")
    assert abs(sum(2.0 ** -len(c) for c in table) - 1.0) < 1e-12
    return table


def extract_count1_table(sel: int, basis: np.ndarray, log=print) -> dict:
    frontier = ["0", "1"]
    table = {}
    for depth in range(1, 12):
        if not frontier:
            break
        probes = []
        for p in frontier:
            for ext in ("0", "1"):
                bits = p + ext + "0" * 5
                probes.append(Granule(bits=bits, big_values=0,
                                      count1table_select=sel))
        segs = batch_probe(probes)
        nxt = []
        for i, p in enumerate(frontier):
            v1 = np.round(fit_lines(basis, segs[2 * i])[:4]).astype(int)
            v2 = np.round(fit_lines(basis, segs[2 * i + 1])[:4]).astype(int)
            if np.array_equal(np.abs(v1), np.abs(v2)):
                quad = tuple(int(a) for a in np.abs(v1))
                if any(q not in (0, 1) for q in quad):
                    raise RuntimeError(f"count1 {sel}: bad quad {quad}")
                if quad in table.values():
                    raise RuntimeError(
                        f"count1 {sel}: duplicate {quad} at {p}")
                table[p] = quad
            else:
                nxt.extend((p + "0", p + "1"))
        frontier = nxt
        log(f"  count1[{sel}] depth {depth}: {len(table)} codes, "
            f"frontier {len(frontier)}")
    if frontier or len(table) != 16:
        raise RuntimeError(f"count1 {sel}: incomplete ({len(table)})")
    return table


def tables_to_c(tid: int, table: dict) -> tuple[str, str, list, list]:
    """-> (lens_c, codes_c) arrays in (x*ylen + y) index order"""
    xlen = PAIR_TABLES[tid][0] if tid in PAIR_TABLES else 4
    n = xlen * xlen
    lens = [0] * n
    codes = [0] * n
    for code, val in table.items():
        if isinstance(val, tuple) and len(val) == 4:  # count1 quad
            idx = val[0] * 8 + val[1] * 4 + val[2] * 2 + val[3]
        else:
            idx = val[0] * xlen + val[1]
        lens[idx] = len(code)
        codes[idx] = int(code, 2)
    assert all(lens), f"t{tid}: missing entries"
    def fmt(arr, per):
        out = []
        for i in range(0, len(arr), per):
            out.append("    " + ",".join(str(v) for v in arr[i:i + per]) +
                       ",")
        return "\n".join(out)
    return fmt(lens, 18), fmt(codes, 12), lens, codes


def _flatten(tid, table) -> tuple[list, list]:
    """table dict -> (lens, codes) arrays in decoder index order"""
    if tid in ("c1a", "c1b"):
        n = 16
        lens, codes = [0] * n, [0] * n
        for code, quad in table.items():
            idx = quad[0] * 8 + quad[1] * 4 + quad[2] * 2 + quad[3]
            lens[idx] = len(code)
            codes[idx] = int(code, 2)
    else:
        xlen = PAIR_TABLES[tid][0]
        n = xlen * xlen
        lens, codes = [0] * n, [0] * n
        for code, (x, y) in table.items():
            idx = x * xlen + y
            lens[idx] = len(code)
            codes[idx] = int(code, 2)
    assert all(lens), f"{tid}: missing entries"
    return lens, codes


def apply_tables(all_tables: dict) -> None:
    """push extracted tables into the loaded native module"""
    from vocal_remover_tpu.native import _vrtnative as mod

    for tid, table in all_tables.items():
        cid = {"c1a": 32, "c1b": 33}.get(tid, tid)
        lens, codes = _flatten(tid, table)
        mod.mp3_huff_set(cid, bytes(lens),
                         np.asarray(codes, np.uint16).tobytes())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bake", action="store_true",
                    help="rewrite mp3dec.c with extracted tables")
    ap.add_argument("--tables", type=str, default="",
                    help="comma list (default: all)")
    args = ap.parse_args(argv)

    print("building line basis from native decoder ...")
    basis = build_basis()

    wanted = ([int(t) for t in args.tables.split(",") if t]
              or list(PAIR_TABLES))
    out = {}
    for tid in wanted:
        print(f"extracting table {tid} ...")
        out[tid] = extract_pair_table(tid, basis)
    print("extracting count1 tables ...")
    out["c1a"] = extract_count1_table(0, basis)
    out["c1b"] = extract_count1_table(1, basis)

    import json

    ser = {str(k): {c: list(v) for c, v in t.items()}
           for k, t in out.items()}
    with open("/tmp/mp3_tables.json", "w") as f:
        json.dump(ser, f)
    print("wrote /tmp/mp3_tables.json")

    if args.bake:
        bake(out)


def bake(out: dict) -> None:
    """rewrite the table data arrays in mp3dec.c"""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "vocal_remover_tpu", "native",
        "mp3dec.c")
    src = open(path).read()
    chunks = []
    for tid in sorted(k for k in out if isinstance(k, int)):
        lens_c, codes_c, _, _ = tables_to_c(tid, out[tid])
        chunks.append(f"static const uint8_t ht{tid}_l[] = {{\n"
                      f"{lens_c}\n}};\n"
                      f"static const uint16_t ht{tid}_c[] = {{\n"
                      f"{codes_c}\n}};")
    for name, cid in (("c1a", "c1a"), ("c1b", "c1b")):
        n = 16
        lens = [0] * n
        codes = [0] * n
        for code, quad in out[name].items():
            idx = quad[0] * 8 + quad[1] * 4 + quad[2] * 2 + quad[3]
            lens[idx] = len(code)
            codes[idx] = int(code, 2)
        chunks.append(
            f"static const uint8_t ext_{name}_l[16] = "
            f"{{{','.join(map(str, lens))}}};\n"
            f"static const uint16_t ext_{name}_c[16] = "
            f"{{{','.join(map(str, codes))}}};")
    blob = ("/* ORACLE-EXTRACTED tables (scripts/mp3_extract_tables.py):"
            " every codeword\n * individually probed against libmpg123;"
            " see file header. */\n" + "\n".join(chunks) + "\n")
    start = src.index("/* BEGIN EXTRACTED TABLES */")
    end = src.index("/* END EXTRACTED TABLES */")
    src = (src[:start] + "/* BEGIN EXTRACTED TABLES */\n" + blob +
           src[end:])
    open(path, "w").write(src)
    print(f"baked tables into {path}")


if __name__ == "__main__":
    main()

"""SBR bitstream parser (ISO/IEC 14496-3 §4.4.2.8) over the
probe-extracted Huffman codebooks — the Python model for the native
parser in native/aacdec.c and the closed-loop validator for the
extraction rig.

Parses one sbr_extension_data payload (SCE or CPE) back into the
`sbr_bitstream` dataclasses, so `write(parse(bits)) == bits` holds
against the minting rig and decoded envelope values can be compared
with the libav oracle's output levels (tests/test_sbr.py).

Reference context: the upstream project decodes HE-AAC through
librosa -> audioread -> ffmpeg (reference inference.py:136-138); this
parser is part of closing that gap natively.
"""

from __future__ import annotations

import json
import os

import sbr_bitstream as sb

_HERE = os.path.dirname(os.path.abspath(__file__))


class BitReader:
    def __init__(self, bits: str):
        self.bits = bits
        self.pos = 0

    def get(self, n: int) -> int:
        v = int(self.bits[self.pos:self.pos + n] or "0", 2)
        if self.pos + n > len(self.bits):
            raise ValueError("overread")
        self.pos += n
        return v


class Books:
    """value<->bits maps for the 10 books, keyed like the writer's
    huff dict; loaded from the extraction state file."""

    NAMES = {
        ("f_env", 1): "f_env_3", ("f_env", 0): "f_env_1",
        ("t_env", 1): "t_env_3", ("t_env", 0): "t_env_1",
        ("f_env_bal", 1): "f_env_bal_3", ("f_env_bal", 0): "f_env_bal_1",
        ("t_env_bal", 1): "t_env_bal_3", ("t_env_bal", 0): "t_env_bal_1",
        ("t_noise", 1): "t_noise_3", ("t_noise", 0): "t_noise_3",
        ("t_noise_bal", 1): "t_noise_bal_3",
        ("t_noise_bal", 0): "t_noise_bal_3",
        # noise freq-deltas always use the 3.0 dB envelope books
        ("f_noise", 1): "f_env_3", ("f_noise", 0): "f_env_3",
        ("f_noise_bal", 1): "f_env_bal_3",
        ("f_noise_bal", 0): "f_env_bal_3",
    }

    def __init__(self, state: dict | None = None):
        if state is None:
            with open(os.path.join(_HERE, "sbr_huff_state.json")) as f:
                state = json.load(f)
        self.enc = {}     # book name -> {value: bits}
        self.dec = {}     # book name -> {bits: value}
        for name in set(self.NAMES.values()):
            tbl = state[name]
            self.enc[name] = {int(v): b for v, b in tbl.items()}
            self.dec[name] = {b: int(v) for v, b in tbl.items()}

    def writer_huff(self, amp: int) -> dict:
        """huff dict for sbr_bitstream writers: key -> {value: bits}."""
        return {k: self.enc[n] for (k, a), n in self.NAMES.items()
                if a == amp}

    def read(self, r: BitReader, key: str, amp: int) -> int:
        d = self.dec[self.NAMES[(key, amp)]]
        w = ""
        while True:
            w += str(r.get(1))
            if w in d:
                return d[w]
            if len(w) > 24:
                raise ValueError(f"bad {key} codeword {w}")


def _ceil_log2(x: int) -> int:
    return max(0, (x - 1).bit_length())


def parse_header(r: BitReader) -> sb.SbrHeader:
    amp = r.get(1)
    start = r.get(4)
    stop = r.get(4)
    xover = r.get(3)
    r.get(2)                          # bs_reserved
    e1 = r.get(1)
    e2 = r.get(1)
    h = sb.SbrHeader(amp_res=amp, start_freq=start, stop_freq=stop,
                     xover_band=xover)
    if e1:
        h.freq_scale = r.get(2)
        h.alter_scale = r.get(1)
        h.noise_bands = r.get(2)
    if e2:
        h.limiter_bands = r.get(2)
        h.limiter_gains = r.get(2)
        h.interpol_freq = r.get(1)
        h.smoothing_mode = r.get(1)
    return h


def parse_grid(r: BitReader) -> sb.SbrChannel:
    ch = sb.SbrChannel()
    ch.frame_class = r.get(2)
    if ch.frame_class == sb.FIXFIX:
        ch.num_env = 1 << r.get(2)
        if ch.num_env > 4:
            raise ValueError("FIXFIX num_env 8 unsupported")
        ch.freq_res = [r.get(1)] * ch.num_env
    elif ch.frame_class == sb.FIXVAR:
        ch.var_bord_1 = r.get(2)
        n_rel = r.get(2)
        ch.rel_bord_1 = [2 * r.get(2) + 2 for _ in range(n_rel)]
        ch.num_env = n_rel + 1
        ch.pointer = r.get(_ceil_log2(ch.num_env + 1))
        fr = [r.get(1) for _ in range(ch.num_env)]
        ch.freq_res = fr[::-1]
    elif ch.frame_class == sb.VARFIX:
        ch.var_bord_0 = r.get(2)
        n_rel = r.get(2)
        ch.rel_bord_0 = [2 * r.get(2) + 2 for _ in range(n_rel)]
        ch.num_env = n_rel + 1
        ch.pointer = r.get(_ceil_log2(ch.num_env + 1))
        ch.freq_res = [r.get(1) for _ in range(ch.num_env)]
    else:
        ch.var_bord_0 = r.get(2)
        ch.var_bord_1 = r.get(2)
        n0 = r.get(2)
        n1 = r.get(2)
        ch.rel_bord_0 = [2 * r.get(2) + 2 for _ in range(n0)]
        ch.rel_bord_1 = [2 * r.get(2) + 2 for _ in range(n1)]
        ch.num_env = n0 + n1 + 1
        ch.pointer = r.get(_ceil_log2(ch.num_env + 1))
        ch.freq_res = [r.get(1) for _ in range(ch.num_env)]
    return ch


def parse_dtdf(r: BitReader, ch: sb.SbrChannel):
    ch.df_env = [r.get(1) for _ in range(ch.num_env)]
    ch.df_noise = [r.get(1) for _ in range(ch.n_noise_env())]


def parse_envelope(r: BitReader, ch: sb.SbrChannel, ft: sb.FreqTables,
                   books: Books, amp_hdr: int, balance: bool,
                   prev: list | None):
    """Decodes absolute env_sf values; delta-time references `prev`
    (the previous envelope vector + its freq_res) across frames."""
    amp = ch.amp_res_used(amp_hdr)
    start_bits = (5 if amp else 6) if balance else (6 if amp else 7)
    fkey = "f_env_bal" if balance else "f_env"
    tkey = "t_env_bal" if balance else "t_env"
    # env_sf stays in the writer's domain (raw start units, table-unit
    # deltas); the coupled DEQUANT is where balance values act doubled
    scale = 1
    out = []
    for l in range(ch.num_env):
        n = ft.env_bands(ch.freq_res[l])
        vals = [0] * n
        if ch.df_env[l] == 0:
            vals[0] = r.get(start_bits) * scale
            for k in range(1, n):
                vals[k] = vals[k - 1] + books.read(r, fkey, amp) * scale
        else:
            pv, pres = (prev if l == 0 else
                        (out[l - 1], ch.freq_res[l - 1]))
            ptab = ft.env_table(pres)
            ctab = ft.env_table(ch.freq_res[l])
            for k in range(n):
                d = books.read(r, tkey, amp) * scale
                # map band k onto the previous grid (§4.6.18.3.5)
                lo = ctab[k]
                j = 0
                while j + 1 < len(ptab) and ptab[j + 1] <= lo:
                    j += 1
                vals[k] = pv[j] + d
        out.append(vals)
        prev = (vals, ch.freq_res[l])
    ch.env_sf = out
    return prev


def parse_noise(r: BitReader, ch: sb.SbrChannel, ft: sb.FreqTables,
                books: Books, amp_hdr: int, balance: bool,
                prev: list | None):
    amp = ch.amp_res_used(amp_hdr)
    fkey = "f_noise_bal" if balance else "f_noise"
    tkey = "t_noise_bal" if balance else "t_noise"
    scale = 1                  # writer-domain, as for the envelopes
    out = []
    for l in range(ch.n_noise_env()):
        vals = [0] * ft.n_q
        if ch.df_noise[l] == 0:
            vals[0] = r.get(5) * scale
            for k in range(1, ft.n_q):
                # noise freq deltas use the 3.0 dB envelope books
                vals[k] = vals[k - 1] + books.read(r, fkey, 1) * scale
        else:
            pv = prev if l == 0 else out[l - 1]
            for k in range(ft.n_q):
                vals[k] = pv[k] + books.read(r, tkey, 1) * scale
        out.append(vals)
        prev = vals
    ch.noise_sf = out
    return prev


def parse_add_harmonic(r: BitReader, ch: sb.SbrChannel,
                       ft: sb.FreqTables):
    if r.get(1):
        ch.add_harmonic = [r.get(1) for _ in range(ft.n_high)]
    else:
        ch.add_harmonic = []


class SbrParser:
    """Stateful across frames: header persistence + delta-time
    references.  One instance per SBR element (SCE or CPE)."""

    def __init__(self, fs_sbr: int, books: Books | None = None):
        self.fs_sbr = fs_sbr
        self.books = books or Books()
        self.header: sb.SbrHeader | None = None
        self.ft: sb.FreqTables | None = None
        self.env_prev = [None, None]      # per channel (vals, freq_res)
        self.noise_prev = [None, None]

    def parse(self, bits: str, stereo: bool) -> sb.SbrData:
        r = BitReader(bits)
        send_header = r.get(1)
        if send_header:
            self.header = parse_header(r)
            self.ft = self.header.tables(self.fs_sbr)
        if self.header is None:
            raise ValueError("SBR data before any header")
        hdr, ft, books = self.header, self.ft, self.books
        amp = hdr.amp_res
        data = sb.SbrData(header=hdr, channels=[], fs_sbr=self.fs_sbr,
                          send_header=bool(send_header))
        if not stereo:
            if r.get(1):
                r.get(4)                  # bs_sbr_reserved_bits_data
            ch = parse_grid(r)
            parse_dtdf(r, ch)
            ch.invf = [r.get(2) for _ in range(ft.n_q)]
            self.env_prev[0] = parse_envelope(
                r, ch, ft, books, amp, False, self.env_prev[0])
            self.noise_prev[0] = parse_noise(
                r, ch, ft, books, amp, False, self.noise_prev[0])
            parse_add_harmonic(r, ch, ft)
            data.channels = [ch]
        else:
            if r.get(1):
                r.get(4)
            coupling = r.get(1)
            data.coupling = bool(coupling)
            if coupling:
                c0 = parse_grid(r)
                c1 = sb.SbrChannel(
                    frame_class=c0.frame_class, num_env=c0.num_env,
                    freq_res=list(c0.freq_res), pointer=c0.pointer,
                    var_bord_0=c0.var_bord_0, var_bord_1=c0.var_bord_1,
                    rel_bord_0=list(c0.rel_bord_0),
                    rel_bord_1=list(c0.rel_bord_1))
                parse_dtdf(r, c0)
                parse_dtdf(r, c1)
                c0.invf = [r.get(2) for _ in range(ft.n_q)]
                c1.invf = list(c0.invf)
                self.env_prev[0] = parse_envelope(
                    r, c0, ft, books, amp, False, self.env_prev[0])
                self.noise_prev[0] = parse_noise(
                    r, c0, ft, books, amp, False, self.noise_prev[0])
                self.env_prev[1] = parse_envelope(
                    r, c1, ft, books, amp, True, self.env_prev[1])
                self.noise_prev[1] = parse_noise(
                    r, c1, ft, books, amp, True, self.noise_prev[1])
                parse_add_harmonic(r, c0, ft)
                parse_add_harmonic(r, c1, ft)
            else:
                c0 = parse_grid(r)
                c1 = parse_grid(r)
                parse_dtdf(r, c0)
                parse_dtdf(r, c1)
                c0.invf = [r.get(2) for _ in range(ft.n_q)]
                c1.invf = [r.get(2) for _ in range(ft.n_q)]
                self.env_prev[0] = parse_envelope(
                    r, c0, ft, books, amp, False, self.env_prev[0])
                self.env_prev[1] = parse_envelope(
                    r, c1, ft, books, amp, False, self.env_prev[1])
                self.noise_prev[0] = parse_noise(
                    r, c0, ft, books, amp, False, self.noise_prev[0])
                self.noise_prev[1] = parse_noise(
                    r, c1, ft, books, amp, False, self.noise_prev[1])
                parse_add_harmonic(r, c0, ft)
                parse_add_harmonic(r, c1, ft)
            data.channels = [c0, c1]
        if r.get(1):                      # bs_extended_data
            size = r.get(4)
            if size == 15:
                size += r.get(8)
            r.pos += 8 * size             # skip (PS lives here)
        return data

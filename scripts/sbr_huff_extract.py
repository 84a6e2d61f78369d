"""Probe-extract the 10 SBR Huffman codebooks from the system libav
decoder — codeword by codeword, like scripts/aac_extract_tables.py did
for the LC books and scripts/mp3_extract_tables.py for mp3.  No
decoder source is consulted; everything is measured behaviorally.

Two bit-exact oracles drive the extraction:

1. **Codeword discovery** (`exact_consumed`): mint an sbr_data whose
   single Huffman slot carries a 24-bit candidate string S = (free
   code-tree path) + zeros, with every field after the slot written as
   zeros.  Because an all-zeros tail parses to the same fixed shape at
   ANY bit alignment (raw starts 0, flags 0), the decoder's total
   consumed bit count C obeys C - W = L - 24 where W is the written
   payload length and L the length of the codeword at the start of S.
   C is pinned exactly by sweeping the advertised FIL byte count
   (ffmpeg alarms iff the parse overruns it) under semantically
   neutral alignment shifters covering every residue mod 8.  One probe
   therefore discovers one complete codeword; the walk repeats from
   the next free path until the Kraft sum reaches exactly 1.

2. **Value assignment**: libav validates decoded scalefactors at
   parse/dequant time — envelope values >= 61 (3.0 dB) / >= 121
   (1.5 dB) log "envelope scalefactor overflow in dequant" (frame
   survives), negative values wrap unsigned and hard-error
   ("env_facs_q 255 is invalid"), and huffman-decoded noise values
   outside [0, 30] hard-error (thresholds measured empirically with
   raw-only streams).  Writing envelope 1 as a raw start v0 and the
   candidate codeword as the sole delta makes the decoded value
   v0 + d, so binary-searching v0 against those alarms yields the
   exact integer d.  Positive noise / balance values (no usable upper
   alarm) are paired with already-assigned negative codewords so the
   running value crosses zero instead.

Extraction order matters: the plain envelope books come first because
the t/f/noise/balance rigs reuse their known codewords as alignment
shifters and chain ballast.  The state file survives interruption;
`--verify` re-probes every (codeword, value) pair.

The extracted tables are baked into native/aacdec.c by
scripts/sbr_extract_tables.py.  Reference context: the upstream
project decodes HE-AAC through librosa -> audioread -> ffmpeg
(reference inference.py:136-138); these tables close that gap for the
native decoder.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import aac_lc_encode as lc
import aac_oracle
import sbr_bitstream as sb
from aac_bitstream import CPE, BitWriter, adts_frame

_HERE = os.path.dirname(os.path.abspath(__file__))
STATE = os.path.join(_HERE, "sbr_huff_state.json")

OK, OVF, ERR = "ok", "ovf", "err"

# Empirical alarm thresholds (measured by raw-value sweeps, see
# module docstring): envelope dequant warning fires iff value >= this.
ENV_OVF_AT = {1: 61, 0: 121}
ENV_START_BITS = {1: 6, 0: 7}        # non-balance raw start width
NOISE_INVALID_AT = 31                # huffman-decoded noise >= 31 errors


class Seq(dict):
    """Huffman codebook stand-in that returns scripted bit strings in
    write order, ignoring the requested delta (the rig controls the
    written values, so the script IS the intended sequence)."""

    def __init__(self, seq):
        super().__init__()
        self.seq = list(seq)
        self.i = 0

    def __getitem__(self, key):
        b = self.seq[self.i]
        self.i += 1
        return b

    def get(self, key, default=None):
        return self


class Rig:
    """Minting + classified decode against the libav oracle."""

    def __init__(self):
        rng = np.random.default_rng(0)
        self.sces = [lc.encode_sce(
            lc.dense_spectrum(22050, 200, 9000, rng=rng), 22050,
            global_gain=170) for _ in range(2)]
        aac_oracle.log_capture(True)
        self.decodes = 0

    def header(self, amp: int) -> sb.SbrHeader:
        return sb.SbrHeader(amp_res=amp, start_freq=14, stop_freq=5,
                            xover_band=0, limiter_bands=0,
                            limiter_gains=3)

    def mint(self, data_factory, nframes: int, stereo: bool) -> bytes:
        """data_factory() -> SbrData; pass mint_i for per-frame data."""
        return self.mint_i(lambda i: data_factory(), nframes, stereo)

    def mint_i(self, data_factory, nframes: int, stereo: bool) -> bytes:
        out = []
        for i in range(nframes):
            fil = sb.sbr_fil(data_factory(i))
            if stereo:
                cpe = CPE(left=self.sces[i % 2], right=self.sces[i % 2],
                          ms_present=0)
                out.append(adts_frame([cpe, fil], sr=22050,
                                      channel_config=2))
            else:
                out.append(adts_frame([self.sces[i % 2], fil],
                                      sr=22050))
        return b"".join(out)

    def decode(self, stream: bytes) -> str:
        self.decodes += 1
        aac_oracle.clear_log()
        try:
            aac_oracle.decode_bytes(stream, suffix=".aac")
        except RuntimeError:
            return ERR
        log = aac_oracle.last_log()
        if ("invalid" in log or "Expected to read" in log
                or "rror" in log):
            return ERR
        if "overflow" in log:
            return OVF
        return OK


# ---------------------------------------------------------------------------
# Oracle 1: exact consumed-bits measurement


def exact_consumed(rig: Rig, make_data, shifters, stereo=False):
    """Exact payload parse length C for make_data(shift=0)'s layout.

    make_data(shift_idx) must return an SbrData whose written length
    differs from shift 0 only by neutral, fully-consumed extra bits;
    `shifters` is the list of shift indices (their offsets must cover
    every residue mod 8 across the list).  ffmpeg alarms iff
    ceil((C+4)/8) > the advertised FIL byte count, so each shifted
    layout localizes C within a byte and the residues intersect the
    windows to one integer.  Returns C or None when inconsistent."""
    w0 = BitWriter()
    make_data(shifters[0]).write(w0)
    w_base = len("".join(w0.bits))
    lo_c = hi_c = None
    for s in shifters:
        w = BitWriter()
        make_data(s).write(w)
        payload = "".join(w.bits)
        W = len(payload)
        offset = W - w_base

        def alarm(count: int) -> bool:
            fil = sb.Fil(payload_bits=payload, count_override=count)
            if stereo:
                frames = b"".join(adts_frame(
                    [CPE(left=rig.sces[i % 2], right=rig.sces[i % 2]),
                     fil], sr=22050, channel_config=2)
                    for i in range(3))
            else:
                frames = b"".join(
                    adts_frame([rig.sces[i % 2], fil], sr=22050)
                    for i in range(3))
            return rig.decode(frames) == ERR

        # find the smallest non-alarming count WITH a confirmed alarm
        # at count-1 (C can sit well below W when the payload carries
        # trailing candidate padding the parser never consumes)
        cbase = -(-(W + 4) // 8)
        cstar = None
        c = max(1, cbase - 5)
        if alarm(c):
            for cc in range(c + 1, cbase + 4):
                if not alarm(cc):
                    cstar = cc
                    break
        else:
            while c > 1 and not alarm(c - 1):
                c -= 1
            cstar = c
        if cstar is None:
            return None
        lo = 8 * (cstar - 1) - 4 + 1 - offset
        hi = 8 * cstar - 4 - offset
        lo_c = lo if lo_c is None else max(lo_c, lo)
        hi_c = hi if hi_c is None else min(hi_c, hi)
        if lo_c == hi_c:
            return lo_c
        if lo_c > hi_c:
            return None
    return lo_c if lo_c == hi_c else None


# ---------------------------------------------------------------------------
# Book rigs.  Each knows how to (a) write a discovery payload with the
# candidate bits in its slot and zeros after, (b) write a value-probe
# stream for alarm bisection.


class BookRig:
    name = ""
    stereo = False

    def __init__(self, rig: Rig, known: dict):
        """known: {book_name: {value_str: bits}} for completed books."""
        self.rig = rig
        self.known = known

    # -- helpers ------------------------------------------------------

    def kbits(self, book: str, val: int) -> str:
        return self.known[book][str(val)]

    def shifter_f_env(self, n: int):
        """n in [0..7]: script for env1's single f-delta slot plus the
        header force flags, producing offsets covering residues mod 8.
        Uses only the '0' (1 bit) f_env codeword + header shifters
        (+4/+5/+6): combined offsets {0,4,5,6,9,10,11,15}."""
        combos = [(False, False, False), (False, False, True),
                  (True, False, False), (False, True, False),
                  (True, False, True), (False, True, True),
                  (True, True, False), (True, True, True)]
        return combos[n]

    def make_header(self, amp: int, e1: bool, e2: bool) -> sb.SbrHeader:
        return dataclasses.replace(
            self.rig.header(amp), limiter_bands=2, limiter_gains=2,
            interpol_freq=1, smoothing_mode=1,
            force_extra1=e1, force_extra2=e2)

    # -- discovery ----------------------------------------------------

    def discover_len(self, cand: str):
        """Codeword length at the start of `cand` (len 24/32)."""
        def make_data(shift):
            e1, e2, de = self.shifter_f_env(shift)
            ch, huff = self.disc_channel(cand)
            return sb.SbrData(header=self.make_header(self.amp, e1, e2),
                              channels=ch, fs_sbr=44100,
                              data_extra=de, huff=huff,
                              coupling=self.stereo)

        w = BitWriter()
        make_data(0).write(w)
        W = len("".join(w.bits))
        C = exact_consumed(self.rig, make_data, list(range(8)),
                           stereo=self.stereo)
        if C is None:
            return None
        return len(cand) + C - W


class EnvF(BookRig):
    """f_huffman_env (freq-direction deltas), amp_res 1 (3.0 dB) or
    0 (1.5 dB).  ISO 14496-3 tables 4.A.x; slot: second band of a
    2-band high-res envelope."""

    def __init__(self, rig, known, amp):
        super().__init__(rig, known)
        self.amp = amp
        self.name = f"f_env_{3 if amp else 1}"
        self.v_anchor = 40 if amp else 60

    def disc_channel(self, cand):
        ch = sb.SbrChannel(
            frame_class=sb.FIXVAR, num_env=2, freq_res=[1, 0],
            pointer=0, rel_bord_1=[8], df_env=[0, 0], df_noise=[0, 0],
            invf=[0], env_sf=[[self.v_anchor, 0], [0]],
            noise_sf=[[0], [0]])
        return [ch], {"f_env": Seq([cand])}

    def value_status(self, cand, v0):
        ch = sb.SbrChannel(
            frame_class=sb.FIXVAR, num_env=2, freq_res=[1, 0],
            pointer=0, rel_bord_1=[8], df_env=[0, 0], df_noise=[0, 0],
            invf=[0], env_sf=[[v0, 0], [40]], noise_sf=[[0], [0]])
        hdr = self.rig.header(self.amp)
        stream = self.rig.mint(
            lambda: sb.SbrData(header=hdr, channels=[ch], fs_sbr=44100,
                               huff={"f_env": Seq([cand])}),
            2, False)
        return self.rig.decode(stream)

    def assign_value(self, cand):
        return _env_value(self, cand)


class EnvT(EnvF):
    """t_huffman_env: slot is the sole t-delta of a 1-band low-res
    second envelope; its value chains from envelope 1's raw start."""

    def __init__(self, rig, known, amp):
        super().__init__(rig, known, amp)
        self.name = f"t_env_{3 if amp else 1}"

    def disc_channel(self, cand):
        ch = sb.SbrChannel(
            frame_class=sb.FIXVAR, num_env=2, freq_res=[1, 0],
            pointer=0, rel_bord_1=[8], df_env=[0, 1], df_noise=[0, 0],
            invf=[0], env_sf=[[self.v_anchor, 0], [0]],
            noise_sf=[[0], [0]])
        fbook = f"f_env_{3 if self.amp else 1}"
        return [ch], {"f_env": Seq([self.kbits(fbook, 0)]),
                      "t_env": Seq([cand])}

    def value_status(self, cand, v0):
        ch = sb.SbrChannel(
            frame_class=sb.FIXVAR, num_env=2, freq_res=[1, 0],
            pointer=0, rel_bord_1=[8], df_env=[0, 1], df_noise=[0, 0],
            invf=[0], env_sf=[[v0, 0], [0]], noise_sf=[[0], [0]])
        fbook = f"f_env_{3 if self.amp else 1}"
        hdr = self.rig.header(self.amp)
        stream = self.rig.mint(
            lambda: sb.SbrData(header=hdr, channels=[ch], fs_sbr=44100,
                               huff={"f_env": Seq([self.kbits(fbook, 0)]),
                                     "t_env": Seq([cand])}),
            2, False)
        return self.rig.decode(stream)


def _env_value(book, cand):
    """Exact envelope delta via alarm bisection: value = v0 + d;
    OVF iff v0 + d >= T, ERR iff v0 + d < 0."""
    T = ENV_OVF_AT[book.amp]
    vmax = T - 1                      # largest raw start that is clean
    if (1 << ENV_START_BITS[book.amp]) - 1 < vmax:
        vmax = (1 << ENV_START_BITS[book.amp]) - 1
    s0 = book.value_status(cand, 0)
    if s0 == OK or s0 == OVF:
        # d >= 0: first non-OK v0 is T - d (the status ladder is
        # OK -> OVF at value T -> hard ERR past the parse bound, so
        # bisect on status != OK)
        if s0 == OVF:
            return T                  # v0=0 already over: d >= T (never)
        lo, hi = 0, vmax              # status(lo)=ok; find first non-OK
        if book.value_status(cand, vmax) == OK:
            return 0                  # never overflows: d == 0
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if book.value_status(cand, mid) != OK:
                hi = mid
            else:
                lo = mid
        return T - hi
    # d < 0: smallest clean v0 is -d
    lo, hi = 0, vmax                  # status(lo)=ERR; find first non-ERR
    if book.value_status(cand, vmax) == ERR:
        raise RuntimeError(f"{book.name}: {cand} always errors")
    while hi - lo > 1:
        mid = (lo + hi) // 2
        if book.value_status(cand, mid) == ERR:
            lo = mid
        else:
            hi = mid
    return -hi


class NoiseT(BookRig):
    """t_huffman_noise_3.0dB: slot is the t-delta of the second noise
    floor (df_noise=[0,1]); value chains from noise floor 1's raw
    start.  Huffman-decoded noise values outside [0, 30] hard-error;
    RAW starts up to 31 are accepted (check is on decoded values
    only), which conveniently makes d = -31 measurable from q0 = 31."""

    amp = 1
    name = "t_noise_3"

    def __init__(self, rig, known):
        super().__init__(rig, known)

    def disc_channel(self, cand, q0=15):
        ch = sb.SbrChannel(
            frame_class=sb.FIXVAR, num_env=2, freq_res=[1, 0],
            pointer=0, rel_bord_1=[8], df_env=[0, 0], df_noise=[0, 1],
            invf=[0], env_sf=[[40, 0], [0]], noise_sf=[[q0], [0]])
        return [ch], {"f_env": Seq([self.kbits("f_env_3", 0)]),
                      "t_noise": Seq([cand])}

    def discover_len(self, cand):
        # the decoded value q0 + d must stay in [0, 30] for the parse
        # to survive; d is unknown, so fall through anchor choices
        for q0 in (15, 0, 30, 31):
            def make_data(shift, q0=q0):
                e1, e2, de = self.shifter_f_env(shift)
                ch, huff = self.disc_channel(cand, q0)
                return sb.SbrData(header=self.make_header(1, e1, e2),
                                  channels=ch, fs_sbr=44100,
                                  data_extra=de, huff=huff)
            w = BitWriter()
            make_data(0).write(w)
            W = len("".join(w.bits))
            C = exact_consumed(self.rig, make_data, list(range(8)))
            if C is not None:
                return len(cand) + C - W
        return None

    def value_status(self, cand, q0):
        ch = sb.SbrChannel(
            frame_class=sb.FIXVAR, num_env=2, freq_res=[1, 0],
            pointer=0, rel_bord_1=[8], df_env=[0, 0], df_noise=[0, 1],
            invf=[0], env_sf=[[40, 0], [0]], noise_sf=[[q0], [0]])
        hdr = self.rig.header(1)
        stream = self.rig.mint(
            lambda: sb.SbrData(header=hdr, channels=[ch], fs_sbr=44100,
                               huff={"f_env": Seq([self.kbits("f_env_3",
                                                              0)]),
                                     "t_noise": Seq([cand])}),
            2, False)
        return self.rig.decode(stream)

    def assign_value(self, cand):
        """value = q0 + d; ERR iff outside [0, 30] (both sides)."""
        s0 = self.value_status(cand, 0)
        if s0 != ERR:
            # d in [0, 30]: first ERR at q0 = 31 - d
            if self.value_status(cand, 30) != ERR:
                return 0
            lo, hi = 0, 30
            while hi - lo > 1:
                mid = (lo + hi) // 2
                if self.value_status(cand, mid) == ERR:
                    hi = mid
                else:
                    lo = mid
            return NOISE_INVALID_AT - hi
        # d < 0 (or d == 31, but q0=31 disambiguates: 31 + d <= 30 ok
        # for d < 0 incl. -31; 31 + 31 = 62 errors)
        if self.value_status(cand, 31) == ERR:
            return NOISE_INVALID_AT   # d = +31 (always-ERR signature)
        lo, hi = 0, 31
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if self.value_status(cand, mid) == ERR:
                lo = mid
            else:
                hi = mid
        return -hi


class BalBook(BookRig):
    """Coupled-CPE balance codebooks (ch1 carries balance factors).
    ch0 uses the plain books (already extracted) with all-known
    codewords; the candidate sits in ch1's slot with zeros after."""

    stereo = True
    slot = ""                          # huff key for the candidate

    def __init__(self, rig, known, amp=1):
        super().__init__(rig, known)
        self.amp = amp
        self.fbook = f"f_env_{3 if amp else 1}"
        self.balf = f"f_env_bal_{3 if amp else 1}"

    def channels(self, cand, v0b, q0b=0, c0_delta=0):
        c0 = sb.SbrChannel(
            frame_class=sb.FIXVAR, num_env=2, freq_res=[1, 0],
            pointer=0, rel_bord_1=[8], df_env=[0, 0], df_noise=[0, 0],
            invf=[0], env_sf=[[40, 0], [0]], noise_sf=[[0], [0]])
        c1 = sb.SbrChannel(
            frame_class=sb.FIXVAR, num_env=2, freq_res=[1, 0],
            pointer=0, rel_bord_1=[8],
            df_env=self.df1, df_noise=self.dn1,
            invf=[0], env_sf=[[v0b, 0], [0]], noise_sf=[[q0b], [0]])
        huff = {"f_env": Seq([self.kbits(self.fbook, c0_delta)] * 2)}
        huff.update(self.slot_huff(cand))
        return [c0, c1], huff

    def make_data(self, cand, v0b, e1, e2, q0b=0, c0_delta=0):
        ch, huff = self.channels(cand, v0b, q0b, c0_delta)
        return sb.SbrData(header=self.make_header(self.amp, e1, e2),
                          channels=ch, fs_sbr=44100,
                          coupling=True, huff=huff)

    def shifts(self):
        """(c0_delta value, e1, e2) combos covering every written-
        offset residue mod 8: c0's env1 f-delta slot is scripted with
        known codewords of varying length, combined with the +5/+6
        header shifters (the writer has no CPE data_extra field)."""
        if getattr(self, "_shifts", None) is not None:
            return self._shifts
        lens = {v: len(self.kbits(self.fbook, v))
                for v in (-4, -3, -2, -1, 0, 1, 2, 3, 4)}
        base = lens[0]
        chosen, seen = [(0, False, False)], {0}
        for v, l in sorted(lens.items(), key=lambda kv: abs(kv[0])):
            for e1, e2, h in ((False, False, 0), (True, False, 5),
                              (False, True, 6), (True, True, 11)):
                r = (l - base + h) % 8
                if r not in seen:
                    seen.add(r)
                    chosen.append((v, e1, e2))
        if len(seen) < 8:
            raise RuntimeError(f"{self.name}: only residues {seen}")
        self._shifts = chosen
        return chosen

    def discover_len(self, cand):
        shifts = self.shifts()
        for anchor in self.anchors:
            def mk(shift, anchor=anchor):
                c0d, e1, e2 = shifts[shift]
                return self.make_data(cand, anchor[0], e1, e2,
                                      q0b=anchor[1], c0_delta=c0d)
            w = BitWriter()
            mk(0).write(w)
            W = len("".join(w.bits))
            C = exact_consumed(self.rig, mk, list(range(len(shifts))),
                               stereo=True)
            if C is not None:
                return len(cand) + C - W
        return None

    def value_status(self, cand, v0b, q0b=0):
        hdr = self.rig.header(self.amp)

        def mk():
            ch, huff = self.channels(cand, v0b, q0b)
            return sb.SbrData(header=hdr, channels=ch, fs_sbr=44100,
                              coupling=True, huff=huff)
        return self.rig.decode(self.rig.mint(mk, 2, True))


class BalEnvF(BalBook):
    df1 = (0, 0)
    dn1 = (0, 0)

    def __init__(self, rig, known, amp=1):
        super().__init__(rig, known, amp)
        self.name = f"f_env_bal_{3 if amp else 1}"
        self.slot = "f_env_bal"
        self.anchors = [(15, 0), (0, 0), (30, 0)] if amp else \
            [(30, 0), (0, 0), (60, 0)]

    def slot_huff(self, cand):
        return {"f_env_bal": Seq([cand])}

    def vmax(self):
        return (1 << (5 if self.amp else 6)) - 1

    def neg_bisect(self, cand):
        """d < 0 iff ERR at v0b=0; then the smallest clean v0b is -d.
        Returns the exact negative value, 0+ sentinel None."""
        if self.value_status(cand, 0) != ERR:
            return None
        lo, hi = 0, self.vmax()
        if self.value_status(cand, hi) == ERR:
            raise RuntimeError(f"{self.name}: {cand} always errors")
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if self.value_status(cand, mid) == ERR:
                lo = mid
            else:
                hi = mid
        return -hi

    def find_neg1(self, words) -> str:
        if getattr(self, "_neg1", None):
            return self._neg1
        for cw in sorted(words, key=len):
            if self.neg_bisect(cw) == -1:
                self._neg1 = cw
                return cw
        raise RuntimeError(f"{self.name}: no -1 codeword found")

    def pos_status(self, cand, ballast_neg1, j):
        """Wide-grid coupled probe: ch1 env1 = [0, cand, -1 x j,
        0-deltas...]; ERR iff the running value 0 + d - j' drops
        below zero, i.e. iff j > d."""
        hdr = dataclasses.replace(
            sb.SbrHeader(amp_res=self.amp, start_freq=0, stop_freq=8,
                         freq_scale=0, alter_scale=0, noise_bands=0,
                         xover_band=0, limiter_bands=0,
                         limiter_gains=3))
        ft = hdr.tables(44100)
        nh, nl = ft.n_high, ft.n_low
        assert j <= nh - 2, j
        c0 = sb.SbrChannel(
            frame_class=sb.FIXVAR, num_env=2, freq_res=[1, 0],
            pointer=0, rel_bord_1=[8], df_env=[0, 0], df_noise=[0, 0],
            invf=[0] * ft.n_q, env_sf=[[40] * nh, [0] * nl],
            noise_sf=[[0] * ft.n_q, [0] * ft.n_q])
        c1 = sb.SbrChannel(
            frame_class=sb.FIXVAR, num_env=2, freq_res=[1, 0],
            pointer=0, rel_bord_1=[8], df_env=[0, 0], df_noise=[0, 0],
            invf=[0] * ft.n_q, env_sf=[[0] * nh, [0] * nl],
            noise_sf=[[0] * ft.n_q, [0] * ft.n_q])
        # Filler for the slots after the probe block: +1 when already
        # assigned (bounded upward drift; balance values are stored
        # doubled internally and hard-error past ~127, so repeating a
        # large candidate 33x would alarm on its own), else the
        # candidate itself (only happens while |d| <= 1 is still
        # being resolved, where self-fill is drift-safe).  ERR iff
        # j > d either way.
        fill = getattr(self, "_pos1", None) or cand
        script = ([cand] + [ballast_neg1] * j
                  + [fill] * (nh - 2 - j) + [fill] * (nl - 1))

        def mk():
            huff = {"f_env": Seq([self.kbits(self.fbook, 0)]
                                 * (nh - 1 + nl - 1)),
                    "f_env_bal": Seq(script)}
            return sb.SbrData(header=hdr, channels=[c0, c1],
                              fs_sbr=44100, coupling=True, huff=huff)
        return self.rig.decode(self.rig.mint(mk, 2, True))

    def assign_value(self, cand):
        d = self.neg_bisect(cand)
        if d is not None:
            return d
        words = self.known[self.name + "_words"]
        neg1 = self.find_neg1(words)
        # bisect smallest j with ERR: j_thr = d + 1
        lo, hi = 0, 30
        if self.pos_status(cand, neg1, lo) == ERR:
            raise RuntimeError(f"{self.name}: {cand} ERR at j=0")
        if self.pos_status(cand, neg1, hi) != ERR:
            raise RuntimeError(f"{self.name}: {cand} clean at j=30")
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if self.pos_status(cand, neg1, mid) == ERR:
                hi = mid
            else:
                lo = mid
        d = hi - 1
        if d == 1 and not getattr(self, "_pos1", None):
            self._pos1 = cand
        return d


class BalEnvT(BalEnvF):
    df1 = (0, 1)
    dn1 = (0, 0)

    def __init__(self, rig, known, amp=1):
        super().__init__(rig, known, amp)
        self.name = f"t_env_bal_{3 if amp else 1}"
        self.slot = "t_env_bal"
        self.anchors = [(15, 0), (0, 0), (30, 0)] if amp else \
            [(30, 0), (0, 0), (60, 0)]

    def slot_huff(self, cand):
        return {"f_env_bal": Seq([self.kbits(self.balf, 0)]),
                "t_env_bal": Seq([cand])}

    def pos_status(self, cand, ballast_neg1, j):
        """Cross-frame time-delta chain: frame 0 raw-starts ch1 at 0,
        frame 1 applies the candidate, frames 2..j+1 each apply a
        known -1; delta-time coding chains across frames, so ERR iff
        the running balance value 0 + d - j drops below zero."""
        hdr = self.rig.header(self.amp)
        tbook = f"t_env_{3 if self.amp else 1}"

        def factory(i):
            first = i == 0
            c0 = sb.SbrChannel(
                frame_class=sb.FIXVAR, num_env=1, freq_res=[0],
                pointer=0, rel_bord_1=[], df_env=[0 if first else 1],
                df_noise=[0], invf=[0],
                env_sf=[[40]], noise_sf=[[0]])
            c1 = sb.SbrChannel(
                frame_class=sb.FIXVAR, num_env=1, freq_res=[0],
                pointer=0, rel_bord_1=[], df_env=[0 if first else 1],
                df_noise=[0], invf=[0],
                env_sf=[[0]], noise_sf=[[0]])
            huff = {"t_env": Seq([self.kbits(tbook, 0)]),
                    "t_env_bal": Seq([cand if i == 1 else
                                      ballast_neg1])}
            return sb.SbrData(header=hdr, channels=[c0, c1],
                              fs_sbr=44100, coupling=True, huff=huff,
                              send_header=first)
        stream = self.rig.mint_i(factory, j + 2, True)
        return self.rig.decode(stream)


class BalNoiseT(BalBook):
    df1 = (0, 0)
    dn1 = (0, 1)

    def __init__(self, rig, known, amp=1):
        super().__init__(rig, known, amp)
        self.name = "t_noise_bal_3"
        self.slot = "t_noise_bal"
        # anchor on ch1's noise start q0b; env start fixed mid
        self.anchors = [(15, 15), (15, 0), (15, 30), (15, 31)]

    def slot_huff(self, cand):
        return {"f_env_bal": Seq([self.kbits(self.balf, 0)]),
                "t_noise_bal": Seq([cand])}

    def value_status_q(self, cand, q0b):
        return self.value_status(cand, 15, q0b)

    def assign_value(self, cand):
        """ch1 noise floors are stored doubled and checked against
        [0, 30] in stored units: stored = 2*q0b + 2*d, so the wrap
        boundary gives d = -first_clean_q0b and the upper boundary
        gives d = 16 - first_err_q0b (both exact in table units;
        measured empirically, see the landscape sweep in the log)."""
        if self.value_status_q(cand, 0) == ERR:
            # d < 0: clean window is [-d, 15-d], which always contains
            # q0b=15; bisect the wrap boundary below it
            lo, hi = 0, 15
            if self.value_status_q(cand, hi) == ERR:
                raise RuntimeError(f"{self.name}: {cand} always ERR")
            while hi - lo > 1:
                mid = (lo + hi) // 2
                if self.value_status_q(cand, mid) == ERR:
                    lo = mid
                else:
                    hi = mid
            return -hi
        lo, hi = 0, 31                # d >= 0: first ERR q0b = 16 - d
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if self.value_status_q(cand, mid) == ERR:
                hi = mid
            else:
                lo = mid
        return 16 - hi


# ---------------------------------------------------------------------------
# State + walks


def save_state(state: dict):
    tmp = STATE + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
    os.replace(tmp, STATE)


def load_state() -> dict:
    if os.path.exists(STATE):
        with open(STATE) as f:
            return json.load(f)
    return {}


def next_free_path(words) -> str | None:
    """Lexicographically smallest code-tree path with no known word as
    a prefix and unexplored capacity below, or None when complete."""
    def capacity(prefix):
        cap = 2.0 ** -len(prefix)
        for w in words:
            if w.startswith(prefix):
                cap -= 2.0 ** -len(w)
        return cap

    if abs(sum(2.0 ** -len(w) for w in words) - 1.0) < 1e-12:
        return None
    s = ""
    wordset = set(words)
    while True:
        for b in "01":
            t = s + b
            if t in wordset:
                continue
            if capacity(t) > 1e-12:
                s = t
                break
        else:
            raise RuntimeError(f"no free child under {s!r}")
        if not any(w.startswith(s) for w in words):
            return s


def discover_book(book, state: dict, log=print, maxlen: int = 24):
    """Walk the free code space until the Kraft sum closes at 1.

    A leaf whose decoded VALUE kills the parse at every anchor (e.g.
    noise delta +31 is out of range from any raw start) cannot be
    length-probed; sidestep it with continuations that diverge from
    the all-zeros leaf, and infer the final leaf from Kraft closure
    when it is the only gap left."""
    words = state.setdefault(book.name + "_words", [])
    while True:
        path = next_free_path(words)
        if path is None:
            log(f"{book.name}: complete, {len(words)} codewords")
            return words
        conts = ["0" * maxlen] + ["0" * k + "1" + "0" * maxlen
                                  for k in range(10)]
        L = cand = None
        for cont in conts:
            cand = (path + cont)[:max(maxlen, len(path))]
            L = book.discover_len(cand)
            if L is not None:
                break
        if L is None:
            kraft = sum(2.0 ** -len(w) for w in words)
            if (abs((1.0 - kraft) - 2.0 ** -len(path)) < 1e-12
                    and not any(w.startswith(path) for w in words)):
                # the unprobeable leaf is the single remaining gap:
                # its subtree capacity matches, so the leaf is `path`
                words.append(path)
                log(f"  {book.name} word {path} (INFERRED from Kraft "
                    f"closure, n={len(words)})")
                save_state(state)
                continue
            raise RuntimeError(f"{book.name}: oracle inconsistent at "
                               f"{path}")
        if L > len(cand):
            cand = (path + "0" * (L + 8))[:L + 8]
            L = book.discover_len(cand)
        cw = cand[:L]
        if not cw.startswith(path) and not path.startswith(cw):
            raise RuntimeError(f"{book.name}: {cw} off-path {path}")
        if cw in words:
            raise RuntimeError(f"{book.name}: rediscovered {cw}")
        words.append(cw)
        kraft = sum(2.0 ** -len(w) for w in words)
        log(f"  {book.name} word {cw} (n={len(words)}, "
            f"kraft={kraft:.8f}, decodes={book.rig.decodes})")
        save_state(state)


def assign_book(book, state: dict, log=print):
    words = state[book.name + "_words"]
    tbl = state.setdefault(book.name, {})
    assigned = set(tbl.values())
    for cw in words:
        if cw in assigned:
            continue
        v = book.assign_value(cw)
        key = str(v)
        if key in tbl and tbl[key] != cw:
            raise RuntimeError(f"{book.name}: duplicate value {v}: "
                               f"{cw} vs {tbl[key]}")
        tbl[key] = cw
        assigned.add(cw)
        log(f"  {book.name} {cw} -> {v:+d} "
            f"(decodes={book.rig.decodes})")
        save_state(state)
    vals = sorted(int(k) for k in tbl)
    log(f"{book.name}: values {vals[0]}..{vals[-1]} n={len(vals)}")
    return tbl


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("books", nargs="*",
                   default=["f_env_3", "t_env_3", "f_env_1", "t_env_1",
                            "t_noise_3", "f_env_bal_3", "t_env_bal_3",
                            "f_env_bal_1", "t_env_bal_1",
                            "t_noise_bal_3"])
    p.add_argument("--discover-only", action="store_true")
    args = p.parse_args()
    state = load_state()
    rig = Rig()
    known = state
    mk = {
        "f_env_3": lambda: EnvF(rig, known, 1),
        "f_env_1": lambda: EnvF(rig, known, 0),
        "t_env_3": lambda: EnvT(rig, known, 1),
        "t_env_1": lambda: EnvT(rig, known, 0),
        "t_noise_3": lambda: NoiseT(rig, known),
        "f_env_bal_3": lambda: BalEnvF(rig, known, 1),
        "f_env_bal_1": lambda: BalEnvF(rig, known, 0),
        "t_env_bal_3": lambda: BalEnvT(rig, known, 1),
        "t_env_bal_1": lambda: BalEnvT(rig, known, 0),
        "t_noise_bal_3": lambda: BalNoiseT(rig, known, 1),
    }
    for name in args.books:
        book = mk[name]()
        discover_book(book, state)
        if not args.discover_only:
            assign_book(book, state)


if __name__ == "__main__":
    main()

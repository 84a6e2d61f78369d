"""Probe-extract the SBR Huffman codebooks from the system libav
decoder — codeword by codeword, like scripts/aac_extract_tables.py did
for the LC books and scripts/mp3_extract_tables.py for mp3.

Method: mint an HE-AAC stream whose sbr_envelope carries exactly ONE
Huffman codeword (a 2-band envelope: raw start value + one freq
delta), with the candidate bitstring in the delta position.  The
envelope dequantization E = 2^(sf/a) makes the decoded delta readable
from the output band-energy ratio, and a raw-coded SENTINEL value in
the following envelope detects any parse-length mismatch: if the
candidate is not a complete codeword (or is longer than the decoder
consumed), every following field shifts and the sentinel scrambles.
Walking the binary code tree breadth-first with this leaf test
recovers the complete codebook; Kraft-sum accounting proves coverage.

The extracted tables are verified in-loop (every codeword re-probed
with a second sentinel) and then baked into native/aacdec.c.

Time-direction books (t_huffman_*) use df_env=1 envelopes whose values
are time-deltas against a raw-coded first envelope; noise books use
the two noise floors of a num_env=2 frame.  Balance books use coupled
CPEs (see extract with balance=True).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import aac_lc_encode as lc
import aac_oracle
import sbr_bitstream as sb
from aac_bitstream import CPE, adts_frame

_HERE = os.path.dirname(os.path.abspath(__file__))
STATE = os.path.join(_HERE, "sbr_huff_state.json")

NFRAMES = 8
SKIP = 2          # settle frames before measuring


def _header(amp_res: int) -> sb.SbrHeader:
    # limiter off + unlimited gains: band-energy ratios then read the
    # envelope deltas directly (the limiter couples bands otherwise)
    return sb.SbrHeader(amp_res=amp_res, start_freq=14, stop_freq=5,
                        xover_band=0, limiter_bands=0, limiter_gains=3)


class Rig:
    def __init__(self, amp_res: int = 1):
        self.hdr = _header(amp_res)
        self.ft = self.hdr.tables(44100)
        self.amp = amp_res
        assert self.ft.n_high == 2 and self.ft.n_low == 1
        rng = np.random.default_rng(0)
        self.sces = [lc.encode_sce(
            lc.dense_spectrum(22050, 200, 9000, rng=rng), 22050,
            global_gain=170) for _ in range(4)]
        aac_oracle.log_capture(True)
        f0, f1, f2 = (self.ft.high[j] * 44100 / 128 for j in range(3))
        self.bands = (f0, f1, f2)
        # interior QMF subbands of each envelope band: the kx edge and
        # the SBR top edge roll off and bias whole-band sums
        sb_w = 44100 / 128.0
        self.int1 = ((self.ft.high[0] + 1) * sb_w, self.ft.high[1] * sb_w)
        self.int2 = (self.ft.high[1] * sb_w, (self.ft.high[2] - 1) * sb_w)
        self._delta_bias = None

    def delta_bias(self) -> float:
        """Constant band2/band1 readback bias (top-edge rolloff),
        calibrated with a Huffman-free single-band envelope."""
        if self._delta_bias is None:
            ch = sb.SbrChannel(num_env=2, freq_res=[0, 0],
                               df_env=[0, 0], df_noise=[0, 0], invf=[0],
                               env_sf=[[45], [45]],
                               noise_sf=[[31], [31]])
            pcm, _ = self.decode(self.mint(ch, {}))
            e1 = self.band_energy(pcm, *self.int1, 0)
            e2 = self.band_energy(pcm, *self.int2, 0)
            self._delta_bias = float(np.log2(e2 / e1)
                                     * self._sf_scale())
        return self._delta_bias

    # -- stream builders ----------------------------------------------

    def mint(self, ch: sb.SbrChannel, huff: dict) -> bytes:
        out = []
        for i in range(NFRAMES):
            data = sb.SbrData(header=self.hdr, channels=[ch],
                              fs_sbr=44100, huff=huff)
            out.append(adts_frame(
                [self.sces[i % len(self.sces)], sb.sbr_fil(data)],
                sr=22050))
        return b"".join(out)

    def decode(self, stream: bytes):
        aac_oracle.clear_log()
        try:
            pcm, sr = aac_oracle.decode_bytes(stream, suffix=".aac")
        except RuntimeError:
            return None, True
        log = aac_oracle.last_log()
        bad = ("Expected to read" in log or "rror" in log
               or "nvalid" in log)
        return pcm[:, 0], bad

    # -- band-energy measurement --------------------------------------

    def _sf_scale(self) -> float:
        """sf units per log2 energy unit: amp_res=1 (3.0 dB) doubles
        energy per sf step (scale 1); amp_res=0 (1.5 dB) takes two sf
        steps per energy octave (scale 2). Verified by raw-value
        sweeps against the oracle."""
        return 1.0 if self.amp else 2.0

    def band_energy(self, pcm, lo_hz, hi_hz, half):
        """Mean energy of [lo_hz, hi_hz) over envelope `half` of each
        frame.  The envelope timeline sits ~(T_HFADJ slots + synthesis
        delay) after the frame start, so envelope 1 (slots 0-16) is
        read at [512, 1280) and envelope 2 (slots 16-32) at
        [1600, 2368) — the latter wraps into the next frame (measured
        empirically with a raw-value sweep)."""
        tot = 0.0
        n = 0
        # windows sit >= 320 samples clear of the envelope borders
        # (384/1408/2432): the 640-tap synthesis window otherwise
        # leaks the loud envelope into the quiet one and floors the
        # dynamic range at ~14 log2E (measured); border-clear windows
        # reach ~31 log2E
        lo_off = 704 if half == 0 else 1728
        for f in range(SKIP, NFRAMES - 1):
            a = 2048 * f + lo_off
            seg = pcm[a:a + 384]
            if len(seg) < 384:
                continue
            X = np.abs(np.fft.rfft(seg * np.hanning(len(seg)))) ** 2
            fr = np.fft.rfftfreq(len(seg), 1 / 44100.0)
            tot += X[(fr >= lo_hz) & (fr < hi_hz)].sum()
            n += 1
        return tot / max(n, 1)

    # -- envelope freq-delta probe -------------------------------------

    def probe_env_f(self, bits: str, v0: int, sentinel: int):
        """FIXVAR grid [0, 8, 16]: envelope 1 is high-res 2-band
        [v0, v0 + delta(bits)], envelope 2 is low-res single-band
        raw `sentinel`.  The delta reads from envelope 1's band 2
        against envelope 2's SAME subbands (adjacent in time, so no
        cross-band rolloff enters), calibrated on the known '0'
        codeword.  The sentinel reads from envelope 2's band-1
        interior; a wrong-length candidate shifts its raw start and
        scrambles it.  Returns (delta_float, sent_ok, parse_bad)."""
        huff = {"f_env": _AnyBits(bits)}
        ch = sb.SbrChannel(
            frame_class=sb.FIXVAR, num_env=2, freq_res=[1, 0],
            pointer=0, rel_bord_1=[8],
            df_env=[0, 0], df_noise=[0, 0], invf=[0],
            env_sf=[[v0, v0], [sentinel]], noise_sf=[[31], [31]])
        pcm, bad = self.decode(self.mint(ch, huff))
        if pcm is None:
            return None, False, True
        e1a = self.band_energy(pcm, *self.int1, 0)
        e1b = self.band_energy(pcm, *self.int2, 0)
        e2a = self.band_energy(pcm, *self.int1, 1)
        e2b = self.band_energy(pcm, *self.int2, 1)
        if min(e1a, e1b, e2a, e2b) <= 0:
            return None, False, True
        sc = self._sf_scale()
        delta = (np.log2(e1b / e2b) * sc + (sentinel - v0)
                 - self._f_cal())
        sent_meas = v0 + np.log2(e2a / e1a) * sc - self._s_cal()
        sent_ok = abs(sent_meas - sentinel) < 1.6
        return float(delta), bool(sent_ok), bool(bad)

    _fcal = None
    _scal = None

    def _f_cal(self) -> float:
        """Calibrate the probe_env_f expressions on the known
        zero-delta codeword '0' (bootstrapped by hand)."""
        if self._fcal is None:
            self._fcal = 0.0
            self._scal = 0.0
            # calibrate at MATCHED separation (sentinel == v0): the
            # time-step response has ~0.95 slope away from 0, so the
            # calibration point must sit where probes are read
            ch = sb.SbrChannel(
                frame_class=sb.FIXVAR, num_env=2, freq_res=[1, 0],
                pointer=0, rel_bord_1=[8],
                df_env=[0, 0], df_noise=[0, 0], invf=[0],
                env_sf=[[46, 46], [46]], noise_sf=[[31], [31]])
            pcm, bad = self.decode(self.mint(ch,
                                             {"f_env": _AnyBits("0")}))
            assert pcm is not None and not bad
            e1a = self.band_energy(pcm, *self.int1, 0)
            e1b = self.band_energy(pcm, *self.int2, 0)
            e2a = self.band_energy(pcm, *self.int1, 1)
            e2b = self.band_energy(pcm, *self.int2, 1)
            sc = self._sf_scale()
            self._fcal = float(np.log2(e1b / e2b) * sc)
            self._scal = float(np.log2(e2a / e1a) * sc)
        return self._fcal

    def _s_cal(self) -> float:
        self._f_cal()
        return self._scal

    # -- envelope time-delta probe -------------------------------------

    def probe_env_t(self, bits: str, v0: int, sentinel: int):
        """Envelope 1: single band raw v0; envelope 2: df_env=1, its
        single t-delta coded by `bits`; noise floor 2 raw = sentinel
        (5-bit field after the envelope data)."""
        ch = sb.SbrChannel(
            num_env=2, freq_res=[0, 0], df_env=[0, 1], df_noise=[0, 0],
            invf=[0], env_sf=[[v0], [0]],
            noise_sf=[[31], [sentinel]])
        stream = self.mint(ch, {"t_env": _AnyBits(bits)})
        pcm, bad = self.decode(stream)
        if pcm is None:
            return None, False, True
        f0, f1, f2 = self.bands
        e1 = self.band_energy(pcm, f0, f2, 0)
        e2 = self.band_energy(pcm, f0, f2, 1)
        if e1 <= 0:
            return None, False, True
        delta = np.log2(max(e2, 1e-30) / e1) * self._sf_scale()
        # sentinel: noise floor of half 2 — measured via noise energy
        # with the envelope known; cheaper: re-use parse flag + a
        # second sentinel probe at the caller level
        return float(delta), True, bool(bad)

    # -- noise time-delta probe -----------------------------------------

    def probe_noise_t(self, bits: str, q0: int, sentinel: int):
        """Noise floor 1 raw q0; noise floor 2 t-delta via `bits`.
        Core content sits below the patch sources so the HF output is
        noise-only; the add_harmonic flag bit after the noise data
        doubles as a cheap shift detector via `sentinel` (0/1 choice
        folded into env values instead)."""
        ch = sb.SbrChannel(
            num_env=2, freq_res=[0, 0], df_env=[0, 0],
            df_noise=[0, 1], invf=[0],
            env_sf=[[55], [sentinel]], noise_sf=[[q0], [0]])
        stream = self.mint_quiet(ch, {"t_noise": _AnyBits(bits)})
        pcm, bad = self.decode(stream)
        if pcm is None:
            return None, False, True
        f0, f1, f2 = self.bands
        e1 = self.band_energy(pcm, f0, f2, 0)
        e2 = self.band_energy(pcm, f0, f2, 1)
        if e1 <= 0:
            return None, False, True
        # noise energy ~ E * 2^(6-q): higher q -> less noise; envelope
        # constant 55 both halves except sentinel in half 2
        delta = -(np.log2(max(e2, 1e-30) / e1)
                  - (sentinel - 55) / self._sf_scale() * 0)
        return float(delta), True, bool(bad)

    def mint_quiet(self, ch: sb.SbrChannel, huff: dict) -> bytes:
        rng = np.random.default_rng(7)
        sces = [lc.encode_sce(lc.dense_spectrum(22050, 300, 2000,
                                                rng=rng), 22050,
                              global_gain=165) for _ in range(4)]
        out = []
        for i in range(NFRAMES):
            data = sb.SbrData(header=self.hdr, channels=[ch],
                              fs_sbr=44100, huff=huff)
            out.append(adts_frame([sces[i % len(sces)],
                                   sb.sbr_fil(data)], sr=22050))
        return b"".join(out)


def _payload_bits(rig, ch: sb.SbrChannel, huff: dict) -> str:
    from aac_bitstream import BitWriter
    w = BitWriter()
    sb.SbrData(header=rig.hdr, channels=[ch], fs_sbr=44100,
               huff=huff).write(w)
    return "".join(w.bits)


_SHIFT_COMBOS = [
    # (force_extra1, force_extra2, data_extra) -> payload offset
    (False, False, False),   # +0
    (False, False, True),    # +4
    (True, False, False),    # +5
    (False, True, False),    # +6
    (True, False, True),     # +9  (mod 8 = 1)
    (False, True, True),     # +10 (mod 8 = 2)
    (True, True, False),     # +11 (mod 8 = 3)
    (True, True, True),      # +15 (mod 8 = 7)
]


def exact_consumed(rig, ch: sb.SbrChannel, huff: dict,
                   hdr: sb.SbrHeader | None = None):
    """Measure EXACTLY how many payload bits the oracle consumes for
    this sbr_data.  ffmpeg alarms iff ceil((C+4)/8) > advertised FIL
    byte count; sweeping the advertised count locates C within a byte,
    and re-running with header/data_extra alignment shifters (+4/+5/+6
    bits and sums, all semantically neutral) moves the byte grid to
    every residue, intersecting the windows down to one integer.
    Returns C for the UNSHIFTED layout, or None when inconsistent."""
    import dataclasses
    # parse lengths don't depend on the limiter fields, so use a
    # default-extras header (same grid fields) — that makes the
    # force_extra1/2 flags real +5/+6 shifters
    base_hdr = dataclasses.replace(
        hdr or rig.hdr, limiter_bands=2, limiter_gains=2,
        interpol_freq=1, smoothing_mode=1,
        force_extra1=False, force_extra2=False)
    from aac_bitstream import BitWriter
    w0 = BitWriter()
    sb.SbrData(header=base_hdr, channels=[ch], fs_sbr=44100,
               huff=huff).write(w0)
    w_base = len("".join(w0.bits))
    lo_c, hi_c = None, None
    for e1, e2, de in _SHIFT_COMBOS:
        h = dataclasses.replace(base_hdr, force_extra1=e1,
                                force_extra2=e2)
        data = sb.SbrData(header=h, channels=[ch], fs_sbr=44100,
                          data_extra=de, huff=huff)
        w = BitWriter()
        data.write(w)
        payload = "".join(w.bits)
        W = len(payload)
        offset = W - w_base

        def alarm(count: int) -> bool:
            fil = sb.Fil(payload_bits=payload, count_override=count)
            stream = b"".join(
                adts_frame([rig.sces[i % len(rig.sces)], fil],
                           sr=22050) for i in range(3))
            pcm, bad = rig.decode(stream)
            return bool(bad) or pcm is None

        cbase = -(-(W + 4) // 8)
        cstar = None
        for c in range(max(1, cbase - 2), cbase + 4):
            if not alarm(c):
                # confirm the previous count alarms (well-formed
                # boundary) unless we are at the scan start
                if c == max(1, cbase - 2) or alarm(c - 1):
                    cstar = c
                break
        if cstar is None:
            return None
        # C + offset in (8*(cstar-1) - 4, 8*cstar - 4]
        lo = 8 * (cstar - 1) - 4 + 1 - offset
        hi = 8 * cstar - 4 - offset
        lo_c = lo if lo_c is None else max(lo_c, lo)
        hi_c = hi if hi_c is None else min(hi_c, hi)
        if lo_c == hi_c:
            return lo_c
        if lo_c > hi_c:
            return None
    return lo_c if lo_c == hi_c else None


class _AnyBits(dict):
    """Huffman dict stand-in returning the same candidate bits for
    every requested delta (the probe controls the written values so
    only one delta is ever requested)."""

    def __init__(self, bits: str):
        super().__init__()
        self.bits = bits

    def __getitem__(self, key):
        return self.bits

    def get(self, key, default=None):
        return self


def env_f_configs():
    """Three channel configs with different trailing-field layouts:
    a true codeword parses to delta 0 under all of them, while a
    wrong-length candidate only coincidentally re-aligns under one."""
    c1 = sb.SbrChannel(frame_class=sb.FIXVAR, num_env=2,
                       freq_res=[1, 0], pointer=0, rel_bord_1=[8],
                       df_env=[0, 0], df_noise=[0, 0], invf=[0],
                       env_sf=[[46, 46], [44]], noise_sf=[[31], [31]])
    c2 = sb.SbrChannel(frame_class=sb.FIXVAR, num_env=2,
                       freq_res=[1, 0], pointer=0, rel_bord_1=[8],
                       df_env=[0, 0], df_noise=[0, 0], invf=[0],
                       env_sf=[[46, 46], [21]], noise_sf=[[5], [26]],
                       add_harmonic=[1, 0])
    c3 = sb.SbrChannel(frame_class=sb.FIXVAR, num_env=2,
                       freq_res=[1, 0], pointer=0, rel_bord_1=[8],
                       df_env=[0, 0], df_noise=[0, 0], invf=[0],
                       env_sf=[[46, 46], [52]], noise_sf=[[18], [9]])
    return [c1, c2, c3]


def is_leaf_exact(rig, bits: str, key: str = "f_env") -> bool:
    from aac_bitstream import BitWriter
    for ch in env_f_configs():
        huff = {key: _AnyBits(bits)}
        w = BitWriter()
        import dataclasses
        h = dataclasses.replace(rig.hdr, limiter_bands=2,
                                limiter_gains=2, force_extra1=False,
                                force_extra2=False)
        sb.SbrData(header=h, channels=[ch], fs_sbr=44100,
                   huff=huff).write(w)
        W = len("".join(w.bits))
        C = exact_consumed(rig, ch, huff)
        if C is None or C != W:
            return False
    return True


def walk_lengths(rig, state: dict, name: str, key: str = "f_env",
                 log=print, max_depth: int = 20):
    """Recover the code TREE (all codewords) via the exact
    consumed-bits oracle; values are assigned in a separate pass."""
    words = state.setdefault(name + "_words", [])
    frontier = state.setdefault(name + "_frontier", ["0", "1"])
    kraft = sum(2.0 ** -len(b) for b in words)
    while frontier:
        bits = frontier.pop(0)
        if len(bits) > max_depth:
            log(f"  abandon {bits}")
            continue
        if is_leaf_exact(rig, bits, key):
            words.append(bits)
            kraft += 2.0 ** -len(bits)
            log(f"  leaf {bits}  (kraft {kraft:.8f}, n={len(words)})")
            if abs(kraft - 1.0) < 1e-12:
                frontier.clear()
                log("  codespace complete")
                break
        else:
            frontier.append(bits + "0")
            frontier.append(bits + "1")
        save_state(state)
    return words


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


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("table", nargs="?", default="f_env_3")
    args = p.parse_args()
    state = load_state()
    if args.table == "f_env_3":
        rig = Rig(amp_res=1)
        words = walk_lengths(rig, state, "f_env_3")
        print(json.dumps(sorted(words, key=len)))

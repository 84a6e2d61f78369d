"""Hand-rolled SBR (HE-AAC) bitstream writer + frequency-grid math.

Role mirrors scripts/aac_bitstream.py (LC core) for the SBR extension:
builds `sbr_extension_data` FIL payloads bit by bit so the extraction
rig and tests can mint HE-AAC streams with arbitrary headers, grids,
envelopes and noise floors — including degenerate single-band grids
whose envelope/noise data is coded ENTIRELY with raw start values
(zero Huffman codewords), which is how the SBR Huffman tables get
probe-extracted in the first place (scripts/sbr_extract_tables.py).

Layout follows ISO/IEC 14496-3 §4.4.2.8 (sbr_extension_data,
sbr_header, sbr_grid, sbr_dtdf, sbr_invf, sbr_envelope, sbr_noise)
and §4.6.18.3 (frequency band tables, limiter table, patch
construction). Everything here is verified BEHAVIORALLY against the
system libav decoder before the native decoder relies on it: crafted
staircase envelopes reveal the oracle's band borders, which must land
exactly where this module's grid math predicts (tests/test_sbr.py).

The reference decodes HE-AAC through librosa -> audioread -> ffmpeg
(reference inference.py:136-138); this rig exists so the native
decoder (native/aacdec.c) can close that gap without external
backends.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from aac_bitstream import BitWriter

FIXFIX, FIXVAR, VARFIX, VARVAR = 0, 1, 2, 3

EXT_SBR_DATA = 0x0D
EXT_SBR_DATA_CRC = 0x0E


# ---------------------------------------------------------------------------
# Frequency band tables (ISO/IEC 14496-3 §4.6.18.3.2).  All rates are the
# SBR (output) sampling rate = 2x the core AAC rate.

def _round(x: float) -> int:
    """Spec INT(x+0.5) rounding for positive x."""
    return int(math.floor(x + 0.5))


def start_band(fs_sbr: int, bs_start_freq: int) -> int:
    """k0, the first QMF subband of the master table (§4.6.18.3.2.1)."""
    if fs_sbr < 32000:
        start_min = _round(3000.0 * 128.0 / fs_sbr)
    elif fs_sbr < 64000:
        start_min = _round(4000.0 * 128.0 / fs_sbr)
    else:
        start_min = _round(5000.0 * 128.0 / fs_sbr)
    if fs_sbr == 16000:
        offsets = [-8, -7, -6, -5, -4, -3, -2, -1, 0, 1, 2, 3, 4, 5, 6, 7]
    elif fs_sbr == 22050:
        offsets = [-5, -4, -3, -2, -1, 0, 1, 2, 3, 4, 5, 6, 7, 9, 11, 13]
    elif fs_sbr == 24000:
        offsets = [-5, -3, -2, -1, 0, 1, 2, 3, 4, 5, 6, 7, 9, 11, 13, 16]
    elif fs_sbr == 32000:
        offsets = [-6, -4, -2, -1, 0, 1, 2, 3, 4, 5, 6, 7, 9, 11, 13, 16]
    elif 32000 < fs_sbr <= 64000:
        offsets = [-4, -2, -1, 0, 1, 2, 3, 4, 5, 6, 7, 9, 11, 13, 16, 20]
    elif fs_sbr > 64000:
        offsets = [-2, -1, 0, 1, 2, 3, 4, 5, 6, 7, 9, 11, 13, 16, 20, 24]
    else:
        raise ValueError(f"unsupported SBR rate {fs_sbr}")
    return start_min + offsets[bs_start_freq]


def stop_band(fs_sbr: int, bs_stop_freq: int, k0: int) -> int:
    """k2, one past the last SBR subband (§4.6.18.3.2.1)."""
    if bs_stop_freq == 14:
        return min(64, 2 * k0)
    if bs_stop_freq == 15:
        return min(64, 3 * k0)
    if fs_sbr < 32000:
        stop_min = _round(6000.0 * 128.0 / fs_sbr)
    elif fs_sbr < 64000:
        stop_min = _round(8000.0 * 128.0 / fs_sbr)
    else:
        stop_min = _round(10000.0 * 128.0 / fs_sbr)
    dk = sorted(
        _round(stop_min * (64.0 / stop_min) ** ((i + 1) / 13.0))
        - _round(stop_min * (64.0 / stop_min) ** (i / 13.0))
        for i in range(13)
    )
    return min(64, stop_min + sum(dk[:bs_stop_freq]))


def max_sbr_range(fs_sbr: int) -> int:
    """Largest allowed k2 - k0 (§4.6.18.3.6 constraint table)."""
    if fs_sbr <= 32000:
        return 48
    if fs_sbr == 44100:
        return 35
    return 32


def master_table(k0: int, k2: int, bs_freq_scale: int,
                 bs_alter_scale: int) -> list[int]:
    """fMaster (§4.6.18.3.2.1), the master QMF band border vector."""
    if not (k0 < k2 <= 64):
        raise ValueError(f"bad SBR range k0={k0} k2={k2}")
    if bs_freq_scale == 0:
        dk = 2 if bs_alter_scale else 1
        if bs_alter_scale:
            nbands = ((k2 - k0 + 2) >> 2) << 1
        else:
            nbands = ((k2 - k0) >> 1) << 1
        if nbands <= 0:
            raise ValueError("empty master table")
        k2_achieved = k0 + nbands * dk
        k2_diff = k2 - k2_achieved
        vdk = [dk] * nbands
        if k2_diff < 0:
            incr, k = 1, 0
        else:
            incr, k = -1, nbands - 1
        while k2_diff != 0:
            vdk[k] -= incr
            k += incr
            k2_diff += incr
        out = [k0]
        for d in vdk:
            out.append(out[-1] + d)
        return out

    bands = {1: 12, 2: 10, 3: 8}[bs_freq_scale]
    if k2 / k0 > 2.2449:
        two_regions, k1 = True, 2 * k0
    else:
        two_regions, k1 = False, k2
    nbands0 = 2 * _round(bands * math.log2(k1 / k0) / 2.0)
    if nbands0 <= 0:
        raise ValueError("empty master table")
    q = (k1 / k0) ** (1.0 / nbands0)
    vdk0 = sorted(
        _round(k0 * q ** (i + 1)) - _round(k0 * q ** i)
        for i in range(nbands0)
    )
    if vdk0[0] <= 0:
        raise ValueError("non-monotonic master table")
    vk0 = [k0]
    for d in vdk0:
        vk0.append(vk0[-1] + d)
    if not two_regions:
        return vk0
    warp = 1.3 if bs_alter_scale else 1.0
    nbands1 = 2 * _round(bands * math.log2(k2 / k1) / (2.0 * warp))
    if nbands1 > 0:
        q = (k2 / k1) ** (1.0 / nbands1)
        vdk1 = sorted(
            _round(k1 * q ** (i + 1)) - _round(k1 * q ** i)
            for i in range(nbands1)
        )
        if vdk1[0] < vdk0[-1]:
            change = vdk0[-1] - vdk1[0]
            change = min(change, (vdk1[-1] - vdk1[0]) // 2)
            vdk1[0] += change
            vdk1[-1] -= change
            vdk1.sort()
        vk1 = [k1]
        for d in vdk1:
            vk1.append(vk1[-1] + d)
        return vk0 + vk1[1:]
    return vk0


@dataclass
class FreqTables:
    """All derived band tables for one header (§4.6.18.3.2.2-3)."""
    master: list[int]
    high: list[int]          # fTableHigh, len n_high + 1
    low: list[int]           # fTableLow, len n_low + 1
    noise: list[int]         # fTableNoise, len n_q + 1
    lim: list[int]           # fTableLim (kx-relative), len n_l + 1
    kx: int
    m: int                   # number of SBR bands (k2 - kx... strictly
                             # fTableHigh[-1] - kx)
    n_high: int
    n_low: int
    n_q: int
    n_l: int
    patch_num_subbands: list[int] = field(default_factory=list)
    patch_start_subband: list[int] = field(default_factory=list)

    def env_bands(self, freq_res: int) -> int:
        return self.n_high if freq_res else self.n_low

    def env_table(self, freq_res: int) -> list[int]:
        return self.high if freq_res else self.low


def derive_tables(fs_sbr: int, bs_start_freq: int, bs_stop_freq: int,
                  bs_xover_band: int, bs_freq_scale: int = 2,
                  bs_alter_scale: int = 1, bs_noise_bands: int = 2,
                  bs_limiter_bands: int = 2) -> FreqTables:
    k0 = start_band(fs_sbr, bs_start_freq)
    k2 = stop_band(fs_sbr, bs_stop_freq, k0)
    if k2 - k0 > max_sbr_range(fs_sbr):
        raise ValueError(f"SBR range {k2 - k0} over limit")
    master = master_table(k0, k2, bs_freq_scale, bs_alter_scale)
    n_master = len(master) - 1
    if bs_xover_band >= n_master:
        raise ValueError("bs_xover_band out of range")
    high = master[bs_xover_band:]
    n_high = len(high) - 1
    n_low = n_high - n_high // 2
    # fTableLow: first border, then every second border of fTableHigh
    # counted from the top (§4.6.18.3.2.2)
    low = [high[0]] + [high[2 * i - (n_high & 1)]
                       for i in range(1, n_low + 1)]
    kx = high[0]
    m = high[-1] - kx
    if kx > 32 or kx + m > 64:
        raise ValueError("SBR band range out of QMF space")
    n_q = max(1, _round(bs_noise_bands * math.log2(k2 / kx)))
    n_q = min(5, n_q)
    noise = [low[0]]
    k = 0
    for i in range(1, n_q + 1):
        k += (n_low - k) // (n_q + 1 - i)
        noise.append(low[k])
    pn, ps = _derive_patches(master, k0, kx, m, fs_sbr)
    lim = _limiter_table(low, pn, kx, m, bs_limiter_bands)
    return FreqTables(master=master, high=high, low=low, noise=noise,
                      lim=lim, kx=kx, m=m, n_high=n_high, n_low=n_low,
                      n_q=n_q, n_l=len(lim) - 1,
                      patch_num_subbands=pn, patch_start_subband=ps)


def _derive_patches(master: list[int], k0: int, kx: int, m: int,
                    fs_sbr: int) -> tuple[list[int], list[int]]:
    """Patch construction (§4.6.18.6.3)."""
    n_master = len(master) - 1
    goal_sb = _round(2.048e6 / fs_sbr)
    if goal_sb < kx + m:
        k = 0
        for i in range(n_master + 1):
            if master[i] < goal_sb:
                k = i + 1
    else:
        k = n_master
    msb, usb = k0, kx
    pn: list[int] = []
    ps: list[int] = []
    sb = kx + m
    while True:
        j = k + 1
        while True:
            j -= 1
            sb = master[j]
            odd = (sb - 2 + k0) % 2
            if sb <= k0 - 1 + msb - odd:
                break
        n_sub = max(sb - usb, 0)
        start = k0 - odd - n_sub
        if n_sub > 0:
            pn.append(n_sub)
            ps.append(start)
            usb = sb
            msb = sb
        else:
            msb = kx
        if master[k] - sb < 3:
            k = n_master
        if sb == kx + m:
            break
        if len(pn) > 6:
            raise ValueError("too many patches")
    if pn and pn[-1] < 3 and len(pn) > 1:
        pn.pop()
        ps.pop()
    return pn, ps


def _limiter_table(low: list[int], patch_num_subbands: list[int],
                   kx: int, m: int, bs_limiter_bands: int) -> list[int]:
    """fTableLim, kx-relative borders (§4.6.18.3.2.3)."""
    if bs_limiter_bands == 0:
        return [0, m]
    lim_bands = {1: 1.2, 2: 2.0, 3: 3.0}[bs_limiter_bands]
    # patchBorders = cumulative patchNumSubbands, kx-relative
    patch_borders = [0]
    for n in patch_num_subbands:
        patch_borders.append(patch_borders[-1] + n)
    table = sorted(set([b - kx for b in low] + patch_borders))
    table = [b for b in table if 0 <= b <= m]
    i = 0
    while i < len(table) - 1:
        lo, hi = table[i], table[i + 1]
        n_octaves = math.log2((hi + kx) / (lo + kx))
        if n_octaves * lim_bands < 0.49:
            if lo == hi:
                table.pop(i + 1)
                continue
            if hi in patch_borders and lo in patch_borders:
                i += 1
            elif hi in patch_borders:
                table.pop(i)
            else:
                table.pop(i + 1)
        else:
            i += 1
    return table


# ---------------------------------------------------------------------------
# sbr_data bit writer


@dataclass
class SbrHeader:
    amp_res: int = 1                 # 1 = 3.0 dB, 0 = 1.5 dB
    start_freq: int = 5
    stop_freq: int = 5
    xover_band: int = 0
    freq_scale: int = 2
    alter_scale: int = 1
    noise_bands: int = 2
    limiter_bands: int = 2
    limiter_gains: int = 2
    interpol_freq: int = 1
    smoothing_mode: int = 1          # 1 = no gain smoothing
    force_extra1: bool = False       # write extra fields even when
    force_extra2: bool = False       # they hold the defaults (+5/+6
                                     # bit alignment shifters for the
                                     # consumed-bits oracle)

    def defaults_extra1(self) -> bool:
        return (not self.force_extra1
                and self.freq_scale == 2 and self.alter_scale == 1
                and self.noise_bands == 2)

    def defaults_extra2(self) -> bool:
        return (not self.force_extra2
                and self.limiter_bands == 2 and self.limiter_gains == 2
                and self.interpol_freq == 1 and self.smoothing_mode == 1)

    def write(self, w: BitWriter):
        w.put(self.amp_res, 1)
        w.put(self.start_freq, 4)
        w.put(self.stop_freq, 4)
        w.put(self.xover_band, 3)
        w.put(0, 2)                  # bs_reserved
        e1 = not self.defaults_extra1()
        e2 = not self.defaults_extra2()
        w.put(int(e1), 1)
        w.put(int(e2), 1)
        if e1:
            w.put(self.freq_scale, 2)
            w.put(self.alter_scale, 1)
            w.put(self.noise_bands, 2)
        if e2:
            w.put(self.limiter_bands, 2)
            w.put(self.limiter_gains, 2)
            w.put(self.interpol_freq, 1)
            w.put(self.smoothing_mode, 1)

    def tables(self, fs_sbr: int) -> FreqTables:
        return derive_tables(fs_sbr, self.start_freq, self.stop_freq,
                             self.xover_band, self.freq_scale,
                             self.alter_scale, self.noise_bands,
                             self.limiter_bands)


def _ceil_log2(x: int) -> int:
    return max(0, (x - 1).bit_length())


@dataclass
class SbrChannel:
    """sbr_grid/dtdf/invf/envelope/noise for one channel.

    env_sf[l][k] holds the RAW scalefactors to transmit for envelope l
    (first value start-coded, the rest Huffman freq-deltas via the
    `huff_env` codebook dict {delta: bits}).  With single-band grids
    no Huffman dict is ever consulted.  df_env[l]=1 codes envelope l
    as time-deltas (all values Huffman via the t tables).
    """
    frame_class: int = FIXFIX
    num_env: int = 1                 # FIXFIX: 1/2/4
    freq_res: list = field(default_factory=lambda: [0])
    pointer: int = 0
    var_bord_0: int = 0
    var_bord_1: int = 0
    rel_bord_0: list = field(default_factory=list)
    rel_bord_1: list = field(default_factory=list)
    df_env: list = field(default_factory=lambda: [0])
    df_noise: list = field(default_factory=lambda: [0])
    invf: list = field(default_factory=lambda: [0])
    env_sf: list = field(default_factory=lambda: [[40]])
    noise_sf: list = field(default_factory=lambda: [[30]])
    add_harmonic: list = field(default_factory=list)

    def n_noise_env(self) -> int:
        return 1 if self.num_env == 1 else 2

    def write_grid(self, w: BitWriter):
        w.put(self.frame_class, 2)
        if self.frame_class == FIXFIX:
            raw = {1: 0, 2: 1, 4: 2}[self.num_env]
            w.put(raw, 2)
            w.put(self.freq_res[0], 1)
        elif self.frame_class == FIXVAR:
            w.put(self.var_bord_1, 2)
            w.put(len(self.rel_bord_1), 2)
            for r in self.rel_bord_1:
                assert r in (2, 4, 6, 8), r
                w.put((r - 2) // 2, 2)
            w.put(self.pointer, _ceil_log2(self.num_env + 1))
            for l in range(self.num_env):
                w.put(self.freq_res[self.num_env - 1 - l], 1)
        elif self.frame_class == VARFIX:
            w.put(self.var_bord_0, 2)
            w.put(len(self.rel_bord_0), 2)
            for r in self.rel_bord_0:
                w.put((r - 2) // 2, 2)
            w.put(self.pointer, _ceil_log2(self.num_env + 1))
            for l in range(self.num_env):
                w.put(self.freq_res[l], 1)
        else:
            w.put(self.var_bord_0, 2)
            w.put(self.var_bord_1, 2)
            w.put(len(self.rel_bord_0), 2)
            w.put(len(self.rel_bord_1), 2)
            for r in self.rel_bord_0:
                w.put((r - 2) // 2, 2)
            for r in self.rel_bord_1:
                w.put((r - 2) // 2, 2)
            w.put(self.pointer, _ceil_log2(self.num_env + 1))
            for l in range(self.num_env):
                w.put(self.freq_res[l], 1)

    def write_dtdf(self, w: BitWriter):
        assert len(self.df_env) == self.num_env
        assert len(self.df_noise) == self.n_noise_env()
        for d in self.df_env:
            w.put(d, 1)
        for d in self.df_noise:
            w.put(d, 1)

    def write_invf(self, w: BitWriter, n_q: int):
        assert len(self.invf) == n_q, (self.invf, n_q)
        for v in self.invf:
            w.put(v, 2)

    def write_envelope(self, w: BitWriter, ft: FreqTables, amp_res: int,
                       balance: bool, huff_env_f=None, huff_env_t=None):
        amp = self.amp_res_used(amp_res)
        start_bits = (5 if amp else 6) if balance else (6 if amp else 7)
        for l in range(self.num_env):
            vals = self.env_sf[l]
            n = ft.env_bands(self.freq_res[l])
            assert len(vals) == n, (len(vals), n, "env bands")
            if self.df_env[l] == 0:
                w.put(vals[0], start_bits)
                for k in range(1, n):
                    delta = vals[k] - vals[k - 1]
                    w.raw(huff_env_f[delta])
            else:
                for k in range(n):
                    w.raw(huff_env_t[vals[k]])  # vals are deltas here

    def write_noise(self, w: BitWriter, ft: FreqTables, balance: bool,
                    huff_noise_f=None, huff_noise_t=None):
        for l in range(self.n_noise_env()):
            vals = self.noise_sf[l]
            assert len(vals) == ft.n_q, (len(vals), ft.n_q, "noise bands")
            if self.df_noise[l] == 0:
                w.put(vals[0], 5)
                for k in range(1, ft.n_q):
                    w.raw(huff_noise_f[vals[k] - vals[k - 1]])
            else:
                for k in range(ft.n_q):
                    w.raw(huff_noise_t[vals[k]])

    def write_add_harmonic(self, w: BitWriter, ft: FreqTables):
        if self.add_harmonic:
            assert len(self.add_harmonic) == ft.n_high
            w.put(1, 1)
            for b in self.add_harmonic:
                w.put(b, 1)
        else:
            w.put(0, 1)

    def amp_res_used(self, header_amp_res: int) -> int:
        if self.frame_class == FIXFIX and self.num_env == 1:
            return 0
        return header_amp_res


@dataclass
class SbrData:
    """One sbr_extension_data payload (SCE or CPE)."""
    header: SbrHeader
    channels: list              # [SbrChannel] or [SbrChannel, SbrChannel]
    fs_sbr: int = 44100
    send_header: bool = True
    coupling: bool = False
    data_extra: bool = False         # +4 reserved bits (alignment)
    huff: dict = field(default_factory=dict)  # codebook name -> {val: bits}

    def write(self, w: BitWriter):
        ft = self.header.tables(self.fs_sbr)
        w.put(int(self.send_header), 1)
        if self.send_header:
            self.header.write(w)
        hf = self.huff
        if len(self.channels) == 1:
            (c,) = self.channels
            if self.data_extra:
                w.put(1, 1)
                w.put(0, 4)          # bs_reserved
            else:
                w.put(0, 1)          # bs_data_extra
            c.write_grid(w)
            c.write_dtdf(w)
            c.write_invf(w, ft.n_q)
            c.write_envelope(w, ft, self.header.amp_res, False,
                             hf.get("f_env"), hf.get("t_env"))
            c.write_noise(w, ft, False,
                          hf.get("f_noise"), hf.get("t_noise"))
            c.write_add_harmonic(w, ft)
            w.put(0, 1)              # bs_extended_data
        else:
            c0, c1 = self.channels
            w.put(0, 1)              # bs_data_extra
            w.put(int(self.coupling), 1)
            if self.coupling:
                c0.write_grid(w)
                c0.write_dtdf(w)
                c1.write_dtdf(w)
                c0.write_invf(w, ft.n_q)
                c0.write_envelope(w, ft, self.header.amp_res, False,
                                  hf.get("f_env"), hf.get("t_env"))
                c0.write_noise(w, ft, False,
                               hf.get("f_noise"), hf.get("t_noise"))
                c1.write_envelope(w, ft, self.header.amp_res, True,
                                  hf.get("f_env_bal"), hf.get("t_env_bal"))
                c1.write_noise(w, ft, True,
                               hf.get("f_noise_bal"), hf.get("t_noise_bal"))
            else:
                c0.write_grid(w)
                c1.write_grid(w)
                c0.write_dtdf(w)
                c1.write_dtdf(w)
                c0.write_invf(w, ft.n_q)
                c1.write_invf(w, ft.n_q)
                c0.write_envelope(w, ft, self.header.amp_res, False,
                                  hf.get("f_env"), hf.get("t_env"))
                c1.write_envelope(w, ft, self.header.amp_res, False,
                                  hf.get("f_env"), hf.get("t_env"))
                c0.write_noise(w, ft, False,
                               hf.get("f_noise"), hf.get("t_noise"))
                c1.write_noise(w, ft, False,
                               hf.get("f_noise"), hf.get("t_noise"))
            c0.write_add_harmonic(w, ft)
            c1.write_add_harmonic(w, ft)
            w.put(0, 1)              # bs_extended_data


@dataclass
class Fil:
    """fill_element carrying one extension_payload (§4.4.2.7).

    count_override shrinks/grows the advertised byte count (payload
    truncated or zero-extended to fit) — the extraction rig uses this
    to measure exactly how many bits the oracle consumes."""
    payload_bits: str = ""
    extension_type: int = EXT_SBR_DATA
    count_override: int | None = None

    def write(self, w: BitWriter):
        # extension_payload: 4 type bits + payload, zero-padded to the
        # byte count in the FIL header
        nbits = 4 + len(self.payload_bits)
        count = (nbits + 7) // 8
        if self.count_override is not None:
            count = self.count_override
        payload = self.payload_bits[:count * 8 - 4]
        w.put(6, 3)                  # id_syn_ele = FIL
        if count >= 15:
            w.put(15, 4)
            w.put(count - 15 + 1, 8)
        else:
            w.put(count, 4)
        w.put(self.extension_type, 4)
        w.raw(payload)
        w.raw("0" * (count * 8 - 4 - len(payload)))


def sbr_fil(sbr: SbrData) -> Fil:
    w = BitWriter()
    sbr.write(w)
    return Fil(payload_bits="".join(w.bits))


if __name__ == "__main__":
    ft = derive_tables(44100, 5, 5, 0)
    print("master:", ft.master)
    print("high:", ft.high)
    print("low:", ft.low)
    print("noise:", ft.noise)
    print("lim:", ft.lim)
    print("patches:", ft.patch_num_subbands, ft.patch_start_subband)

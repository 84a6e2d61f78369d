"""Reference SBR (HE-AAC) decoder in numpy — the development oracle
for the native C implementation in native/aacdec.c.

Implements ISO/IEC 14496-3 §4.6.18: 32-band complex QMF analysis of
the AAC-LC core, HF generation (chirped 2nd-order LPC patches), HF
adjustment (envelope/noise-floor gains, limiter, sinusoid addition)
and 64-band QMF synthesis. Parameters come straight from the
scripts/sbr_bitstream.py dataclasses (the minting rig), so this module
needs no bitstream parser; phase conventions, buffering offsets and
dequantization constants are pinned BEHAVIORALLY against the system
libav decoder on crafted streams (tests/test_sbr.py) — wherever the
spec leaves a convention ambiguous in our reading, the oracle decides.

The reference project decodes HE-AAC through librosa -> audioread ->
ffmpeg (reference inference.py:136-138); this chain is what lets the
native ingest close that gap without external backends.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

import sbr_bitstream as sb

_HERE = os.path.dirname(os.path.abspath(__file__))

RATE = 2                  # QMF subsamples per core time slot
SLOTS = 16                # core time slots per frame
SUB = SLOTS * RATE        # 32 QMF subsamples per frame
T_HFGEN = 8               # history subsamples kept for LPC/patching
T_HFADJ = 6               # content delay vs the envelope timeline

_QMF_WIN = None
_NOISE = None


def tables():
    global _QMF_WIN, _NOISE
    if _QMF_WIN is None:
        _QMF_WIN = np.load(os.path.join(_HERE, "sbr_qmf_window.npy"))
        _NOISE = np.load(os.path.join(_HERE, "sbr_noise_table.npy"))
    return _QMF_WIN, _NOISE


class QmfAnalysis:
    """32-band complex analysis bank (§4.6.18.4.1, downsampled).

    Convention (window decimation phase, modulation offset, input
    reversal, x2 scale) pinned by round-trip + oracle match: with the
    signed prototype's odd taps and X[k] = 2 sum_n u[n]
    exp(i pi/32 (k+0.5)(n-0.25)) the analysis+synthesis chain
    reconstructs at ~71 dB, matches libav's low-band passthrough at
    unity gain AND matches its HF patching phases (the per-band phase
    split between analysis and synthesis is pinned by the invf=0
    copy-patch comparison, which a passthrough test cannot see).
    """

    def __init__(self, win: np.ndarray):
        self.win = win[1::2].astype(np.float64)         # 320 taps
        self.x = np.zeros(320)
        n = np.arange(64)
        k = np.arange(32)[:, None]
        self.mod = 2.0 * np.exp(1j * np.pi / 32.0 * (k + 0.5)
                                * (n - 0.25))

    def process(self, pcm: np.ndarray) -> np.ndarray:
        """pcm: multiple of 32 samples -> (slots, 32) complex."""
        ns = len(pcm) // 32
        out = np.empty((ns, 32), complex)
        for s in range(ns):
            self.x[32:] = self.x[:-32]
            self.x[:32] = pcm[s * 32:(s + 1) * 32][::-1]
            z = self.x * self.win
            u = z.reshape(5, 64).sum(axis=0)
            out[s] = self.mod @ u
        return out


class QmfSynthesis:
    """64-band complex -> real synthesis bank (§4.6.18.4.2)."""

    def __init__(self, win: np.ndarray):
        self.win = win.astype(np.float64)               # 640 signed taps
        self.v = np.zeros(1280)
        n = np.arange(128)[:, None]
        k = np.arange(64)
        self.mod = np.exp(1j * np.pi / 128.0 * (k + 0.5) * (2 * n - 253))

    def process(self, X: np.ndarray) -> np.ndarray:
        """X: (slots, 64) complex -> slots*64 real samples."""
        ns = X.shape[0]
        out = np.empty(ns * 64)
        for s in range(ns):
            self.v[128:] = self.v[:-128]
            self.v[:128] = (self.mod @ X[s]).real / 64.0
            # gather with window
            acc = np.zeros(64)
            for a in range(5):
                acc += (self.v[256 * a:256 * a + 64]
                        * self.win[128 * a:128 * a + 64])
                acc += (self.v[256 * a + 192:256 * a + 256]
                        * self.win[128 * a + 64:128 * a + 128])
            out[s * 64:(s + 1) * 64] = acc
        return out


# ---------------------------------------------------------------------------
# Frame-class time grids


def env_time_borders(ch: sb.SbrChannel) -> list[int]:
    """tE in core time slots (§4.6.18.3.3)."""
    fc = ch.frame_class
    n = ch.num_env
    if fc == sb.FIXFIX:
        return [int(round(SLOTS * l / n)) for l in range(n + 1)]
    if fc == sb.FIXVAR:
        end = SLOTS + ch.var_bord_1
        borders = [end]
        for r in ch.rel_bord_1:
            borders.append(borders[-1] - r)
        borders.append(0)
        return borders[::-1]
    if fc == sb.VARFIX:
        borders = [ch.var_bord_0]
        for r in ch.rel_bord_0:
            borders.append(borders[-1] + r)
        borders.append(SLOTS)
        return borders
    # VARVAR
    borders = [ch.var_bord_0]
    for r in ch.rel_bord_0:
        borders.append(borders[-1] + r)
    end = SLOTS + ch.var_bord_1
    tail = [end]
    for r in ch.rel_bord_1:
        tail.append(tail[-1] - r)
    return borders + tail[::-1]


def l_a(ch: sb.SbrChannel) -> int:
    """Transient envelope index (-1 = none)."""
    fc, p = ch.frame_class, ch.pointer
    if fc == sb.FIXFIX:
        return -1
    if fc == sb.VARFIX:
        return p - 1 if p > 1 else -1
    return ch.num_env + 1 - p if p > 0 else -1


def middle_border(ch: sb.SbrChannel) -> int:
    fc, p = ch.frame_class, ch.pointer
    if fc == sb.FIXFIX:
        return ch.num_env // 2
    if fc == sb.VARFIX:
        if p == 0:
            return 1
        if p == 1:
            return ch.num_env - 1
        return p - 1
    if p > 1:
        return ch.num_env + 1 - p
    return ch.num_env - 1


def noise_time_borders(ch: sb.SbrChannel, te: list[int]) -> list[int]:
    if ch.num_env == 1:
        return [te[0], te[-1]]
    return [te[0], te[middle_border(ch)], te[-1]]


# ---------------------------------------------------------------------------
# Dequantization (§4.6.18.7.1); absolute scale pinned vs oracle.

ENV_EXP_OFFSET = 6        # E_orig = 2^(sf/a + 6), spec energy units
NOISE_FLOOR_OFFSET = 6    # Q_orig = 2^(6 - q), dimensionless ratio
E2 = 30.0                 # our-units -> spec-units energy exponent:
                          # E_curr_spec = E_curr_ours * 2^E2; pinned
                          # against the oracle's absolute HF level
BOOST_MAX = 1.584893192
LIM_GAIN = [0.70795, 1.0, 1.41254, 1e10]
EPS = 1e-12


@dataclass
class ChannelState:
    """Cross-frame SBR state for one channel."""
    x_hist: np.ndarray = None          # (T_HFGEN, 32) analysis tail
    bw: np.ndarray = None              # chirp per noise band (Nq,)
    f_index_noise: int = 0
    f_index_sine: int = 0
    g_prev: np.ndarray = None          # last envelope's gains (M,)
    q_prev: np.ndarray = None
    s_prev: np.ndarray = None          # sine presence per band (n_high,)
    env_prev: np.ndarray = None        # last envelope sf vector
    noise_prev: np.ndarray = None
    freq_res_prev: int = 1
    la_prev: int = -1


class SbrDecoder:
    """Stateful per-channel SBR chain: feed core PCM frames (1024
    samples) + SbrChannel params, get 2048 upsampled samples."""

    def __init__(self, header: sb.SbrHeader, fs_sbr: int):
        win, noise = tables()
        self.win = win
        self.noise_tab = noise[:, 0] + 1j * noise[:, 1]
        self.header = header
        self.ft = header.tables(fs_sbr)
        self.qa = QmfAnalysis(win)
        self.qs = QmfSynthesis(win)
        self.st = ChannelState(
            x_hist=np.zeros((T_HFGEN, 32), complex),
            bw=np.zeros(self.ft.n_q),
            g_prev=np.ones(self.ft.m),
            q_prev=np.zeros(self.ft.m),
            s_prev=np.zeros(self.ft.n_high, int),
        )

    # -- HF generation -----------------------------------------------

    def _chirp(self, ch: sb.SbrChannel) -> np.ndarray:
        new = np.array([(0.0, 0.75, 0.9, 0.98)[v] for v in ch.invf])
        prev = self.st.bw
        bw = np.where(new < prev, 0.75 * new + 0.25 * prev,
                      0.90625 * new + 0.09375 * prev)
        bw = np.where(bw < 0.015625, 0.0, bw)
        self.st.bw = bw
        return bw

    def _lpc(self, x: np.ndarray, p: int):
        """2nd-order complex covariance LPC over subsamples of band p.
        x: (T_HFGEN + SUB, 32); the covariance window spans the WHOLE
        buffer (history + current frame, 38 products) — pinned against
        the oracle (window placement changes SNR 22 -> 63 dB)."""
        seg = x[:, p]
        x0 = seg[2:]
        x1 = seg[1:-1]
        x2 = seg[:-2]
        p01 = (x0 * x1.conj()).sum()
        p02 = (x0 * x2.conj()).sum()
        p11 = (x1 * x1.conj()).sum().real
        p12 = (x1 * x2.conj()).sum()
        p22 = (x2 * x2.conj()).sum().real
        d = p11 * p22 - (abs(p12) ** 2) / 1.000001
        a1 = (p01 * p12 - p02 * p11) / d if d != 0 else 0.0
        a0 = -(p01 + a1 * p12.conj()) / p11 if p11 != 0 else 0.0
        if abs(a0) >= 4 or abs(a1) >= 4:
            return 0.0, 0.0
        return a0, a1

    def _hf_generate(self, x: np.ndarray, bw: np.ndarray) -> np.ndarray:
        """x: (T_HFGEN + SUB, 32) low QMF buffer (8 history + 32
        current); returns (SUB, 64) high content for buffer slots
        [T_HFGEN - T_HFADJ, T_HFGEN - T_HFADJ + SUB) — the 6-slot
        content delay window — patched with the CURRENT frame's
        alphas/bw (pinned vs oracle: chirped modes regressed to ~21 dB
        when the delayed slots kept the previous frame's alphas)."""
        ft = self.ft
        xh = np.zeros((T_HFGEN + SUB, 64), complex)
        # noise band of each QMF band m (absolute index kx+m)
        def noise_band(k):
            for q in range(ft.n_q):
                if ft.noise[q] <= k < ft.noise[q + 1]:
                    return q
            return ft.n_q - 1
        k = ft.kx
        for n_sub, start in zip(ft.patch_num_subbands,
                                ft.patch_start_subband):
            for i in range(n_sub):
                p = start + i
                q = noise_band(k)
                b = bw[q]
                a0, a1 = self._lpc(x, p) if b > 0 else (0.0, 0.0)
                t = np.arange(T_HFGEN - T_HFADJ, T_HFGEN - T_HFADJ + SUB)
                xh[t, k] = (x[t, p] + b * a0 * x[t - 1, p]
                            + b * b * a1 * x[t - 2, p])
                k += 1
        # a final patch shorter than 3 subbands is dropped by the
        # patch builder; the uncovered top bands stay zero and are
        # carried by the noise floor alone (pinned vs oracle on the
        # start_freq=8 grid where kx=17, m=17, patches=[15])
        if k > ft.kx + ft.m:
            raise AssertionError((k, ft.kx, ft.m))
        return xh[T_HFGEN - T_HFADJ:T_HFGEN - T_HFADJ + SUB]

    # -- HF adjustment -----------------------------------------------

    def _dequant_env(self, ch: sb.SbrChannel) -> list[np.ndarray]:
        amp = ch.amp_res_used(self.header.amp_res)
        a = 1.0 if amp else 2.0
        return [np.exp2(np.asarray(e, float) / a + ENV_EXP_OFFSET)
                for e in ch.env_sf]

    def _dequant_noise(self, ch: sb.SbrChannel) -> list[np.ndarray]:
        return [np.exp2(NOISE_FLOOR_OFFSET - np.asarray(q, float))
                for q in ch.noise_sf]

    def _adjust(self, xh: np.ndarray, ch: sb.SbrChannel) -> np.ndarray:
        """xh: (SUB, 64) raw HF; returns (SUB, 64) adjusted Y."""
        ft = self.ft
        hdr = self.header
        te = env_time_borders(ch)
        tq = noise_time_borders(ch, te)
        la = l_a(ch)
        e_orig = self._dequant_env(ch)
        q_orig = self._dequant_noise(ch)
        y = xh.copy()
        m_arr = np.arange(ft.m)
        k_arr = ft.kx + m_arr
        # sinusoid index per high band: middle QMF band of each band
        sine_m = [((ft.high[j] + ft.high[j + 1]) // 2) - ft.kx
                  for j in range(ft.n_high)]
        s_index = np.zeros(ft.m)
        new_sines = np.asarray(ch.add_harmonic, int) if ch.add_harmonic \
            else np.zeros(ft.n_high, int)
        for l in range(ch.num_env):
            t0, t1 = te[l] * RATE, te[l + 1] * RATE
            fr = ch.freq_res[l]
            ftab = ft.env_table(fr)
            nb = ft.env_bands(fr)
            # map envelope values onto QMF bands
            e_map = np.empty(ft.m)
            for j in range(nb):
                lo, hi = ftab[j] - ft.kx, ftab[j + 1] - ft.kx
                e_map[lo:hi] = e_orig[l][j]
            # noise env containing l
            nl = 0
            while nl + 1 < len(tq) - 1 and te[l] >= tq[nl + 1]:
                nl += 1
            q_map = np.empty(ft.m)
            for j in range(ft.n_q):
                lo = ft.noise[j] - ft.kx
                hi = ft.noise[j + 1] - ft.kx
                q_map[lo:hi] = q_orig[nl][j]
            # sinusoid mapping: sine starts at l >= la or persists
            s_idx_m = np.zeros(ft.m)
            s_map = np.zeros(ft.m)
            for j in range(ft.n_high):
                present = (new_sines[j]
                           and (l >= (la if la >= 0 else 0)
                                or self.st.s_prev[j]))
                if present:
                    s_idx_m[sine_m[j]] = 1.0
                    # s_mapped: every band of the envelope band that
                    # contains the sine
                    for jj in range(nb):
                        lo, hi = ftab[jj] - ft.kx, ftab[jj + 1] - ft.kx
                        if lo <= sine_m[j] < hi:
                            s_map[lo:hi] = 1.0
            # current HF energy, converted to spec units
            if hdr.interpol_freq:
                e_curr = (np.abs(xh[t0:t1, k_arr]) ** 2).mean(axis=0)
            else:
                e_curr = np.empty(ft.m)
                for j in range(nb):
                    lo, hi = ftab[j] - ft.kx, ftab[j + 1] - ft.kx
                    e_curr[lo:hi] = (np.abs(xh[t0:t1, ft.kx + lo:
                                                ft.kx + hi]) ** 2).mean()
            e_curr = e_curr * (2.0 ** E2)
            delta = 0.0 if (l == la or l == self.st.la_prev) else 1.0
            s_m = np.sqrt(e_map * s_idx_m / (1.0 + q_map))
            q_m = np.sqrt(e_map * q_map / (1.0 + q_map))
            gain = np.where(
                s_map == 0,
                np.sqrt(e_map / ((1.0 + e_curr)
                                 * (1.0 + q_map * delta))),
                np.sqrt(e_map * q_map
                        / ((1.0 + e_curr) * (1.0 + q_map))),
            )
            # limiter
            for i in range(ft.n_l):
                lo, hi = ft.lim[i], ft.lim[i + 1]
                if hi <= lo:
                    continue
                g_max = (LIM_GAIN[hdr.limiter_gains]
                         * np.sqrt((EPS + e_map[lo:hi].sum())
                                   / (EPS + e_curr[lo:hi].sum())))
                g_max = min(g_max, 1e10)
                seg = slice(lo, hi)
                over = gain[seg] > g_max
                q_m[seg] = np.where(over, q_m[seg] * g_max
                                    / np.maximum(gain[seg], EPS),
                                    q_m[seg])
                gain[seg] = np.minimum(gain[seg], g_max)
                # boost
                num = EPS + e_map[seg].sum()
                den = (EPS
                       + (e_curr[seg] * gain[seg] ** 2).sum()
                       + (s_m[seg] ** 2).sum()
                       + delta * (q_m[seg] ** 2
                                  * (s_idx_m[seg] == 0)).sum())
                boost = min(np.sqrt(num / den), BOOST_MAX)
                gain[seg] *= boost
                q_m[seg] *= boost
                s_m[seg] *= boost
            # q_m / s_m are spec-unit amplitudes; bring them into our
            # QMF units (gains themselves are our->spec dimensionless)
            q_m = q_m * 2.0 ** (-E2 / 2.0)
            s_m = s_m * 2.0 ** (-E2 / 2.0)
            # assemble
            for t in range(t0, t1):
                y[t, k_arr] = xh[t, k_arr] * gain
                idx = self.st.f_index_noise
                for mi in range(ft.m):
                    idx = (idx + 1) & 511
                    if s_idx_m[mi] == 0 and (delta == 1.0
                                             or s_map[mi] == 0):
                        y[t, ft.kx + mi] += q_m[mi] * self.noise_tab[idx]
                self.st.f_index_noise = idx
                if s_idx_m.any():
                    phase = 1j ** (self.st.f_index_sine & 3)
                    for mi in range(ft.m):
                        if s_idx_m[mi]:
                            v = s_m[mi] * phase
                            if (ft.kx + mi) & 1:
                                v = v.real - 1j * v.imag \
                                    if False else v
                            y[t, ft.kx + mi] += v
                self.st.f_index_sine = (self.st.f_index_sine + 1) & 3
        self.st.s_prev = new_sines
        self.st.la_prev = la
        return y

    # -- frame -------------------------------------------------------

    def frame(self, core_pcm: np.ndarray, ch: sb.SbrChannel) -> np.ndarray:
        """core_pcm: 1024 samples -> 2048 upsampled samples.

        The CONTENT pipeline (analysis output and the HF patched from
        it) runs T_HFADJ = 6 slots behind the envelope/noise/synthesis
        timeline — pinned against the oracle: a content-only alignment
        probe lands at -384 samples while envelope-burst and pure-noise
        probes land at 0 (a frame-periodic fixture hides this, which is
        why sbr_dev_check mints per-frame-varying spectra)."""
        assert len(core_pcm) == 1024
        xa = self.qa.process(core_pcm)              # (32, 32)
        x = np.concatenate([self.st.x_hist, xa])    # (40, 32)
        self.st.x_hist = xa[-T_HFGEN:].copy()
        bw = self._chirp(ch)
        xh = self._hf_generate(x, bw)               # (32, 64), delayed
        y = self._adjust(xh, ch)
        # synthesis input: low bands passthrough below kx (same 6-slot
        # content delay), adjusted HF above
        Xs = np.zeros((SUB, 64), complex)
        Xs[:, :self.ft.kx] = x[T_HFGEN - T_HFADJ:
                               T_HFGEN - T_HFADJ + SUB, :self.ft.kx]
        Xs[:, self.ft.kx:] = y[:, self.ft.kx:]
        return self.qs.process(Xs)


if __name__ == "__main__":
    win, noise = tables()
    qa = QmfAnalysis(win)
    qs = QmfSynthesis(win)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096) * 0.1
    X = qa.process(x)
    Xup = np.zeros((X.shape[0], 64), complex)
    Xup[:, :32] = X
    y = qs.process(Xup)
    print("round trip shapes", X.shape, y.shape)

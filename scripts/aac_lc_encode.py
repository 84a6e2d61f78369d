"""Minimal AAC-LC encoder on top of scripts/aac_bitstream.py.

Produces real decodable core content (sign-coded +-1 spectra via
codebook 1, per-band scalefactor shaping) for the SBR rig and tests:
HE-AAC fixtures need a sustained, spectrally controllable core signal
underneath the crafted sbr_data (scripts/sbr_bitstream.py).

Huffman codewords come from the tables baked into native/aacdec.c —
parsed out of the C source at import. Those tables were themselves
oracle-extracted (scripts/aac_extract_tables.py), so nothing here
depends on remembering spec tables.
"""

from __future__ import annotations

import os
import re

import numpy as np

from aac_bitstream import SCE

_HERE = os.path.dirname(os.path.abspath(__file__))
_AACDEC = os.path.join(_HERE, "..", "vocal_remover_tpu", "native",
                       "aacdec.c")


def _parse_array(src: str, name: str) -> list[int]:
    m = re.search(name + r"\[\d+\] = \{(.*?)\};", src, re.S)
    if not m:
        raise RuntimeError(f"array {name} not found in aacdec.c")
    return [int(x, 0) for x in re.findall(r"0x[0-9a-fA-F]+|\d+",
                                          m.group(1))]


def _load_tables():
    with open(_AACDEC) as f:
        src = f.read()
    sf_len = _parse_array(src, "aac_sf_len")
    sf_code = _parse_array(src, "aac_sf_code")
    b1_len = _parse_array(src, "aac_b1_len")
    b1_code = _parse_array(src, "aac_b1_code")
    swb = {}
    # long-window swb borders: aac_swbl_<sr_index>
    sr_tab = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
              16000, 12000, 11025, 8000, 7350]
    for m in re.finditer(r"aac_swbl_(\d+)\[(\d+)\] = \{(.*?)\};",
                         src, re.S):
        swb[sr_tab[int(m.group(1))]] = [int(x) for x in
                                        re.findall(r"\d+", m.group(3))]
    return sf_len, sf_code, b1_len, b1_code, swb


_SF_LEN, _SF_CODE, _B1_LEN, _B1_CODE, _SWB_LONG = _load_tables()


def sf_bits(delta: int) -> str:
    """One scalefactor huffman codeword (delta in [-60, 60])."""
    i = delta + 60
    return format(_SF_CODE[i], f"0{_SF_LEN[i]}b")


def b1_bits(quad) -> str:
    """Codebook-1 codeword for 4 values in {-1, 0, 1}."""
    idx = 0
    for v in quad:
        assert -1 <= v <= 1
        idx = idx * 3 + (v + 1)
    return format(_B1_CODE[idx], f"0{_B1_LEN[idx]}b")


def swb_long(sr: int) -> list[int]:
    """Long-window scalefactor band borders for this sample rate
    (parsed from the oracle-extracted tables in aacdec.c)."""
    if sr not in _SWB_LONG:
        raise RuntimeError(f"no swb table for sr={sr}")
    return _SWB_LONG[sr]


def encode_sce(spec: np.ndarray, sr: int, global_gain: int = 121,
               window_shape: int = 0) -> SCE:
    """Encode a 1024-bin +-1 spectrum as one long-window SCE.

    spec holds values in {-1, 0, 1}; every coded band uses the same
    scalefactor (= global_gain), so the dequantized line amplitude is
    2^((global_gain-100)/4) * 2^-15 in the decoder's float output
    convention. Bands beyond the last nonzero bin are ZERO_HCB.
    """
    borders = swb_long(sr)
    nz = np.nonzero(spec)[0]
    if len(nz) == 0:
        return SCE(sections=[(0, 1)], max_sfb=1)
    last = int(nz[-1])
    max_sfb = next(i for i in range(1, len(borders))
                   if borders[i] > last)
    bits = []
    sfb_bits = []
    for b in range(max_sfb):
        lo, hi = borders[b], borders[b + 1]
        sfb_bits.append(sf_bits(0))
        for q in range(lo, hi, 4):
            quad = [int(v) for v in spec[q:q + 4]]
            quad += [0] * (4 - len(quad))
            bits.append(b1_bits(quad))
    return SCE(global_gain=global_gain, max_sfb=max_sfb,
               window_shape=window_shape,
               sections=[(1, max_sfb)],
               sf_bits="".join(sfb_bits),
               spectral_bits="".join(bits))


def dense_spectrum(sr: int, f_lo: float, f_hi: float, rng=None,
                   density: float = 1.0) -> np.ndarray:
    """A +-1 line spectrum covering [f_lo, f_hi] Hz with random signs —
    broadband 'music-like' core content for SBR fixtures."""
    rng = rng or np.random.default_rng(0)
    spec = np.zeros(1024, np.int8)
    k_lo = max(0, int(round(f_lo * 2048.0 / sr)))
    k_hi = min(1023, int(round(f_hi * 2048.0 / sr)))
    n = k_hi - k_lo + 1
    mask = rng.random(n) < density
    signs = rng.integers(0, 2, n) * 2 - 1
    spec[k_lo:k_hi + 1] = np.where(mask, signs, 0)
    return spec


if __name__ == "__main__":
    import aac_oracle

    spec = dense_spectrum(22050, 200, 5000)
    sce = encode_sce(spec, 22050)
    from aac_bitstream import adts_frame
    data = b"".join(adts_frame([sce], sr=22050) for _ in range(20))
    pcm, sr = aac_oracle.decode_bytes(data, suffix=".aac")
    print("decoded", pcm.shape, sr, "rms", float(np.sqrt((pcm ** 2).mean())))

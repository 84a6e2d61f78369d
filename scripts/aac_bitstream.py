"""Hand-rolled AAC-LC ADTS bitstream writer for decoder probing/tests.

Builds single-SCE (mono) ADTS frames bit by bit so the table-extraction
rig (scripts/aac_extract_tables.py) and the feature tests can place
arbitrary codewords, scalefactors, pulses, window sequences, and TNS
fields — including configurations the libav encoder never emits. Role
mirrors scripts/mp3_bitstream.py for the mp3 decoder.

Layout follows ISO/IEC 14496-3 subpart 4 (adts_frame,
raw_data_block, single_channel_element, individual_channel_stream,
ics_info, section_data, scale_factor_data, pulse_data, tns_data,
spectral_data). Only what probing needs is implemented; everything is
verified against the libav oracle decoder before use.
"""

from __future__ import annotations

from dataclasses import dataclass, field

SF_INDEX = {96000: 0, 88200: 1, 64000: 2, 48000: 3, 44100: 4, 32000: 5,
            24000: 6, 22050: 7, 16000: 8, 12000: 9, 11025: 10, 8000: 11}

ONLY_LONG = 0
LONG_START = 1
EIGHT_SHORT = 2
LONG_STOP = 3

ZERO_HCB = 0
NOISE_HCB = 13
INTENSITY_HCB2 = 14
INTENSITY_HCB = 15


class BitWriter:
    def __init__(self):
        self.bits: list[str] = []

    def put(self, value: int, n: int):
        assert 0 <= value < (1 << n), (value, n)
        self.bits.append(format(value, f"0{n}b"))

    def raw(self, bitstring: str):
        assert set(bitstring) <= {"0", "1"}, bitstring
        self.bits.append(bitstring)

    def tell(self) -> int:
        return sum(len(b) for b in self.bits)

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        s += "0" * (-len(s) % 8)
        return int(s, 2).to_bytes(len(s) // 8, "big") if s else b""


@dataclass
class SCE:
    """One single_channel_element, long or short windows.

    sections: list of (codebook, n_sfb) runs covering max_sfb bands.
    sf_bits: raw scale_factor_data bits (the caller crafts the huffman
      deltas; "" means all-zero-length i.e. every band is ZERO_HCB).
    spectral_bits: raw spectral_data bits (caller-crafted codewords).
    pulses: list of (offset_from_swb0, amp) applied at
      pulse_start_sfb=0; amplitudes add to the quantized values.
    """
    global_gain: int = 100
    window_sequence: int = ONLY_LONG
    window_shape: int = 0
    max_sfb: int = 1
    scale_factor_grouping: int = 0x7F   # short windows: all in one group
    sections: list = field(default_factory=lambda: [(ZERO_HCB, 1)])
    sf_bits: str = ""
    spectral_bits: str = ""
    pulses: list = field(default_factory=list)
    pulse_start_sfb: int = 0
    tns_bits: str = ""                  # raw tns_data payload (after flag)

    def write(self, w: BitWriter):
        w.put(0, 3)                     # id_syn_ele = SCE
        w.put(0, 4)                     # element_instance_tag
        self.write_ics(w, include_info=True)

    def write_info(self, w: BitWriter):
        w.put(0, 1)                     # ics_reserved_bit
        w.put(self.window_sequence, 2)
        w.put(self.window_shape, 1)
        if self.window_sequence == EIGHT_SHORT:
            w.put(self.max_sfb, 4)
            w.put(self.scale_factor_grouping, 7)
        else:
            w.put(self.max_sfb, 6)
            w.put(0, 1)                 # predictor_data_present

    def write_ics(self, w: BitWriter, include_info: bool):
        w.put(self.global_gain, 8)
        if include_info:
            self.write_info(w)
        # section_data
        sect_bits = 3 if self.window_sequence == EIGHT_SHORT else 5
        esc = (1 << sect_bits) - 1
        n_groups = self._num_groups()
        covered = sum(n for _, n in self.sections)
        assert covered == self.max_sfb, (covered, self.max_sfb)
        for _ in range(n_groups):
            for cb, n in self.sections:
                w.put(cb, 4)
                left = n
                while left >= esc:
                    w.put(esc, sect_bits)
                    left -= esc
                w.put(left, sect_bits)
        w.raw(self.sf_bits)
        # pulse_data_present
        if self.pulses:
            assert self.window_sequence != EIGHT_SHORT
            w.put(1, 1)
            w.put(len(self.pulses) - 1, 2)
            w.put(self.pulse_start_sfb, 6)
            for off, amp in self.pulses:
                w.put(off, 5)
                w.put(amp, 4)
        else:
            w.put(0, 1)
        # tns_data_present
        if self.tns_bits:
            w.put(1, 1)
            w.raw(self.tns_bits)
        else:
            w.put(0, 1)
        w.put(0, 1)                     # gain_control_data_present
        w.raw(self.spectral_bits)

    def _num_groups(self) -> int:
        if self.window_sequence != EIGHT_SHORT:
            return 1
        # scale_factor_grouping: 7 bits, 1 = same group as previous
        return 8 - bin(self.scale_factor_grouping).count("1")


@dataclass
class CPE:
    """A channel_pair_element with a common window: the left SCE's
    ics_info is shared; ms_used covers num_groups * max_sfb bands when
    ms_present == 1."""
    left: SCE = None
    right: SCE = None
    ms_present: int = 0
    ms_used: list = field(default_factory=list)

    def write(self, w: BitWriter):
        w.put(1, 3)                     # id_syn_ele = CPE
        w.put(0, 4)                     # element_instance_tag
        w.put(1, 1)                     # common_window
        self.left.write_info(w)
        w.put(self.ms_present, 2)
        if self.ms_present == 1:
            n = self.left._num_groups() * self.left.max_sfb
            assert len(self.ms_used) == n
            for b in self.ms_used:
                w.put(b, 1)
        self.left.write_ics(w, include_info=False)
        self.right.write_ics(w, include_info=False)


def adts_frame(elements: list[SCE], sr: int = 44100,
               channel_config: int = 1) -> bytes:
    """One ADTS frame (MPEG-4 style header, CRC absent) holding the
    given syntactic elements + END."""
    body = BitWriter()
    for el in elements:
        el.write(body)
    body.put(7, 3)                      # id_syn_ele = END
    payload = body.tobytes()
    n = len(payload) + 7
    h = BitWriter()
    h.put(0xFFF, 12)                    # syncword
    h.put(0, 1)                         # ID: MPEG-4
    h.put(0, 2)                         # layer
    h.put(1, 1)                         # protection_absent
    h.put(1, 2)                         # profile: AAC-LC (AOT 2 - 1)
    h.put(SF_INDEX[sr], 4)
    h.put(0, 1)                         # private
    h.put(channel_config, 3)
    h.put(0, 1)                         # original/copy
    h.put(0, 1)                         # home
    h.put(0, 1)                         # copyright id bit
    h.put(0, 1)                         # copyright id start
    h.put(n, 13)                        # frame length
    h.put(0x7FF, 11)                    # buffer fullness: VBR
    h.put(0, 2)                         # raw data blocks - 1
    return h.tobytes() + payload


def probe_stream(frames: list, sr: int = 44100,
                 spacer: bool = True) -> bytes:
    """Concatenate probe frames (SCE or CPE), each followed by an
    all-zero spacer frame so every probe's full 2048-sample filterbank
    response is isolated (the OLA tail lands in the spacer's output
    frame)."""
    out = []
    zero = SCE(sections=[(ZERO_HCB, 1)], max_sfb=1)
    zero_cpe = CPE(left=SCE(sections=[(ZERO_HCB, 1)], max_sfb=1),
                   right=SCE(sections=[(ZERO_HCB, 1)], max_sfb=1))
    for f in frames:
        cc = 2 if isinstance(f, CPE) else 1
        out.append(adts_frame([f], sr=sr, channel_config=cc))
        if spacer:
            out.append(adts_frame([zero_cpe if cc == 2 else zero],
                                  sr=sr, channel_config=cc))
    return b"".join(out)


if __name__ == "__main__":
    import numpy as np
    import aac_oracle

    # smoke: a pulse calibration frame through the oracle decoder
    f = SCE(pulses=[(0, 10)])
    data = probe_stream([f, SCE(pulses=[(1, 10)])])
    pcm, sr = aac_oracle.decode_bytes(data, suffix=".aac")
    print("decoded", pcm.shape, sr, "rms:", float(np.sqrt((pcm**2).mean())))
    print("nonzero:", int(np.count_nonzero(np.abs(pcm) > 1e-9)))

"""Hand-rolled MPEG Layer III bitstream writer (probe/fixture rig).

Builds spec-exact frames with fully controlled side info and raw
main-data bits. Used by the mp3 dev/test harness to
  * synthesize streams that exercise one Huffman table / one feature
    at a time (the oracle-extraction + verification campaign,
    scripts/mp3_extract_tables.py), and
  * cover features LAME never emits (intensity stereo, mixed blocks,
    LSF intensity) against the libmpg123 oracle.

This is NOT an encoder: spectral values and side-info fields are
chosen directly by the caller; no psychoacoustics, no MDCT analysis.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, val: int, n: int):
        assert 0 <= val < (1 << n), (val, n)
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def put_bits(self, bitstr: str):
        for c in bitstr:
            self.bits.append(1 if c == "1" else 0)

    def to_bytes(self, pad_to: int | None = None) -> bytes:
        bits = self.bits[:]
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        if pad_to is not None:
            assert len(out) <= pad_to, (len(out), pad_to)
            out.extend(b"\x00" * (pad_to - len(out)))
        return bytes(out)


SR_TAB = {1: [44100, 48000, 32000], 2: [22050, 24000, 16000],
          25: [11025, 12000, 8000]}
BR_V1 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
BR_V2 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]


@dataclass
class Granule:
    """One granule-channel's side info + main-data bits."""
    bits: str = ""                    # scalefac + huffman region, raw
    big_values: int = 0
    global_gain: int = 210
    scalefac_compress: int = 0
    window_switching: int = 0
    block_type: int = 0
    mixed_block: int = 0
    table_select: tuple = (0, 0, 0)
    subblock_gain: tuple = (0, 0, 0)
    region0_count: int = 7
    region1_count: int = 7
    preflag: int = 0
    scalefac_scale: int = 0
    count1table_select: int = 0
    part2_3_override: int | None = None

    @property
    def part2_3_length(self) -> int:
        if self.part2_3_override is not None:
            return self.part2_3_override
        return len(self.bits)


def silent() -> Granule:
    return Granule()


def build_frame(granules, *, version=1, sr_idx=0, bitrate_idx=6,
                mode=3, mode_ext=0, scfsi=None,
                main_data_begin=0, prepend_main="") -> bytes:
    """granules: [ngr][nch] of Granule. Returns one frame's bytes.

    prepend_main: raw bits placed before granule 0's data in this
    frame's main-data section (reservoir testing).
    """
    lsf = version != 1
    ngr = 1 if lsf else 2
    nch = 1 if mode == 3 else 2
    assert len(granules) == ngr and all(len(g) == nch for g in granules)
    sr = SR_TAB[version][sr_idx]
    bitrate = (BR_V2 if lsf else BR_V1)[bitrate_idx]
    frame_bytes = (72 if lsf else 144) * bitrate * 1000 // sr
    side_bytes = (9 if nch == 1 else 17) if lsf else \
                 (17 if nch == 1 else 32)

    h = BitWriter()
    h.put(0x7FF, 11)
    h.put({1: 3, 2: 2, 25: 0}[version], 2)
    h.put(1, 2)            # layer III
    h.put(1, 1)            # no CRC
    h.put(bitrate_idx, 4)
    h.put(sr_idx, 2)
    h.put(0, 1)            # padding
    h.put(0, 1)            # private
    h.put(mode, 2)
    h.put(mode_ext, 2)
    h.put(0, 1)            # copyright
    h.put(0, 1)            # original
    h.put(0, 2)            # emphasis

    s = BitWriter()
    s.put(main_data_begin, 8 if lsf else 9)
    s.put(0, (1 if nch == 1 else 2) if lsf else (5 if nch == 1 else 3))
    if not lsf:
        if scfsi is None:
            scfsi = [[0] * 4 for _ in range(nch)]
        for ch in range(nch):
            for i in range(4):
                s.put(scfsi[ch][i], 1)
    for g in range(ngr):
        for ch in range(nch):
            gr = granules[g][ch]
            s.put(gr.part2_3_length, 12)
            s.put(gr.big_values, 9)
            s.put(gr.global_gain, 8)
            s.put(gr.scalefac_compress, 9 if lsf else 4)
            s.put(gr.window_switching, 1)
            if gr.window_switching:
                s.put(gr.block_type, 2)
                s.put(gr.mixed_block, 1)
                for r in range(2):
                    s.put(gr.table_select[r], 5)
                for w in range(3):
                    s.put(gr.subblock_gain[w], 3)
            else:
                for r in range(3):
                    s.put(gr.table_select[r], 5)
                s.put(gr.region0_count, 4)
                s.put(gr.region1_count, 3)
            if not lsf:
                s.put(gr.preflag, 1)
            s.put(gr.scalefac_scale, 1)
            s.put(gr.count1table_select, 1)
    side = s.to_bytes(side_bytes)

    m = BitWriter()
    m.put_bits(prepend_main)
    for g in range(ngr):
        for ch in range(nch):
            m.put_bits(granules[g][ch].bits)
    main = m.to_bytes(frame_bytes - 4 - side_bytes)
    return h.to_bytes(4) + side + main


def probe_stream(probes, *, version=1, sr_idx=0, bitrate_idx=6, spacer=1,
                 **granule_kw) -> bytes:
    """One probe per frame (granule 0), each followed by `spacer`
    all-silent frames so synthesis ringing cannot leak between probes.
    probes: list of Granule (channel 0, granule 0 of its frame).
    """
    lsf = version != 1
    frames = []
    for p in probes:
        gs = [[p]] if lsf else [[p], [silent()]]
        frames.append(build_frame(gs, version=version, sr_idx=sr_idx,
                                  bitrate_idx=bitrate_idx, **granule_kw))
        for _ in range(spacer):
            gs = [[silent()]] if lsf else [[silent()], [silent()]]
            frames.append(build_frame(gs, version=version, sr_idx=sr_idx,
                                      bitrate_idx=bitrate_idx,
                                      **granule_kw))
    return b"".join(frames)

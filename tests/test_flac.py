"""Native FLAC decoder (native/flacdec.c) vs the pure-Python encoder
(utils/flac.py): exact roundtrips over every subframe type, residual
coding, and stereo decorrelation mode, plus audio.load() integration.
"""

import numpy as np
import pytest

from vocal_remover_tpu import native
from vocal_remover_tpu.utils import audio, flac


@pytest.fixture(scope="module")
def ext():
    if native.get() is None or not hasattr(native.get(), "flac_decode"):
        pytest.skip("native extension unavailable")
    return native


def pcm(shape, scale=3000, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale).astype(np.int64)


@pytest.mark.parametrize("method", ["verbatim", "fixed2", "lpc2", "auto"])
@pytest.mark.parametrize("stereo", ["independent", "left_side", "mid_side"])
def test_roundtrip_exact(ext, method, stereo):
    x = pcm((10000, 2))
    data = flac.encode_flac(x, 44100, 16, method=method, stereo=stereo)
    dec, sr, bps = ext.flac_decode(data)
    assert (sr, bps) == (44100, 16)
    np.testing.assert_array_equal(dec, x)


def test_constant_blocks(ext):
    x = np.full((5000, 1), -123, np.int64)
    dec, sr, bps = ext.flac_decode(flac.encode_flac(x, 22050, 16))
    np.testing.assert_array_equal(dec, x)


def test_24bit_and_odd_length(ext):
    x = pcm((7001, 1), scale=1e6, seed=3)
    dec, sr, bps = ext.flac_decode(flac.encode_flac(x, 48000, 24))
    assert bps == 24
    np.testing.assert_array_equal(dec, x)


def test_multi_frame_boundaries(ext):
    # lengths around the 4096 block boundary
    for n in (4095, 4096, 4097, 8192, 8193):
        x = pcm((n, 2), seed=n)
        dec, _, _ = ext.flac_decode(flac.encode_flac(x, 44100, 16))
        np.testing.assert_array_equal(dec, x, err_msg=str(n))


def test_reject_garbage(ext):
    with pytest.raises(ValueError):
        ext.flac_decode(b"RIFFnotflacnotflacnotflacnotflacnotflacnotflac")


def test_audio_load_flac(ext, tmp_path):
    t = np.arange(44100) / 44100
    wave = np.stack([
        0.5 * np.sin(2 * np.pi * 440 * t),
        0.25 * np.sin(2 * np.pi * 220 * t),
    ]).astype(np.float32)
    p = str(tmp_path / "song.flac")
    flac.write_flac(p, wave, 44100)
    out, sr = audio.load(p, sr=44100, mono=False)
    assert sr == 44100
    assert out.shape == wave.shape
    # 16-bit quantization is the only loss
    assert np.abs(out - wave).max() <= 1.0 / 32768.0

    # resampled load goes through the kaiser_fast path
    out2, sr2 = audio.load(p, sr=22050, mono=False)
    assert sr2 == 22050
    assert out2.shape == (2, 22050)


@pytest.mark.parametrize("kw", [
    dict(residual_method=1),                       # Rice2 (5-bit params)
    dict(partition_order=2),                       # multi-partition
    dict(residual_method=1, partition_order=3),
    dict(escape=True),                             # raw-bits partitions
    dict(residual_method=1, escape=True),
    dict(partition_order=4, escape=True),
])
def test_residual_coding_modes(ext, kw):
    """Every residual decode path: Rice, Rice2, partition orders > 0,
    and escaped raw-bits partitions."""
    x = pcm((9000, 2))
    data = flac.encode_flac(x, 44100, 16, method="fixed2", **kw)
    dec, _, _ = ext.flac_decode(data)
    np.testing.assert_array_equal(dec, x)


def test_encoder_clamps_excessive_partition_order(tmp_path):
    """partition orders that would leave partition 0 with < 1 residual
    (block >> po <= predictor order) are clamped, not written corrupt."""
    from vocal_remover_tpu.utils import flac as flac_mod

    rng = np.random.default_rng(3)
    pcm = (rng.standard_normal((4096 + 100, 2)) * 2000).astype(np.int32)
    data = flac_mod.encode_flac(
        pcm, 8000, bps=16, method="fixed2", partition_order=12
    )
    from vocal_remover_tpu import native

    decoded = native.flac_decode(data)
    if decoded is None:
        import pytest

        pytest.skip("native FLAC decoder unavailable")
    out, sr, bps = decoded
    np.testing.assert_array_equal(out, pcm)


def test_unknown_length_stream_grows_output(ext):
    # silence-heavy stream: CONSTANT subframes pack 4096-sample blocks
    # into a few bytes, so the stream-size capacity estimate is far too
    # small once total_samples is unknown — the decoder must grow its
    # output buffer instead of truncating silently
    n = 200_000
    x = np.zeros((n, 1), np.int64)
    data = bytearray(flac.encode_flac(x, 44100, 16))
    # STREAMINFO payload starts at byte 8; total_samples(36) occupies
    # the low nibble of payload byte 13 and payload bytes 14-17
    data[8 + 13] &= 0xF0
    for off in range(14, 18):
        data[8 + off] = 0
    dec, sr, bps = ext.flac_decode(bytes(data))
    assert dec.shape[0] == n
    np.testing.assert_array_equal(dec, x)

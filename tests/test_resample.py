"""Band-limited sinc resampler (utils/resample.py) — property tests.

No resampy/librosa oracle exists in this environment, so correctness is
established by signal-processing properties: tone preservation in the
passband, alias suppression above Nyquist, librosa's output-length
contract, linearity, and shape/dtype handling.
"""

import numpy as np
import pytest

from vocal_remover_tpu.utils import audio
from vocal_remover_tpu.utils.resample import QUALITY, resample, sinc_window


def tone(freq, sr, seconds=1.0, phase=0.0):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t + phase)


def tone_amplitude(x, freq, sr):
    """Amplitude of `freq` in x via quadrature projection (mid section
    only, away from filter edge effects)."""
    n = len(x)
    sl = slice(n // 4, 3 * n // 4)
    t = np.arange(n)[sl] / sr
    c = x[sl] * np.exp(-2j * np.pi * freq * t)
    return 2 * np.abs(c.mean())


def test_identity_same_rate():
    x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    out = resample(x, 44100, 44100)
    np.testing.assert_array_equal(out, x)


@pytest.mark.parametrize("n,orig,target", [
    (44100, 44100, 22050),
    (44100, 22050, 44100),
    (100001, 48000, 44100),
    (12345, 44100, 16000),
])
def test_output_length_matches_librosa_contract(n, orig, target):
    # librosa.resample(fix=True): ceil(n * target / orig) samples
    x = np.zeros(n, np.float32)
    out = resample(x, orig, target)
    assert out.shape == (int(np.ceil(n * target / orig)),)


@pytest.mark.parametrize("res_type", ["kaiser_fast", "kaiser_best"])
@pytest.mark.parametrize("orig,target", [
    (44100, 22050), (22050, 44100), (48000, 44100), (44100, 48000),
])
def test_passband_tone_preserved(res_type, orig, target):
    f = 1000.0
    x = tone(f, orig)
    y = resample(x, orig, target, res_type)
    amp = tone_amplitude(y.astype(np.float64), f, target)
    assert abs(amp - 1.0) < 0.02, (res_type, orig, target, amp)


def test_alias_suppressed():
    # 15 kHz tone downsampled to 16 kHz (Nyquist 8 kHz) must vanish
    x = tone(15000.0, 44100)
    y = resample(x, 44100, 16000)
    mid = y[len(y) // 4 : 3 * len(y) // 4].astype(np.float64)
    assert np.sqrt((mid ** 2).mean()) < 1e-3


def test_linearity():
    rng = np.random.default_rng(1)
    a = rng.standard_normal(4000)
    b = rng.standard_normal(4000)
    ya = resample(a, 48000, 44100).astype(np.float64)
    yb = resample(b, 48000, 44100).astype(np.float64)
    yab = resample(a + b, 48000, 44100).astype(np.float64)
    np.testing.assert_allclose(yab, ya + yb, atol=1e-6)


def test_stereo_axis_and_dtype():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 5000)).astype(np.float32)
    y = resample(x, 44100, 22050)
    assert y.dtype == np.float32
    assert y.shape == (2, 2500)
    # channels are independent
    y0 = resample(x[0], 44100, 22050)
    np.testing.assert_allclose(y[0], y0, atol=1e-7)


def test_filter_construction_constants():
    # resampy kaiser_fast: 16 zero crossings, 512 steps/crossing
    num_zeros, precision, rolloff, beta = QUALITY["kaiser_fast"]
    win = sinc_window(num_zeros, precision, rolloff, beta)
    assert win.shape == (16 * 512 + 1,)
    # center tap = rolloff (sinc(0)=1, kaiser center=1)
    assert abs(win[0] - rolloff) < 1e-12
    # zero crossings of the sinc land every `precision/rolloff` steps
    assert abs(win[int(round(precision / rolloff))]) < 1e-3
    # monotone taper: tail is tiny
    assert abs(win[-1]) < 1e-4


def test_audio_resample_dispatch():
    x = tone(440.0, 44100, 0.25)
    a = audio.resample(x, 44100, 22050)  # default kaiser_fast
    b = resample(x, 44100, 22050)
    np.testing.assert_array_equal(a, b)
    c = audio.resample(x, 44100, 22050, res_type="polyphase")
    assert c.shape[-1] in (b.shape[-1], b.shape[-1] - 1, b.shape[-1] + 1)
    # same family: tones agree loosely
    n = min(len(b), len(c))
    assert np.abs(b[:n] - c[:n]).mean() < 0.02


def test_chunked_long_input_exact():
    """The chunked kernel (memory guard for long songs) must be
    bit-exact vs the single-pass kernel across chunk borders."""
    from vocal_remover_tpu.utils import resample as rs

    rng = np.random.default_rng(7)
    x = rng.standard_normal(int(48000 * 50)).astype(np.float64)
    win, delta, precision = rs._table("kaiser_fast")
    ratio = 44100 / 48000
    n_eng = int(len(x) * ratio)
    assert n_eng > (1 << 20)  # actually crosses a chunk border
    full = rs._resample_1d_wings(x, n_eng, ratio, win, delta, precision)
    via_api = rs.resample(x, 48000, 44100)
    np.testing.assert_array_equal(
        via_api[:n_eng], full.astype(np.float32)[:n_eng]
    )


def test_chunked_path_matches_unchunked(monkeypatch):
    """The long-signal chunked path must equal the one-shot kernel
    bit-for-bit, including outputs at chunk boundaries (the margin must
    cover every tap the kernel's floored index_step can reach)."""
    from vocal_remover_tpu.utils import resample as rs

    rng = np.random.default_rng(5)
    x = rng.standard_normal(120000).astype(np.float32)
    for res_type in ("kaiser_fast", "kaiser_best"):
        ref = rs.resample(x, 44100, 8000, res_type=res_type)
        monkeypatch.setattr(rs, "_CHUNK", 4096)
        out = rs.resample(x, 44100, 8000, res_type=res_type)
        monkeypatch.undo()
        np.testing.assert_array_equal(out, ref)


def test_sub_resolution_ratio_raises():
    # ratios below 1/precision have no filter-table resolution left;
    # must be a clear error, not a silent all-zero output
    x = np.random.default_rng(0).standard_normal(44100).astype(np.float32)
    with pytest.raises(ValueError, match="resolution"):
        resample(x, 44100, 50, res_type="kaiser_fast")

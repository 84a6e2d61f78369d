"""Native C extension (_vrtnative): build, correctness vs numpy,
fallback behavior."""

import numpy as np
import pytest

from vocal_remover_tpu import native


@pytest.fixture(scope="module")
def ext():
    mod = native.get()
    if mod is None:
        pytest.skip("no C compiler available; numpy fallbacks in use")
    return mod


def test_pcm16_encode_matches_numpy(ext, rng):
    w = (rng.standard_normal((2, 50000)) * 1.2).astype(np.float32)
    enc = native.pcm16_encode(w)
    ref = np.round(
        np.clip(w, -1.0, 1.0 - 1.0 / 32768.0) * 32768.0
    ).astype(np.int16)
    np.testing.assert_array_equal(enc, ref)


def test_pcm16_decode_matches_numpy(ext, rng):
    p = rng.integers(-32768, 32768, (2, 4000)).astype(np.int16)
    dec = native.pcm16_decode(p)
    np.testing.assert_array_equal(dec, p.astype(np.float32) / 32768.0)


def test_load_crop_abs_matches_numpy(ext, rng, tmp_path):
    T, F = 300, 129
    arr = (
        rng.standard_normal((T, 2, F)) + 1j * rng.standard_normal((T, 2, F))
    ).astype(np.complex64)
    path = str(tmp_path / "cache.npy")
    np.save(path, arr)
    coef = 2.5
    out = native.load_crop_abs(path, 50, 64, coef)
    ref = (np.abs(arr[50:114]) / coef).transpose(1, 2, 0).astype(np.float32)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_load_crop_abs_rejects_bad_layout(ext, tmp_path):
    path = str(tmp_path / "bad.npy")
    np.save(path, np.zeros((10, 3, 4), np.complex64))  # channel dim != 2
    with pytest.raises(ValueError):
        native.load_crop_abs(path, 0, 4, 1.0)


def test_write_wav_uses_native_and_matches(tmp_path, rng):
    from vocal_remover_tpu.utils import audio

    w = (rng.standard_normal((2, 8000)) * 0.4).astype(np.float32)
    p = str(tmp_path / "n.wav")
    audio.write_wav(p, w, 8000)
    r, _ = audio.read_wav(p)
    np.testing.assert_allclose(
        r, np.clip(w, -1, 1 - 1 / 32768), atol=1.0 / 32768
    )


def test_quantize_u8_maps_nan_to_zero(ext, rng):
    x = rng.standard_normal(256).astype(np.float32) ** 2
    x[7] = np.nan
    x[100] = -np.inf
    raw, scale = ext.quantize_u8(x)
    q = np.frombuffer(raw, np.uint8)
    assert q[7] == 0 and q[100] == 0
    finite = np.isfinite(x)
    expect = np.round(np.clip(x[finite] / scale, 0, 255)).astype(np.uint8)
    np.testing.assert_array_equal(q[finite], expect)

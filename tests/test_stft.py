"""STFT/iSTFT numerics vs the torch oracle (== librosa semantics).

torch.stft(center=True, pad_mode='reflect', window=hann_periodic) is
numerically identical to librosa.stft's defaults, which is what the
reference uses (reference lib/spec_utils.py:26-31, 157-165).
"""

import numpy as np
import pytest
import torch

from vocal_remover_tpu.ops import stft as stft_ops


def _torch_stft(wave, n_fft, hop):
    w = torch.hann_window(n_fft, periodic=True, dtype=torch.float64)
    out = torch.stft(
        torch.from_numpy(wave.astype(np.float64)),
        n_fft,
        hop_length=hop,
        window=w,
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    return out.numpy()


@pytest.mark.parametrize("n_fft,hop", [(2048, 1024), (2048, 512), (512, 128)])
def test_stft_matches_torch(rng, n_fft, hop):
    wave = rng.standard_normal((2, 44100)).astype(np.float32)
    re, im = stft_ops.stft(wave, n_fft, hop)
    ref = _torch_stft(wave, n_fft, hop)
    assert re.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(re), ref.real, atol=2e-4 * scale)
    np.testing.assert_allclose(np.asarray(im), ref.imag, atol=2e-4 * scale)


def test_stft_np_matches_torch(rng):
    wave = rng.standard_normal((2, 32000)).astype(np.float32)
    spec = stft_ops.stft_np(wave, 2048, 1024)
    ref = _torch_stft(wave, 2048, 1024)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(spec, ref, atol=2e-5 * scale)


@pytest.mark.parametrize("n_fft,hop", [(2048, 1024), (512, 128)])
def test_istft_roundtrip(rng, n_fft, hop):
    wave = rng.standard_normal((2, 44100)).astype(np.float32)
    re, im = stft_ops.stft(wave, n_fft, hop)
    out = np.asarray(stft_ops.istft(re, im, n_fft, hop, wave.shape[-1]))
    # centered STFT roundtrip is exact away from the very edges
    np.testing.assert_allclose(out[:, hop:-hop], wave[:, hop:-hop], atol=2e-3)


def test_istft_matches_torch(rng):
    n_fft, hop = 2048, 1024
    wave = rng.standard_normal((2, 40960)).astype(np.float32)
    spec = _torch_stft(wave, n_fft, hop)
    re = spec.real.astype(np.float32)
    im = spec.imag.astype(np.float32)
    ours = np.asarray(stft_ops.istft(re, im, n_fft, hop))
    w = torch.hann_window(n_fft, periodic=True, dtype=torch.float64)
    ref = torch.istft(
        torch.from_numpy(re.astype(np.float64) + 1j * im.astype(np.float64)),
        n_fft,
        hop_length=hop,
        window=w,
        center=True,
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_istft_np_matches_device(rng):
    n_fft, hop = 2048, 1024
    wave = rng.standard_normal((2, 40960)).astype(np.float32)
    spec = stft_ops.stft_np(wave, n_fft, hop)
    host = stft_ops.istft_np(spec, n_fft, hop)
    dev = np.asarray(
        stft_ops.istft(
            spec.real.astype(np.float32), spec.imag.astype(np.float32),
            n_fft, hop,
        )
    )
    np.testing.assert_allclose(host, dev, atol=5e-4)


def test_frame_count_helpers():
    for length in [44100, 40960, 12345]:
        n = stft_ops.num_frames(length, 2048, 1024)
        re, _ = stft_ops.stft(np.zeros(length, np.float32), 2048, 1024)
        assert re.shape[-1] == n
        assert stft_ops.istft_length(n, 2048, 1024) == 1024 * (n - 1)

"""Streamed segmented separation == monolithic separate_wave, for
lengths that do and don't align with segment boundaries."""

import numpy as np
import pytest
import jax

from vocal_remover_tpu.models.cascaded import CascadedNet
from vocal_remover_tpu.separate.separator import Separator
from vocal_remover_tpu.separate.streaming import StreamingSeparator


@pytest.fixture(scope="module")
def small():
    model = CascadedNet(256, 128, 8, 16)
    variables = model.init(jax.random.PRNGKey(0))
    return model, variables


@pytest.mark.parametrize("seconds", [3.0, 7.3])
def test_streaming_matches_monolithic(small, rng, seconds):
    model, variables = small
    sr = 16000
    t = np.arange(int(sr * seconds)) / sr
    wave = np.stack([
        0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(len(t)),
        0.4 * np.sin(2 * np.pi * 220 * t),
    ]).astype(np.float32)

    mono = Separator(model, variables, batchsize=2, cropsize=256)
    y_ref, v_ref = mono.separate_wave(wave)

    stream = StreamingSeparator(model, variables, segment_patches=4,
                                batchsize=2)
    y, v = stream.separate_wave(wave)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=3e-4)
    np.testing.assert_allclose(v, v_ref, atol=3e-4)


def test_streaming_pcm16_residual(small, rng):
    """pcm16 + residual-vocals streaming == the f32 streamed output at
    PCM16 resolution (and vocals reconstruct the mixture)."""
    model, variables = small
    sr = 16000
    wave = (rng.standard_normal((2, sr * 5)) * 0.3).astype(np.float32)
    base = StreamingSeparator(model, variables, segment_patches=4,
                              batchsize=2)
    # compare against the f32 path fed the PCM16-quantized wave (input
    # quantization itself perturbs a random-weight model's masks; with
    # identical inputs the paths agree to the output LSB)
    wq = (np.round(np.clip(wave, -1, 1 - 1 / 32768.0) * 32768) / 32768
          ).astype(np.float32)
    y32, v32 = base.separate_wave(wq)

    fast = StreamingSeparator(model, variables, segment_patches=4,
                              batchsize=2, pcm16_io=True,
                              vocals_residual=True)
    y16, v16 = fast.separate_wave(wave)
    assert y16.dtype == np.int16
    np.testing.assert_allclose(
        y16.astype(np.float32) / 32768.0, y32, atol=2.5 / 32768.0
    )
    # y + v reconstructs the quantized mixture exactly (residual def.)
    w16 = np.round(np.clip(wave, -1, 1 - 1 / 32768.0) * 32768).astype(
        np.int32
    )
    resum = y16.astype(np.int32) + v16.astype(np.int32)
    np.testing.assert_array_equal(
        np.clip(resum, -32768, 32767), np.clip(w16, -32768, 32767)
    )


def test_streaming_constant_compile(small, rng):
    """All segments (interior and edges) reuse one compiled function."""
    model, variables = small
    stream = StreamingSeparator(model, variables, segment_patches=4,
                                batchsize=2)
    wave = (rng.standard_normal((2, 16000 * 5)) * 0.3).astype(np.float32)
    fn = stream._segment_fn()
    stream.separate_wave(wave)
    # a different length reuses the very same compiled function
    stream.separate_wave(wave[:, : 16000 * 3])
    assert stream._segment_fn() is fn


def test_streaming_rejects_complex_models():
    from vocal_remover_tpu.models.cascaded import CascadedNet
    from vocal_remover_tpu.separate.streaming import StreamingSeparator

    model = CascadedNet(64, 32, 4, 8, is_complex=True)
    variables = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        StreamingSeparator(model, variables)

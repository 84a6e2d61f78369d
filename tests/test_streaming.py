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
    fn = stream._segment_fn("direct")
    stream.separate_wave(wave)
    # a different length reuses the very same compiled function
    stream.separate_wave(wave[:, : 16000 * 3])
    assert stream._segment_fn("direct") is fn


def test_streaming_rejects_complex_models():
    from vocal_remover_tpu.models.cascaded import CascadedNet
    from vocal_remover_tpu.separate.streaming import StreamingSeparator

    model = CascadedNet(64, 32, 4, 8, is_complex=True)
    variables = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        StreamingSeparator(model, variables)


def _song(rng, sr=16000, seconds=7.3):
    t = np.arange(int(sr * seconds)) / sr
    return np.stack([
        0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(len(t)),
        0.4 * np.sin(2 * np.pi * 220 * t),
    ]).astype(np.float32)


def test_streaming_tta_matches_monolithic(small, rng):
    """Streamed TTA (shifted second pass inside the segment fn, global
    lexicographic-max normalization) == monolithic separate_wave(tta)."""
    model, variables = small
    wave = _song(rng)

    mono = Separator(model, variables, batchsize=2, cropsize=256)
    y_ref, v_ref = mono.separate_wave(wave, tta=True)

    stream = StreamingSeparator(model, variables, segment_patches=4,
                                batchsize=2, tta=True)
    y, v = stream.separate_wave(wave)
    np.testing.assert_allclose(y, y_ref, atol=3e-4)
    np.testing.assert_allclose(v, v_ref, atol=3e-4)


@pytest.mark.parametrize("tta", [False, True])
def test_streaming_postprocess_matches_spectrogram_path(small, rng, tta):
    """Streamed two-phase postprocess == the host spectrogram API
    (separate/_postprocess/merge_artifacts + iSTFT), TTA included."""
    from vocal_remover_tpu.ops import stft as stft_ops

    model, variables = small
    wave = _song(rng)
    X_spec = stft_ops.stft_np(wave, 256, 128)

    mono = Separator(model, variables, batchsize=2, cropsize=256,
                     postprocess=True)
    if tta:
        y_spec, v_spec = mono.separate_tta(X_spec)
    else:
        y_spec, v_spec = mono.separate(X_spec)
    y_ref = stft_ops.istft_np(y_spec, 256, 128, wave.shape[-1])
    v_ref = stft_ops.istft_np(v_spec, 256, 128, wave.shape[-1])

    stream = StreamingSeparator(model, variables, segment_patches=4,
                                batchsize=2, tta=tta, postprocess=True)
    y, v = stream.separate_wave(wave)
    np.testing.assert_allclose(y, y_ref, atol=4e-4)
    np.testing.assert_allclose(v, v_ref, atol=4e-4)


def test_no_host_index_constants_in_traced_code():
    """The segment/stats functions must build frame indices with device
    iota, not np.arange (O(segment) host constants bloat the graph —
    the monolithic path's HTTP-413 lesson, BENCH_NOTES.md)."""
    import inspect

    from vocal_remover_tpu.separate import streaming

    src = inspect.getsource(streaming.StreamingSeparator._build_segment_fn)
    assert "np.arange" not in src
    src = inspect.getsource(streaming.StreamingSeparator._global_spec_stats)
    assert "np.arange" not in src.split("def stats")[1].split("fn =")[0]

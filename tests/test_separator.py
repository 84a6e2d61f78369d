"""End-to-end separation parity vs the reference Separator
(reference inference.py:16-102) with identical converted weights."""

import sys
import types

import numpy as np
import pytest
import torch

from vocal_remover_tpu.models.cascaded import CascadedNet
from vocal_remover_tpu.ops import stft as stft_ops
from vocal_remover_tpu.separate.separator import Separator


@pytest.fixture(scope="module")
def reference_inference(reference_lib):
    if "cv2" not in sys.modules:
        cv2 = types.ModuleType("cv2")
        cv2.IMREAD_COLOR = 1
        sys.modules["cv2"] = cv2
    if "tqdm" not in sys.modules:
        mod = types.ModuleType("tqdm")
        mod.tqdm = lambda x, *a, **k: x
        sys.modules["tqdm"] = mod
    # load by explicit path: the repo's own top-level inference.py shim
    # would shadow a bare `import inference` depending on sys.path order
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_reference_inference", "/root/reference/inference.py"
    )
    ref_inference = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_inference)

    return ref_inference


@pytest.fixture(scope="module")
def pair(reference_lib):
    torch.manual_seed(7)
    tmod = reference_lib.nets.CascadedNet(256, 128, 8, 16)
    tmod.eval()
    jmod = CascadedNet(256, 128, 8, 16)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    v = jmod.from_torch(sd)
    return tmod, jmod, v


def synth_song(sr=8000, seconds=6.0):
    t = np.arange(int(sr * seconds)) / sr
    left = 0.6 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(
        2 * np.pi * 1307 * t
    )
    right = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.1 * np.random.default_rng(
        3
    ).standard_normal(len(t))
    return np.stack([left, right]).astype(np.float32)


@pytest.mark.reference
@pytest.mark.parametrize("tta", [False, True])
def test_separate_matches_reference(reference_inference, pair, tta):
    tmod, jmod, v = pair
    wave = synth_song()
    X_spec = stft_ops.stft_np(wave, 256, 128)

    ref_sp = reference_inference.Separator(
        tmod, torch.device("cpu"), batchsize=2, cropsize=256,
        postprocess=False,
    )
    ours_sp = Separator(jmod, v, batchsize=2, cropsize=256, postprocess=False)

    if tta:
        ref_y, ref_v = ref_sp.separate_tta(X_spec.copy())
        our_y, our_v = ours_sp.separate_tta(X_spec.copy())
    else:
        ref_y, ref_v = ref_sp.separate(X_spec.copy())
        our_y, our_v = ours_sp.separate(X_spec.copy())

    scale = np.abs(X_spec).max()
    assert our_y.shape == ref_y.shape
    np.testing.assert_allclose(our_y, ref_y, atol=2e-4 * scale)
    np.testing.assert_allclose(our_v, ref_v, atol=2e-4 * scale)


@pytest.mark.reference
def test_separate_postprocess_matches_reference(reference_inference, pair):
    tmod, jmod, v = pair
    wave = synth_song(seconds=8.0)
    X_spec = stft_ops.stft_np(wave, 256, 128)
    ref_sp = reference_inference.Separator(
        tmod, torch.device("cpu"), batchsize=2, cropsize=256, postprocess=True
    )
    ours_sp = Separator(jmod, v, batchsize=2, cropsize=256, postprocess=True)
    ref_y, ref_v = ref_sp.separate(X_spec.copy())
    our_y, our_v = ours_sp.separate(X_spec.copy())
    scale = np.abs(X_spec).max()
    np.testing.assert_allclose(our_y, ref_y, atol=5e-4 * scale)
    np.testing.assert_allclose(our_v, ref_v, atol=5e-4 * scale)


@pytest.mark.parametrize("tta", [False, True])
def test_separate_wave_matches_spectrogram_path(pair, tta):
    """The fused device pipeline == host STFT -> separate -> host iSTFT."""
    _, jmod, v = pair
    wave = synth_song(seconds=5.0)
    X_spec = stft_ops.stft_np(wave, 256, 128)
    sp = Separator(jmod, v, batchsize=2, cropsize=256)
    if tta:
        y_spec, v_spec = sp.separate_tta(X_spec)
    else:
        y_spec, v_spec = sp.separate(X_spec)
    y_ref = stft_ops.istft_np(y_spec, 256, 128, wave.shape[-1])
    v_ref = stft_ops.istft_np(v_spec, 256, 128, wave.shape[-1])

    y_wave, v_wave = sp.separate_wave(wave, tta=tta)
    assert y_wave.shape == wave.shape
    np.testing.assert_allclose(y_wave, y_ref, atol=2e-4)
    np.testing.assert_allclose(v_wave, v_ref, atol=2e-4)


def test_separate_wave_pcm16(pair):
    """PCM16 I/O quantization == f32 path + write_wav conversion."""
    _, jmod, v = pair
    wave = synth_song(seconds=4.0)
    sp = Separator(jmod, v, batchsize=2, cropsize=256)
    y32, v32 = sp.separate_wave(wave)
    y16, v16 = sp.separate_wave(wave, pcm16_io=True)
    assert y16.dtype == np.int16

    def q(w):
        return np.round(
            np.clip(w, -1, 1 - 1 / 32768.0) * 32768.0
        ).astype(np.int16)

    # allow +-1 LSB where the f32 value sits within float error of .5
    assert np.abs(y16.astype(np.int32) - q(y32).astype(np.int32)).max() <= 1
    assert np.abs(v16.astype(np.int32) - q(v32).astype(np.int32)).max() <= 1


def test_separator_service(pair):
    from vocal_remover_tpu.separate.service import SeparatorService

    _, jmod, v = pair
    sp = Separator(jmod, v, batchsize=2, cropsize=256)
    svc = SeparatorService(sp, pcm16_io=True)
    songs = [synth_song(seconds=4.0) for _ in range(3)]
    outs = list(svc.map(songs))
    assert len(outs) == 3
    ref_y, ref_v = sp.separate_wave(songs[0], pcm16_io=True)
    np.testing.assert_array_equal(outs[0][0], ref_y)
    np.testing.assert_array_equal(outs[1][0], ref_y)  # same song content


def test_energy_conservation(pair):
    """mask + (1-mask) == 1: y_spec + v_spec reconstructs |X|e^{i phi}
    exactly when postprocess is off (inference.py:35-36)."""
    _, jmod, v = pair
    wave = synth_song(seconds=4.0)
    X_spec = stft_ops.stft_np(wave, 256, 128)
    sp = Separator(jmod, v, batchsize=2, cropsize=256)
    y_spec, v_spec = sp.separate(X_spec)
    np.testing.assert_allclose(
        y_spec + v_spec, X_spec, atol=1e-4 * np.abs(X_spec).max()
    )


def test_fn_cache_bounded_lru():
    """The per-instance executable cache is a bounded LRU: feeding many
    distinct song lengths must not accumulate compiled programs."""
    from vocal_remover_tpu.models.cascaded import CascadedNet
    from vocal_remover_tpu.separate.separator import Separator

    import jax

    model = CascadedNet(64, 32, 4, 8)
    variables = model.init(jax.random.PRNGKey(0))
    sep = Separator(model, variables, batchsize=2, cropsize=160)
    for i in range(20):
        sep._cached_fn(("wave", 1000 + i, False, True, True), lambda: i)
    assert len(sep._fn_cache) == sep._fn_cache_max
    # most-recently-used keys survive
    assert ("wave", 1019, False, True, True) in sep._fn_cache
    assert ("wave", 1000, False, True, True) not in sep._fn_cache


def test_bucketed_wave_reuses_one_executable(pair):
    """Different song lengths padded to one bucket share ONE compiled
    pipeline (VERDICT r2: no per-exact-length recompiles), and outputs
    match the exact-length path away from the final STFT window."""
    _, jmod, v = pair
    sr = 8000
    bucket = 4 * sr
    sp = Separator(jmod, v, batchsize=2, cropsize=256)

    a = synth_song(seconds=2.7)
    b = synth_song(seconds=3.4)
    ya, va = sp.separate_wave(a, bucket=bucket)
    yb, vb = sp.separate_wave(b, bucket=bucket)
    assert len(sp._fn_cache) == 1  # one executable for both lengths
    assert ya.shape == a.shape and yb.shape == b.shape

    y_exact, v_exact = sp.separate_wave(a)
    n_fft = 256
    body = a.shape[-1] - n_fft
    np.testing.assert_allclose(ya[:, :body], y_exact[:, :body], atol=2e-4)
    np.testing.assert_allclose(va[:, :body], v_exact[:, :body], atol=2e-4)


@pytest.mark.reference
@pytest.mark.parametrize("cropsize", [512, 1024])
def test_wide_cropsize_matches_reference(reference_inference, pair, cropsize):
    """Wide-crop serving (the fast geometry: overlap redundancy
    cropsize/(cropsize-128) -> 1.14x at 1024 vs 2.0x at the 256
    default) is the SAME knob the reference exposes (reference
    inference.py:116 --cropsize): outputs at any cropsize match the
    reference at that cropsize."""
    tmod, jmod, v = pair
    wave = synth_song(seconds=18.0)
    X_spec = stft_ops.stft_np(wave, 256, 128)

    ref_sp = reference_inference.Separator(
        tmod, torch.device("cpu"), batchsize=2, cropsize=cropsize,
        postprocess=False,
    )
    ours_sp = Separator(jmod, v, batchsize=2, cropsize=cropsize,
                        postprocess=False)
    ref_y, ref_v = ref_sp.separate(X_spec.copy())
    our_y, our_v = ours_sp.separate(X_spec.copy())
    scale = np.abs(X_spec).max()
    assert our_y.shape == ref_y.shape
    np.testing.assert_allclose(our_y, ref_y, atol=2e-4 * scale)
    np.testing.assert_allclose(our_v, ref_v, atol=2e-4 * scale)


def _songs_stack(n, seconds=4.0, sr=8000):
    base = synth_song(sr=sr, seconds=seconds)
    rng = np.random.default_rng(21)
    out = [base]
    for i in range(1, n):
        noise = rng.standard_normal(base.shape).astype(np.float32)
        out.append((0.4 * base * (0.5 + 0.3 * i) + 0.05 * noise).astype(
            np.float32))
    return np.stack(out)


@pytest.mark.parametrize("tta", [False, True])
def test_separate_waves_matches_per_song(pair, tta):
    """Cross-song patch batching: the merged-stream multiwave pipeline
    produces the same per-song outputs as separate_wave (each patch
    sees the same model + its own song's normalization; only the
    lax.map chunk boundaries differ)."""
    _, jmod, v = pair
    sep = Separator(jmod, v, batchsize=2, cropsize=256)
    stack = _songs_stack(3)
    ys, vs = sep.separate_waves(stack, tta=tta)
    assert ys.shape == stack.shape and vs.shape == stack.shape
    for i in range(stack.shape[0]):
        y1, v1 = sep.separate_wave(stack[i], tta=tta)
        np.testing.assert_allclose(ys[i], y1, atol=2e-5)
        np.testing.assert_allclose(vs[i], v1, atol=2e-5)


def test_separate_waves_pcm16(pair):
    _, jmod, v = pair
    sep = Separator(jmod, v, batchsize=2, cropsize=256)
    stack = _songs_stack(2)
    ys, vs = sep.separate_waves(stack, pcm16_io=True)
    assert ys.dtype == np.int16
    for i in range(stack.shape[0]):
        y1, v1 = sep.separate_wave(stack[i], pcm16_io=True)
        assert np.abs(ys[i].astype(np.int32) - y1.astype(np.int32)).max() <= 1
        assert np.abs(vs[i].astype(np.int32) - v1.astype(np.int32)).max() <= 1


def test_service_group_matches_per_song(pair):
    """group=N service: same outputs and order as group=1, including a
    lone odd-length song and a final partial group (both run through
    the exact per-song path — no repeat padding)."""
    from vocal_remover_tpu.separate.service import SeparatorService

    _, jmod, v = pair
    sep = Separator(jmod, v, batchsize=2, cropsize=256)
    songs = (
        [synth_song(seconds=3.0)]            # lone length -> flush
        + list(_songs_stack(3, seconds=4.0))  # one full group + partial
    )
    svc1 = SeparatorService(sep, pcm16_io=True, vocals_residual=True,
                            group=1)
    svcg = SeparatorService(sep, pcm16_io=True, vocals_residual=True,
                            group=2)
    outs1 = list(svc1.map(songs))
    outsg = list(svcg.map(songs))
    assert len(outsg) == len(outs1) == len(songs)
    for (y1, v1), (yg, vg) in zip(outs1, outsg):
        assert np.abs(yg.astype(np.int32) - y1.astype(np.int32)).max() <= 1
        assert np.abs(vg.astype(np.int32) - v1.astype(np.int32)).max() <= 1


def test_service_group_interleaved_lengths(pair):
    """Length-bucketed grouping: interleaved lengths still form full
    groups per bucket, and outputs come back in INPUT order."""
    from vocal_remover_tpu.separate.service import SeparatorService

    _, jmod, v = pair
    sep = Separator(jmod, v, batchsize=2, cropsize=256)
    a = list(_songs_stack(2, seconds=3.0))
    b = list(_songs_stack(2, seconds=4.0))
    songs = [a[0], b[0], a[1], b[1]]  # alternating lengths

    svc1 = SeparatorService(sep, pcm16_io=True, vocals_residual=True,
                            group=1)
    svcg = SeparatorService(sep, pcm16_io=True, vocals_residual=True,
                            group=2)
    outs1 = list(svc1.map(songs))
    outsg = list(svcg.map(songs))
    assert len(outsg) == len(outs1) == len(songs)
    for i, ((y1, v1), (yg, vg)) in enumerate(zip(outs1, outsg)):
        assert yg.shape == songs[i].shape  # order preserved per length
        assert np.abs(yg.astype(np.int32) - y1.astype(np.int32)).max() <= 1
        assert np.abs(vg.astype(np.int32) - v1.astype(np.int32)).max() <= 1


def test_service_group_max_pending_flush(pair):
    """An adversarial length sequence (every song a new length) cannot
    buffer unboundedly: buffers flush through the per-song path once
    max_pending is exceeded, outputs still exact and in order."""
    from vocal_remover_tpu.separate.service import SeparatorService

    _, jmod, v = pair
    sep = Separator(jmod, v, batchsize=2, cropsize=256)
    songs = [synth_song(seconds=3.0 + 0.5 * i) for i in range(4)]

    svc1 = SeparatorService(sep, pcm16_io=True, vocals_residual=True,
                            group=1)
    svcg = SeparatorService(sep, pcm16_io=True, vocals_residual=True,
                            group=4, max_pending=2)
    outs1 = list(svc1.map(songs))
    outsg = list(svcg.map(songs))
    assert len(outsg) == len(outs1) == len(songs)
    for i, ((y1, v1), (yg, vg)) in enumerate(zip(outs1, outsg)):
        assert yg.shape == songs[i].shape
        assert np.abs(yg.astype(np.int32) - y1.astype(np.int32)).max() <= 1
        assert np.abs(vg.astype(np.int32) - v1.astype(np.int32)).max() <= 1

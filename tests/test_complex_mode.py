"""Complex-mask mode end-to-end: train -> checkpoint -> separate.

The reference carries complex masks as dormant code (nets.py:83-84,
104-107, 119-122; train.py:85-86 commented out); here they are a
first-class mode. These tests prove the full path works and that
separation matches a torch-oracle patch loop with copied weights.
"""

import numpy as np
import pytest
import torch

import jax

from vocal_remover_tpu.models.cascaded import CascadedNet
from vocal_remover_tpu.ops import stft as stft_ops
from vocal_remover_tpu.ops.windowing import make_padding
from vocal_remover_tpu.separate.separator import Separator


def synth_song(sr=8000, seconds=6.0):
    t = np.arange(int(sr * seconds)) / sr
    left = 0.5 * np.sin(2 * np.pi * 330 * t) + 0.2 * np.sin(
        2 * np.pi * 1130 * t
    )
    right = 0.4 * np.sin(2 * np.pi * 251 * t) + 0.1 * np.random.default_rng(
        5
    ).standard_normal(len(t))
    return np.stack([left, right]).astype(np.float32)


@pytest.fixture(scope="module")
def complex_pair(reference_lib):
    torch.manual_seed(11)
    tmod = reference_lib.nets.CascadedNet(256, 128, 8, 16, True)
    tmod.eval()
    jmod = CascadedNet(256, 128, 8, 16, is_complex=True)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    v = jmod.from_torch(sd)
    return tmod, jmod, v


@pytest.mark.reference
def test_complex_separate_matches_torch_patch_loop(complex_pair):
    """Our device pipeline (channel stacking, normalization, patch
    windowing, stitch, complex mask multiply) vs a hand-rolled numpy
    pipeline around the torch complex forward."""
    tmod, jmod, v = complex_pair
    wave = synth_song()
    X_spec = stft_ops.stft_np(wave, 256, 128)

    sp = Separator(jmod, v, batchsize=2, cropsize=256)
    y_ours, v_ours = sp.separate(X_spec)

    # oracle: same windowing contract, torch complex forward per patch
    n_frame = X_spec.shape[2]
    pad_l, pad_r, roi = make_padding(n_frame, 256, jmod.offset)
    n = (pad_l + n_frame + pad_r - 2 * jmod.offset) // roi
    n_bucket = -(-n // 2) * 2  # Separator rounds up to whole chunks
    pad_r += (n_bucket - n) * roi
    X_pad = np.pad(X_spec, ((0, 0), (0, 0), (pad_l, pad_r)))
    X_scaled = X_pad / np.abs(X_spec).max()
    chunks = []
    with torch.no_grad():
        for i in range(n_bucket):
            patch = X_scaled[:, :, i * roi : i * roi + 256]
            xt = torch.from_numpy(patch[None])
            m = tmod(xt).numpy()[0]  # complex (2, F, 256)
            chunks.append(m[:, :, jmod.offset : -jmod.offset])
    mask_ref = np.concatenate(chunks, axis=2)[:, :, :n_frame]

    y_ref = mask_ref * X_spec
    v_ref = X_spec - y_ref
    np.testing.assert_allclose(y_ours, y_ref, atol=2e-4)
    np.testing.assert_allclose(v_ours, v_ref, atol=2e-4)


def test_complex_wave_path_matches_spectrogram_path(complex_pair):
    _, jmod, v = complex_pair
    wave = synth_song()
    X_spec = stft_ops.stft_np(wave, 256, 128)

    sp = Separator(jmod, v, batchsize=2, cropsize=256)
    y_spec, v_spec = sp.separate(X_spec)
    y_ref = stft_ops.istft_np(y_spec, 256, 128, length=wave.shape[-1])
    v_ref = stft_ops.istft_np(v_spec, 256, 128, length=wave.shape[-1])

    y_wave, v_wave = sp.separate_wave(wave)
    np.testing.assert_allclose(y_wave, y_ref, atol=5e-4)
    np.testing.assert_allclose(v_wave, v_ref, atol=5e-4)
    # complex-mode invariant: v = X - y exactly (spectrogram domain)
    np.testing.assert_allclose(y_spec + v_spec, X_spec, atol=1e-5)


@pytest.mark.slow
def test_complex_train_checkpoint_separate_roundtrip(tmp_path):
    """--is_complex end-to-end: Trainer on re/im channel batches ->
    best-val checkpoint -> load_model restores is_complex -> separate."""
    from vocal_remover_tpu.models import convert
    from vocal_remover_tpu.train import checkpoint
    from vocal_remover_tpu.train.step import Trainer

    model = CascadedNet(256, 128, 4, 8, is_complex=True)
    variables = model.init(jax.random.PRNGKey(0))
    trainer = Trainer(model, variables, learning_rate=1e-3, dropout=False)

    rng = np.random.default_rng(0)
    wave = synth_song(seconds=12.0)
    X_spec = stft_ops.stft_np(wave, 256, 128)
    y_spec = X_spec * 0.5
    coef = np.abs(X_spec).max()

    def batch(start):
        Xc = X_spec[:, :, start : start + 256] / coef
        yc = y_spec[:, :, start : start + 256] / coef
        X4 = np.concatenate([Xc.real, Xc.imag]).astype(np.float32)
        y4 = np.concatenate([yc.real, yc.imag]).astype(np.float32)
        return X4[None], y4[None]

    batches = [batch(s) for s in (0, 64, 128)]
    l0 = trainer.train_epoch(batches)
    for _ in range(3):
        l1 = trainer.train_epoch(batches)
    assert np.isfinite(l1)
    assert l1 < l0  # mask learns toward 0.5

    path = str(tmp_path / "cx.vrt.npz")
    checkpoint.save_model(path, model, trainer)
    model2, v2 = convert.load_model(path, 9999, 9999, 1, 1)
    assert model2.is_complex and model2.n_fft == 256  # config wins

    sp = Separator(model2, v2, batchsize=2, cropsize=256)
    y_wave, v_wave = sp.separate_wave(wave)
    assert y_wave.shape == wave.shape
    assert np.isfinite(y_wave).all() and np.isfinite(v_wave).all()
    # residual invariant survives the wave path
    np.testing.assert_allclose(
        y_wave + v_wave,
        stft_ops.istft_np(X_spec, 256, 128, length=wave.shape[-1]),
        atol=1e-3,
    )


def test_complex_checkpoint_stream_flag_falls_back(tmp_path):
    """--stream with a complex checkpoint must not route to the
    magnitude-only StreamingSeparator (cli/inference.py guard): the
    monolithic complex path runs and writes both stems."""
    import os

    from vocal_remover_tpu.cli import inference as inf_cli
    from vocal_remover_tpu.models import convert
    from vocal_remover_tpu.utils import audio

    model = CascadedNet(256, 128, 4, 8, is_complex=True)
    variables = model.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "cx.vrt.npz")
    convert.save_native(ckpt, variables, convert.model_config(model))

    sr = 8000
    t = np.arange(sr * 4) / sr
    wave = np.stack([
        0.4 * np.sin(2 * np.pi * 220 * t),
        0.4 * np.sin(2 * np.pi * 330 * t),
    ]).astype(np.float32)
    song = str(tmp_path / "song.wav")
    audio.write_wav(song, wave, sr)

    out = str(tmp_path / "sep")
    inf_cli.main(["-P", ckpt, "-i", song, "-r", str(sr), "-f", "256",
                  "-H", "128", "-o", out, "--stream"])
    assert os.path.exists(os.path.join(out, "song_Instruments.wav"))
    assert os.path.exists(os.path.join(out, "song_Vocals.wav"))

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
    for name in ("cv2", "tqdm"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "tqdm":
                mod.tqdm = lambda x, *a, **k: x
            sys.modules[name] = mod
    import inference as ref_inference  # from /root/reference

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

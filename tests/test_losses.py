"""Loss functions vs the reference's torch implementations
(reference train.py:37-65 — dormant there, working code here)."""

import numpy as np
import pytest
import torch

from vocal_remover_tpu.train import losses


@pytest.fixture(scope="module")
def ref_losses(reference_lib):
    # the reference defines its losses inside train.py; import it with
    # the CLI guarded behind __main__ (safe to import)
    import importlib

    return importlib.import_module("train")


@pytest.mark.reference
def test_sdr_loss_matches(ref_losses, rng):
    y = rng.standard_normal((2, 2, 4000)).astype(np.float32)
    y_pred = (y + 0.3 * rng.standard_normal(y.shape)).astype(np.float32)
    ours = float(losses.sdr_loss(y, y_pred))
    theirs = float(
        ref_losses.sdr_loss(torch.from_numpy(y), torch.from_numpy(y_pred))
    )
    assert abs(ours - theirs) < 1e-5


@pytest.mark.reference
def test_weighted_sdr_loss_matches(ref_losses, rng):
    y = rng.standard_normal((1, 2, 3000)).astype(np.float32)
    n = rng.standard_normal(y.shape).astype(np.float32) * 0.5
    y_pred = y + 0.1 * n
    n_pred = n - 0.1 * n
    ours = float(losses.weighted_sdr_loss(y, y_pred, n, n_pred))
    theirs = float(
        ref_losses.weighted_sdr_loss(
            torch.from_numpy(y), torch.from_numpy(y_pred),
            torch.from_numpy(n), torch.from_numpy(n_pred),
        )
    )
    assert abs(ours - theirs) < 1e-5


@pytest.mark.reference
def test_to_wave_matches_torch_istft(ref_losses, rng):
    """Batched wave reconstruction == reference to_wave (train.py:37-43)."""
    n_fft, hop = 256, 128
    B, F, T = 2, 129, 40
    re = rng.standard_normal((B, 2, F, T)).astype(np.float32)
    im = rng.standard_normal((B, 2, F, T)).astype(np.float32)
    ours = np.asarray(losses.to_wave(re, im, n_fft, hop))
    window = torch.hann_window(n_fft)
    spec = torch.complex(torch.from_numpy(re), torch.from_numpy(im))
    theirs = ref_losses.to_wave(spec, n_fft, hop, window).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_mask_l1_loss(rng):
    mask = rng.uniform(0, 1, (2, 33, 16, 2)).astype(np.float32)
    X = np.abs(rng.standard_normal(mask.shape)).astype(np.float32)
    y = np.abs(rng.standard_normal(mask.shape)).astype(np.float32)
    ours = float(losses.mask_l1_loss(mask, X, y))
    assert abs(ours - np.abs(mask * X - y).mean()) < 1e-6


def _complex_batch(rng, n=8, F=33, T=160):
    yc = (rng.standard_normal((n, 2, F, T))
          + 1j * rng.standard_normal((n, 2, F, T))) * 0.4
    vc = (rng.standard_normal((n, 2, F, T))
          + 1j * rng.standard_normal((n, 2, F, T))) * 0.2
    Xc = yc + vc
    X = np.concatenate([Xc.real, Xc.imag], 1).astype(np.float32)
    y = np.concatenate([yc.real, yc.imag], 1).astype(np.float32)
    return X, y


@pytest.mark.parametrize("kind", ["sdr", "weighted_sdr"])
def test_wave_loss_trains(rng, kind):
    """The wave-domain losses WORK as training objectives: gradients
    flow through the device iSTFT (losses.to_wave) and the combined
    L1 + SDR loss decreases over real optimizer steps — the reference's
    commented-out intent at train.py:83-88 exercised live."""
    import jax

    from vocal_remover_tpu.models.cascaded import CascadedNet
    from vocal_remover_tpu.train.step import Trainer

    model = CascadedNet(64, 32, 4, 8, is_complex=True)
    variables = model.init(jax.random.PRNGKey(3))
    X, y = _complex_batch(rng)
    trainer = Trainer(model, variables, learning_rate=2e-3,
                      wave_loss=kind, wave_loss_weight=0.01,
                      dropout=False)

    # gradients through the iSTFT are finite and not identically zero
    loss0, grads = trainer.compute_grads(X[:4], y[:4])
    leaves = [np.asarray(g) for g in jax.tree_util.tree_leaves(grads)]
    assert np.isfinite(loss0)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    assert any(np.abs(g).max() > 0 for g in leaves)

    batches = [(X[i : i + 4], y[i : i + 4]) for i in range(0, len(X), 4)]
    first = trainer.train_epoch(batches)
    for _ in range(4):
        last = trainer.train_epoch(batches)
    assert np.isfinite(first) and last < first


def test_wave_loss_requires_complex():
    import jax
    import pytest as _pytest

    from vocal_remover_tpu.models.cascaded import CascadedNet
    from vocal_remover_tpu.train.step import Trainer

    model = CascadedNet(64, 32, 4, 8)
    variables = model.init(jax.random.PRNGKey(0))
    with _pytest.raises(ValueError, match="complex"):
        Trainer(model, variables, learning_rate=1e-3, wave_loss="sdr")

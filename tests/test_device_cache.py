"""Device-resident dataset (data/device_cache.py): batches and training
trajectories must match the host data path exactly (same per-item RNG
streams), augmentations must match the reference semantics, and the
mode must compose with the data-parallel mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vocal_remover_tpu.data import cache, dataset, pairing
from vocal_remover_tpu.data.device_cache import (
    DeviceLoader,
    DeviceTrainingSource,
)
from vocal_remover_tpu.data.loader import Loader
from vocal_remover_tpu.models.cascaded import CascadedNet
from vocal_remover_tpu.parallel import mesh as mesh_lib
from vocal_remover_tpu.train.step import Trainer
from vocal_remover_tpu.utils import audio


@pytest.fixture(scope="module")
def song_set(tmp_path_factory):
    """3 cached songs -> training_set [(X_path, y_path, coef)]."""
    tmp_path = tmp_path_factory.mktemp("device_cache_songs")
    mix = tmp_path / "mixtures"
    inst = tmp_path / "instruments"
    mix.mkdir()
    inst.mkdir()
    sr = 8000
    rng = np.random.default_rng(7)
    for i in range(3):
        t = np.arange(sr * 3) / sr
        y = 0.4 * np.sin(2 * np.pi * (200 + 60 * i) * t)
        v = 0.3 * np.sin(2 * np.pi * (900 + 90 * i) * t)
        v += 0.02 * rng.standard_normal(t.shape)
        stereo_y = np.stack([y, 0.9 * y]).astype(np.float32)
        stereo_x = stereo_y + np.stack([v, 1.1 * v]).astype(np.float32)
        audio.write_wav(str(mix / f"song{i}.wav"), stereo_x, sr)
        audio.write_wav(str(inst / f"song{i}.wav"), stereo_y, sr)
    pairs = pairing.make_pair(str(mix), str(inst))
    return cache.make_training_set(pairs, sr, 128, 256)


def test_source_rejects_unsupported(song_set):
    for kw in ({"mixup_rate": 0.5}, {"mono_rate": 0.2},
               {"is_complex": True}):
        with pytest.raises(ValueError):
            DeviceTrainingSource(song_set, cropsize=32, **kw)


def test_device_batches_match_host(song_set):
    """Same seeds => the device-materialized epoch equals the host
    (threaded fast-path) epoch batch for batch, across epochs."""
    host_ds = dataset.TrainingSet(
        song_set * 2, cropsize=32, reduction_rate=0, reduction_weight=None,
        mixup_rate=0, mixup_alpha=1, seed=3,
    )
    host_loader = Loader(host_ds, batchsize=4, shuffle=True,
                         num_workers=2, seed=11)
    src = DeviceTrainingSource(song_set * 2, cropsize=32, seed=3,
                               dtype=jnp.float32)
    dev_loader = DeviceLoader(src, batchsize=4, shuffle=True, seed=11)

    for _ in range(2):  # two epochs: epoch streams advance identically
        for (Xh, yh), idx_batch in zip(host_loader, dev_loader):
            Xd, yd = src.gather(*idx_batch)
            np.testing.assert_allclose(np.asarray(Xd), Xh, atol=1e-6)
            np.testing.assert_allclose(np.asarray(yd), yh, atol=1e-6)


def test_reduction_aug_matches_host(song_set):
    """Vocal-reduction on device (magnitude domain) == the host complex
    path followed by |.| (reference lib/dataset.py:49-57, 104-119)."""
    F = 129
    ramp = np.linspace(1, 0, F, dtype=np.float32)[:, None] * 0.4
    host_ds = dataset.TrainingSet(
        song_set, cropsize=32, reduction_rate=1.0, reduction_weight=ramp,
        mixup_rate=0, mixup_alpha=1, seed=5,
    )
    src = DeviceTrainingSource(song_set, cropsize=32, reduction_rate=1.0,
                               reduction_weight=ramp, seed=5,
                               dtype=jnp.float32)
    dev_loader = DeviceLoader(src, batchsize=3, shuffle=False, seed=0)
    for idx_batch in dev_loader:
        Xd, yd = src.gather(*idx_batch)
        for j in range(len(idx_batch[0])):
            Xh, yh = host_ds[j]
            np.testing.assert_allclose(np.asarray(Xd[j]), Xh, atol=2e-6)
            np.testing.assert_allclose(np.asarray(yd[j]), yh, atol=2e-6)
        break


def test_training_trajectory_matches_host(song_set):
    """Two epochs through the production Trainer: identical losses from
    the host path and the device-resident path."""
    model = CascadedNet(256, 128, 4, 8)
    variables = model.init(jax.random.PRNGKey(0))

    host_ds = dataset.TrainingSet(
        song_set, cropsize=160, reduction_rate=0, reduction_weight=None,
        mixup_rate=0, mixup_alpha=1, seed=3,
    )
    host_loader = Loader(host_ds, batchsize=2, shuffle=True,
                         num_workers=1, seed=11)
    t_host = Trainer(model, variables, learning_rate=1e-3, dropout=False,
                     prefetch=0)
    host_losses = [t_host.train_epoch(host_loader) for _ in range(2)]

    src = DeviceTrainingSource(song_set, cropsize=160, seed=3,
                               dtype=jnp.float32)
    dev_loader = DeviceLoader(src, batchsize=2, shuffle=True, seed=11)
    t_dev = Trainer(model, variables, learning_rate=1e-3, dropout=False)
    dev_losses = [t_dev.train_epoch_device(src, dev_loader)
                  for _ in range(2)]

    np.testing.assert_allclose(dev_losses, host_losses, atol=1e-5)


def test_device_cache_on_dp_mesh(song_set):
    """Device-resident training composes with data parallelism: one
    sharded fused step reproduces the single-device loss (single step —
    multi-step comparisons amplify sharded-reduction rounding through
    Adam, see test_sharding.py)."""
    model = CascadedNet(256, 128, 4, 8)
    variables = model.init(jax.random.PRNGKey(0))
    mesh = mesh_lib.make_mesh(n_data=2)

    losses = []
    for m in (None, mesh):
        src = DeviceTrainingSource(song_set * 2, cropsize=160, seed=3,
                                   dtype=jnp.float32, mesh=m)
        batch = next(iter(DeviceLoader(src, batchsize=4, shuffle=True,
                                       seed=11)))
        t = Trainer(model, variables, learning_rate=1e-3, dropout=False,
                    mesh=m)
        losses.append(t.train_epoch_device(src, [batch]))
    assert abs(losses[0] - losses[1]) < 1e-5


def test_device_validation_matches_host(song_set, tmp_path):
    """Device-resident validation == host validation loss (f32)."""
    from vocal_remover_tpu.data.device_cache import DeviceValidationSource

    X_path, _, _ = song_set[0]
    # reconstruct the (mix, inst) wav pairs from the cache paths
    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(X_path)))
    pairs = pairing.make_pair(os.path.join(root, "mixtures"),
                              os.path.join(root, "instruments"))
    patch_list = dataset.make_validation_set(
        pairs[:2], cropsize=160, sr=8000, hop_length=128, n_fft=256,
        offset=15, patch_root=str(tmp_path),
    )
    model = CascadedNet(256, 128, 4, 8)
    variables = model.init(jax.random.PRNGKey(0))
    t = Trainer(model, variables, learning_rate=1e-3, prefetch=0)

    host = t.validate_epoch(
        Loader(dataset.ValidationSet(patch_list), batchsize=3,
               shuffle=False, num_workers=2)
    )
    src = DeviceValidationSource(patch_list, dtype=jnp.float32)
    dev = t.validate_epoch_device(src, batchsize=3)
    np.testing.assert_allclose(dev, host, rtol=1e-6)

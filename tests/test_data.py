"""Data pipeline: cache layout, partial reads, augmentation semantics,
split/pairing, validation windows (reference lib/dataset.py)."""

import os

import numpy as np
import pytest

from vocal_remover_tpu.data import cache, dataset, pairing
from vocal_remover_tpu.data.loader import Loader
from vocal_remover_tpu.utils import audio


@pytest.fixture
def song_dir(tmp_path, rng):
    """Tiny dataset: 3 (mixture, instrumental) wav pairs."""
    mix = tmp_path / "mixtures"
    inst = tmp_path / "instruments"
    mix.mkdir()
    inst.mkdir()
    sr = 8000
    for i in range(3):
        t = np.arange(sr * 3) / sr
        y = 0.4 * np.sin(2 * np.pi * (200 + 50 * i) * t)
        v = 0.3 * np.sin(2 * np.pi * (900 + 100 * i) * t)
        stereo_y = np.stack([y, 0.9 * y]).astype(np.float32)
        stereo_x = stereo_y + np.stack([v, v]).astype(np.float32)
        audio.write_wav(str(mix / f"song{i}.wav"), stereo_x, sr)
        audio.write_wav(str(inst / f"song{i}.wav"), stereo_y, sr)
    return tmp_path, sr


def test_make_pair_and_split(song_dir):
    root, _ = song_dir
    pairs = pairing.make_pair(str(root / "mixtures"), str(root / "instruments"))
    assert len(pairs) == 3
    assert all(os.path.basename(a) == os.path.basename(b) for a, b in pairs)

    train, val = pairing.train_val_split(str(root), "random", 0.34, [])
    assert len(train) == 2 and len(val) == 1


def test_cache_or_load_roundtrip(song_dir):
    root, sr = song_dir
    pairs = pairing.make_pair(str(root / "mixtures"), str(root / "instruments"))
    X, y, xp, yp = cache.cache_or_load(pairs[0][0], pairs[0][1], sr, 128, 256)
    assert X.shape == y.shape
    assert X.shape[0] == 2 and X.shape[1] == 129
    assert os.path.exists(xp) and os.path.exists(yp)
    # cached layout is (T, 2, F) for row-chunk reads
    raw = np.load(xp)
    assert raw.shape == (X.shape[2], 2, 129)
    # second call: loads from cache, identical
    X2, _, _, _ = cache.cache_or_load(pairs[0][0], pairs[0][1], sr, 128, 256)
    np.testing.assert_array_equal(X, X2)


def test_partial_npy_read(song_dir):
    root, sr = song_dir
    pairs = pairing.make_pair(str(root / "mixtures"), str(root / "instruments"))
    _, _, xp, _ = cache.cache_or_load(pairs[0][0], pairs[0][1], sr, 128, 256)
    full = np.load(xp)
    assert cache.read_npy_shape(xp) == full.shape
    chunk = cache.read_npy_rows(xp, 10, 32)
    np.testing.assert_array_equal(chunk, full[10:42])


def test_training_set_items(song_dir):
    root, sr = song_dir
    pairs = pairing.make_pair(str(root / "mixtures"), str(root / "instruments"))
    tset = cache.make_training_set(pairs, sr, 128, 256)
    ds = dataset.TrainingSet(
        tset * 4, cropsize=64, reduction_rate=0.5,
        reduction_weight=np.linspace(1, 0, 129, dtype=np.float32)[:, None],
        mixup_rate=0.5, mixup_alpha=1.0, seed=1,
    )
    X, y = ds[0]
    assert X.shape == (2, 129, 64) and X.dtype == np.float32
    assert (X >= 0).all() and (y >= 0).all()  # magnitudes
    # normalization coef keeps values in a sane range
    assert X.max() <= 2.0


def test_aggressive_vocal_removal_reduces_target(song_dir, rng):
    ds = dataset.TrainingSet(
        [], cropsize=8, reduction_rate=1.0,
        reduction_weight=np.ones((5, 1), np.float32),
        mixup_rate=0, mixup_alpha=1,
    )
    X = (rng.standard_normal((2, 5, 8)) + 1j * rng.standard_normal((2, 5, 8)))
    y = X * 0.1  # y much quieter than X -> v dominates
    out = ds.aggressively_remove_vocal(X, y)
    assert np.abs(out).sum() <= np.abs(y).sum() + 1e-6
    # phase preserved where magnitude survives
    nz = np.abs(out) > 1e-9
    np.testing.assert_allclose(
        np.angle(out)[nz], np.angle(y)[nz], atol=1e-5
    )


def test_subdirs_split(tmp_path, rng):
    sr = 8000
    for sub in ("training", "validation"):
        for kind in ("mixtures", "instruments"):
            d = tmp_path / sub / kind
            d.mkdir(parents=True)
            w = (rng.standard_normal((2, sr)) * 0.2).astype(np.float32)
            audio.write_wav(str(d / "a.wav"), w, sr)
    train, val = pairing.train_val_split(str(tmp_path), "subdirs", 0.2, [])
    assert len(train) == 1 and len(val) == 1
    with pytest.raises(ValueError):
        pairing.train_val_split(str(tmp_path), "subdirs", 0.2, [("x", "y")])


def test_mono_aug(song_dir):
    root, sr = song_dir
    pairs = pairing.make_pair(str(root / "mixtures"), str(root / "instruments"))
    tset = cache.make_training_set(pairs, sr, 128, 256)
    ds = dataset.TrainingSet(
        tset, cropsize=16, reduction_rate=0, reduction_weight=None,
        mixup_rate=0, mixup_alpha=1, mono_rate=1.0,
    )
    X, y = ds[0]
    np.testing.assert_allclose(X[0], X[1], atol=1e-6)  # forced mono


def test_validation_set(song_dir, tmp_path):
    root, sr = song_dir
    pairs = pairing.make_pair(str(root / "mixtures"), str(root / "instruments"))
    patches = dataset.make_validation_set(
        pairs[:1], cropsize=64, sr=sr, hop_length=128, n_fft=256, offset=16,
        patch_root=str(tmp_path / "val"),
    )
    assert len(patches) > 0
    vs = dataset.ValidationSet(patches)
    X, y = vs[0]
    assert X.shape == (2, 129, 64)


def test_loader_shapes_and_shuffle(song_dir):
    root, sr = song_dir
    pairs = pairing.make_pair(str(root / "mixtures"), str(root / "instruments"))
    tset = cache.make_training_set(pairs, sr, 128, 256)
    ds = dataset.TrainingSet(
        tset * 4, cropsize=32, reduction_rate=0,
        reduction_weight=None, mixup_rate=0, mixup_alpha=1,
    )
    loader = Loader(ds, batchsize=5, shuffle=True, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == len(loader)
    assert batches[0][0].shape == (5, 2, 129, 32)
    total = sum(len(b[0]) for b in batches)
    assert total == 12


def test_loader_propagates_worker_errors():
    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

    loader = Loader(Bad(), batchsize=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_loader_determinism_across_worker_counts(song_dir):
    """Same seed => identical epoch batches for any num_workers: item
    randomness is a pure function of (seed, epoch, idx), never shared
    generator state (the torch-DataLoader analog can't promise this)."""
    root, sr = song_dir
    pairs = pairing.make_pair(str(root / "mixtures"), str(root / "instruments"))
    tset = cache.make_training_set(pairs, sr, 128, 256)

    def epochs(num_workers, n_epochs=2):
        ds = dataset.TrainingSet(
            tset * 4, cropsize=32, reduction_rate=0.5,
            reduction_weight=np.linspace(1, 0, 129,
                                         dtype=np.float32)[:, None],
            mixup_rate=0.5, mixup_alpha=1.0, seed=7,
        )
        loader = Loader(ds, batchsize=5, shuffle=True,
                        num_workers=num_workers, seed=7)
        return [list(loader) for _ in range(n_epochs)]

    a, b = epochs(1), epochs(4)
    for ep_a, ep_b in zip(a, b):
        assert len(ep_a) == len(ep_b)
        for (Xa, ya), (Xb, yb) in zip(ep_a, ep_b):
            np.testing.assert_array_equal(Xa, Xb)
            np.testing.assert_array_equal(ya, yb)
    # epochs see different draws
    assert not np.array_equal(a[0][0][0], a[1][0][0])


def test_fast_path_matches_general_path(song_dir):
    """The native/magnitude fast path must produce the same items as the
    general complex path (same rng draw order, same values)."""
    root, sr = song_dir
    pairs = pairing.make_pair(str(root / "mixtures"), str(root / "instruments"))
    tset = cache.make_training_set(pairs, sr, 128, 256)
    ds = dataset.TrainingSet(
        tset * 2, cropsize=32, reduction_rate=0, reduction_weight=None,
        mixup_rate=0, mixup_alpha=1, seed=3,
    )
    items_fast = [ds[i] for i in range(len(ds.training_set))]
    # force the general path by a reduction_rate that never fires but
    # disables the fast path
    ds2 = dataset.TrainingSet(
        tset * 2, cropsize=32, reduction_rate=-1.0, reduction_weight=None,
        mixup_rate=0, mixup_alpha=1, seed=3,
    )
    for i, (Xf, yf) in enumerate(items_fast):
        Xg, yg = ds2[i]
        np.testing.assert_allclose(Xf, Xg, atol=1e-6)
        np.testing.assert_allclose(yf, yg, atol=1e-6)


def test_get_oracle_data(rng):
    X = rng.standard_normal((10, 3))
    y = rng.standard_normal((10, 3))
    loss = np.arange(10.0)
    ox, oy, idx = dataset.get_oracle_data(X, y, loss, 0.4, 0.2, rng)
    assert len(ox) == 4
    assert set(idx).issubset(set(range(5, 10)))  # top-5 by loss


def test_loader_resume_continues_stream(song_dir):
    """set_epoch(e) reproduces exactly the batches an uninterrupted run
    yields at epoch e (both shuffle order and per-item draws are pure
    functions of (seed, epoch)) — the --resume contract."""
    root, sr = song_dir
    pairs = pairing.make_pair(str(root / "mixtures"), str(root / "instruments"))
    tset = cache.make_training_set(pairs, sr, 128, 256)

    def make():
        ds = dataset.TrainingSet(
            tset * 2, cropsize=32, reduction_rate=0, reduction_weight=None,
            mixup_rate=0, mixup_alpha=1, seed=3,
        )
        return Loader(ds, batchsize=2, shuffle=True, num_workers=2, seed=9)

    full = make()
    for _ in range(2):  # consume epochs 0, 1
        list(full)
    epoch2 = [b for b in full]

    resumed = make()
    resumed.set_epoch(2)
    epoch2_resumed = [b for b in resumed]

    assert len(epoch2) == len(epoch2_resumed)
    for (Xa, ya), (Xb, yb) in zip(epoch2, epoch2_resumed):
        np.testing.assert_array_equal(Xa, Xb)
        np.testing.assert_array_equal(ya, yb)

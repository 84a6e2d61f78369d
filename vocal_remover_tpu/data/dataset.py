"""Training/validation datasets with on-the-fly augmentation.

Capability-parity with reference lib/dataset.py:15-141 — random time
crops via partial .npy reads, per-song normalization, the augmentation
set (vocal-reduction, channel swap, instrumental-as-mixture, mixup) with
the same probabilities/distributions — reorganized as plain-Python
samplers (no torch DataLoader): a `Loader` (loader.py) drives them with
worker threads and feeds jitted device steps.

Each dataset instance owns a numpy Generator seeded explicitly, so runs
are reproducible without global RNG state.
"""

from __future__ import annotations

import numpy as np

from vocal_remover_tpu.data import cache
from vocal_remover_tpu.ops.windowing import make_padding

__all__ = ["TrainingSet", "ValidationSet", "make_validation_set"]


class TrainingSet:
    """Map-style dataset over `training_set * patches` entries.

    Items are (X_mag, y_mag) float32 arrays of shape (2, F, cropsize)
    (reference lib/dataset.py:104-119).
    """

    def __init__(self, training_set, cropsize, reduction_rate,
                 reduction_weight, mixup_rate, mixup_alpha, seed=0,
                 is_complex=False, mono_rate=0.0,
                 complex_as_channels=True):
        self.training_set = training_set
        self.cropsize = cropsize
        self.reduction_rate = reduction_rate
        self.reduction_weight = reduction_weight
        self.mixup_rate = mixup_rate
        self.mixup_alpha = mixup_alpha
        self.is_complex = is_complex
        # device transfers can't carry complex dtypes: stack re/im as
        # channels (N, 4, F, T) for the complex training mode
        self.complex_as_channels = complex_as_channels
        # mono-mix augmentation: dormant in the reference (commented out
        # at lib/dataset.py:81-83); carried here as a real option
        self.mono_rate = mono_rate
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.training_set)

    def do_crop(self, X_path, y_path):
        n_frames = cache.read_npy_shape(X_path)[0]
        start = int(self.rng.integers(0, n_frames - self.cropsize))
        X = cache.read_npy_rows(X_path, start, self.cropsize)
        y = cache.read_npy_rows(y_path, start, self.cropsize)
        # (T, 2, F) rows -> (2, F, T)
        return X.transpose(1, 2, 0), y.transpose(1, 2, 0)

    def aggressively_remove_vocal(self, X, y):
        """Estimate vocal magnitude v = max(|X|-|y|, 0) gated by v > |y|
        and subtract `v * reduction_weight` from |y|, keeping y's phase
        (reference lib/dataset.py:49-57)."""
        X_mag = np.abs(X)
        y_mag = np.abs(y)
        v_mag = X_mag - y_mag
        v_mag *= v_mag > y_mag
        y_mag = np.clip(y_mag - v_mag * self.reduction_weight, 0, np.inf)
        return y_mag * np.exp(1.0j * np.angle(y))

    def do_aug(self, X, y):
        if self.rng.uniform() < self.reduction_rate:
            y = self.aggressively_remove_vocal(X, y)

        if self.rng.uniform() < 0.5:  # stereo channel swap
            X = X[::-1].copy()
            y = y[::-1].copy()

        if self.rng.uniform() < 0.01:  # instrumental as mixture
            X = y.copy()

        if self.mono_rate > 0 and self.rng.uniform() < self.mono_rate:
            X = np.broadcast_to(X.mean(axis=0, keepdims=True), X.shape).copy()
            y = np.broadcast_to(y.mean(axis=0, keepdims=True), y.shape).copy()

        return X, y

    def do_mixup(self, X, y):
        idx = int(self.rng.integers(0, len(self)))
        X_path, y_path, coef = self.training_set[idx]
        X_i, y_i = self.do_crop(X_path, y_path)
        X_i = X_i / coef
        y_i = y_i / coef
        X_i, y_i = self.do_aug(X_i, y_i)

        lam = self.rng.beta(self.mixup_alpha, self.mixup_alpha)
        X = lam * X + (1 - lam) * X_i
        y = lam * y + (1 - lam) * y_i
        return X, y

    def __getitem__(self, idx):
        X_path, y_path, coef = self.training_set[idx % len(self.training_set)]
        X, y = self.do_crop(X_path, y_path)
        X = X / coef
        y = y / coef
        X, y = self.do_aug(X, y)
        if self.rng.uniform() < self.mixup_rate:
            X, y = self.do_mixup(X, y)

        if self.is_complex:
            if self.complex_as_channels:
                return (
                    np.concatenate([X.real, X.imag]).astype(np.float32),
                    np.concatenate([y.real, y.imag]).astype(np.float32),
                )
            return X, y
        return np.abs(X).astype(np.float32), np.abs(y).astype(np.float32)


class ValidationSet:
    """Fixed validation windows persisted as .npz patches
    (reference lib/dataset.py:123-141)."""

    def __init__(self, patch_list, is_complex=False):
        self.patch_list = patch_list
        self.is_complex = is_complex

    def __len__(self):
        return len(self.patch_list)

    def __getitem__(self, idx):
        data = np.load(self.patch_list[idx])
        X, y = data["X"], data["y"]
        if self.is_complex:
            return X, y
        return np.abs(X).astype(np.float32), np.abs(y).astype(np.float32)


def make_validation_set(filelist, cropsize, sr, hop_length, n_fft, offset,
                        patch_root=".", progress=lambda it: it):
    """Persist per-song fixed windows to
    `cs{}_sr{}_hl{}_nf{}_of{}/` .npz files (reference
    lib/dataset.py:220-248); returns the patch path list."""
    import os

    patch_list = []
    patch_dir = os.path.join(
        patch_root,
        "cs{}_sr{}_hl{}_nf{}_of{}".format(cropsize, sr, hop_length, n_fft,
                                          offset),
    )
    os.makedirs(patch_dir, exist_ok=True)

    for X_path, y_path in progress(filelist):
        basename = os.path.splitext(os.path.basename(X_path))[0]
        X, y, _, _ = cache.cache_or_load(X_path, y_path, sr, hop_length, n_fft)
        coef = np.max([np.abs(X).max(), np.abs(y).max()])
        X, y = X / coef, y / coef

        left, right, roi_size = make_padding(X.shape[2], cropsize, offset)
        X_pad = np.pad(X, ((0, 0), (0, 0), (left, right)))
        y_pad = np.pad(y, ((0, 0), (0, 0), (left, right)))

        len_dataset = int(np.ceil(X.shape[2] / roi_size))
        for j in range(len_dataset):
            outpath = os.path.join(patch_dir, f"{basename}_p{j}.npz")
            start = j * roi_size
            if not os.path.exists(outpath):
                np.savez(
                    outpath,
                    X=X_pad[:, :, start : start + cropsize],
                    y=y_pad[:, :, start : start + cropsize],
                )
            patch_list.append(outpath)

    return patch_list


def get_oracle_data(X, y, oracle_loss, oracle_rate, oracle_drop_rate, rng):
    """Hard-example mining: top-k by loss, random n of those (reference
    lib/dataset.py:251-259; defined-but-unused there — exposed here as a
    real API for curriculum experiments)."""
    k = int(len(X) * oracle_rate * (1 / (1 - oracle_drop_rate)))
    n = int(len(X) * oracle_rate)
    indices = np.argsort(oracle_loss)[::-1][:k]
    indices = rng.choice(indices, n, replace=False)
    return X[indices].copy(), y[indices].copy(), indices

"""Device-resident training data: crops + augmentation on the TPU.

The host data path (dataset.py + loader.py) re-reads random crops from
disk and ships megabytes of spectrogram per step — the right design
when the dataset dwarfs HBM. But the flagship workload (MUSDB18-scale:
~100 songs x ~40 MB of bf16 magnitudes) FITS on one chip, and then the
TPU-native design is to keep the whole dataset resident in HBM and run
the per-step work — random crop, vocal-reduction, channel swap,
instrumental-as-mixture — inside the jitted step. Per-step
host->device traffic drops from ~8 MB of batch to ~100 BYTES of int32
indices/flags, and the 1-core host does no per-step array work at all.

Capability notes (reference lib/dataset.py:49-119 is the contract):
  * reduction / channel-swap / instrumental-as-mixture are EXACT in the
    magnitude domain (aggressively_remove_vocal modifies |y| and
    re-attaches y's phase, which the magnitude path then discards —
    reference lib/dataset.py:49-57, 104-119).
  * mixup and the mono aug combine COMPLEX spectrograms before the
    final |.| (reference lib/dataset.py:88-102), so they cannot be
    reproduced from resident magnitudes — requesting them raises, and
    callers fall back to the host path.
  * Randomness uses the SAME per-item (seed, epoch, idx) streams as
    TrainingSet, so toggling the device cache never changes which
    crops/augmentations a run sees: device-mode batches equal host-mode
    batches bit-for-bit at float32 (see tests/test_device_cache.py).
"""

from __future__ import annotations

import numpy as np

from vocal_remover_tpu.data import cache


def _gather_batch(X_all, y_all, rweight, starts, reduct, swap, inst,
                  cropsize):
    """Jit-traceable batch materialization from resident spectrograms.

    X_all/y_all: (2, F, total_T) magnitudes (any float dtype); starts:
    int32 (B,) absolute crop starts; reduct/swap/inst: bool (B,) aug
    flags; rweight: (F, 1) reduction ramp. Returns (B, 2, F, cropsize)
    float32 NCHW batches (the Trainer's host-batch layout).
    """
    import jax
    import jax.numpy as jnp

    F = X_all.shape[1]

    def one(s, rd, sw, ins):
        X = jax.lax.dynamic_slice(
            X_all, (0, 0, s), (2, F, cropsize)
        ).astype(jnp.float32)
        y = jax.lax.dynamic_slice(
            y_all, (0, 0, s), (2, F, cropsize)
        ).astype(jnp.float32)
        # vocal reduction (reference lib/dataset.py:49-57): estimate
        # vocal magnitude v = max(|X|-|y|, 0) gated by v > |y|, subtract
        # v * ramp from |y|
        v = jnp.maximum(X - y, 0.0)
        v = v * (v > y)
        y = jnp.where(rd, jnp.maximum(y - v * rweight, 0.0), y)
        # stereo channel swap (p=0.5), then instrumental-as-mixture
        # (p=0.01) — same order as the host path (dataset.py:98-113)
        X = jnp.where(sw, X[::-1], X)
        y = jnp.where(sw, y[::-1], y)
        X = jnp.where(ins, y, X)
        return X, y

    return jax.vmap(one)(starts, reduct, swap, inst)


# bytes claimed by resident sources this process (train + validation
# sources are checked jointly; never decremented — sources live for the
# whole training run)
_RESIDENT_BYTES = 0


def _check_hbm_fit(nbytes: int, frac: float = 0.6):
    """Fail fast with a clear message when the resident datasets would
    not leave room for the model + activations (the host path is the
    fallback for datasets that outgrow HBM). Counts ALL sources built
    in this process, so a train corpus and a validation corpus that fit
    individually still trip the guard jointly."""
    global _RESIDENT_BYTES
    import jax

    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
    except Exception:
        limit = None
    total = _RESIDENT_BYTES + nbytes
    if limit and total > frac * limit:
        raise ValueError(
            f"device-resident datasets need {total / 1e9:.2f} GB "
            f"({nbytes / 1e9:.2f} GB for this one) but the device "
            f"reports {limit / 1e9:.2f} GB HBM; drop "
            "--device_data_cache (host data path streams from disk) or "
            "use the bf16 resident dtype"
        )
    _RESIDENT_BYTES += nbytes


class DeviceTrainingSource:
    """All songs' normalized magnitude spectrograms resident on device.

    Drop-in sibling of dataset.TrainingSet for the magnitude path:
    same item count, same per-item randomness, but items materialize on
    the TPU. Use with Trainer.train_epoch_device + DeviceLoader.
    """

    def __init__(self, training_set, cropsize, reduction_rate=0.0,
                 reduction_weight=None, mixup_rate=0.0, mono_rate=0.0,
                 is_complex=False, seed=0, dtype=None, mesh=None,
                 _mags=None):
        if is_complex:
            raise ValueError(
                "device-resident data holds magnitudes; complex-mask "
                "training needs the host path (TrainingSet)"
            )
        if mixup_rate != 0 or mono_rate != 0:
            raise ValueError(
                "mixup/mono augmentations combine complex spectrograms "
                "(reference lib/dataset.py:88-102) and cannot run on "
                "resident magnitudes — use the host path (TrainingSet)"
            )
        import jax
        import jax.numpy as jnp

        if dtype is None:
            dtype = jnp.bfloat16
        self.cropsize = int(cropsize)
        self.reduction_rate = float(reduction_rate)
        self.seed = seed
        self.mesh = mesh
        self._epoch = 0
        self.training_set = training_set

        if not training_set:
            # the host path inherits the reference's quirk of silently
            # iterating zero batches when int(n_songs * val_rate) == 0
            # sweeps everything into val (reference dataset.py:177-180);
            # a resident dataset with no songs is more useful as an error
            raise ValueError(
                "device-resident dataset: the training filelist is "
                "empty (check --val_rate / --split_mode)"
            )
        if _mags is not None:  # from_magnitudes path
            songs_mags, item_song = _mags
        else:
            # dedupe songs (the CLI passes training_set * patches); map
            # each item slot to its unique-song slot
            uniq: dict[str, int] = {}
            item_song = []
            songs = []
            for X_path, y_path, coef in training_set:
                if X_path not in uniq:
                    uniq[X_path] = len(songs)
                    songs.append((X_path, y_path, float(coef)))
                item_song.append(uniq[X_path])
            # load every song once: (T, 2, F) complex rows -> normalized
            # (2, F, T) magnitudes. Same kernel as the host fast path
            # (native |z|/coef, numpy fallback) so resident values are
            # BIT-identical to host-path crops — toggling the device
            # cache never perturbs a training trajectory.
            from vocal_remover_tpu import native

            songs_mags = []
            for X_path, y_path, coef in songs:
                n_frames = cache.read_npy_shape(X_path)[0]
                X = native.load_crop_abs(X_path, 0, n_frames, coef)
                y = None
                if X is not None:
                    y = native.load_crop_abs(y_path, 0, n_frames, coef)
                if X is None or y is None:
                    X = (np.abs(np.load(X_path)).transpose(1, 2, 0)
                         / coef).astype(np.float32)
                    y = (np.abs(np.load(y_path)).transpose(1, 2, 0)
                         / coef).astype(np.float32)
                songs_mags.append((X, y))
        self._item_song = np.asarray(item_song, np.int64)

        # zero-pad each song's tail to >= cropsize (matching
        # TrainingSet's short-song padding), concatenate along time
        mags_X, mags_y, offsets, lengths = [], [], [], []
        pos = 0
        for X, y in songs_mags:
            n_frames = X.shape[2]
            if n_frames < self.cropsize:
                pad = ((0, 0), (0, 0), (0, self.cropsize - n_frames))
                X = np.pad(X, pad)
                y = np.pad(y, pad)
            mags_X.append(X)
            mags_y.append(y)
            offsets.append(pos)
            lengths.append(n_frames)
            pos += X.shape[2]
        self._song_offset = np.asarray(offsets, np.int64)
        self._song_frames = np.asarray(lengths, np.int64)

        X_all = np.concatenate(mags_X, axis=2)
        y_all = np.concatenate(mags_y, axis=2)
        self.nbytes = X_all.size * np.dtype(dtype).itemsize * 2
        if reduction_weight is None:
            reduction_weight = np.zeros((X_all.shape[1], 1), np.float32)
        rw = np.asarray(reduction_weight, np.float32).reshape(-1, 1)

        _check_hbm_fit(self.nbytes)
        put = jax.device_put
        if mesh is not None:
            from vocal_remover_tpu.parallel import mesh as mesh_lib

            rep = mesh_lib.replicated(mesh)
            put = lambda a: jax.device_put(a, rep)  # noqa: E731
        self.X_all = put(jnp.asarray(X_all, dtype))
        self.y_all = put(jnp.asarray(y_all, dtype))
        self.rweight = put(jnp.asarray(rw))

    @classmethod
    def from_magnitudes(cls, songs_mags, cropsize, patches=1, **kw):
        """Build from in-memory [(X_mag, y_mag)] pairs of (2, F, T)
        float32 arrays (already normalized) — synthetic data / benches.
        `patches` repeats the item list like the CLI's
        `training_set * patches`."""
        n = len(songs_mags)
        item_song = [i % n for i in range(n * patches)]
        return cls(
            training_set=[None] * (n * patches), cropsize=cropsize,
            _mags=(songs_mags, item_song), **kw,
        )

    def __len__(self):
        return len(self.training_set)

    def set_epoch(self, epoch: int):
        self._epoch = int(epoch)

    def _item_rng(self, idx: int) -> np.random.Generator:
        # identical stream to dataset.TrainingSet._item_rng
        return np.random.default_rng((0x5EED, self.seed, self._epoch, idx))

    def index_batch(self, idxs):
        """Host-side randomness for a batch: absolute crop starts + aug
        flags, drawn in the same order/count as TrainingSet.__getitem__
        (crop, reduction, swap, inst, mixup draws)."""
        B = len(idxs)
        starts = np.empty(B, np.int32)
        reduct = np.empty(B, bool)
        swap = np.empty(B, bool)
        inst = np.empty(B, bool)
        for j, idx in enumerate(idxs):
            rng = self._item_rng(int(idx))
            song = self._item_song[int(idx) % len(self._item_song)]
            n_frames = self._song_frames[song]
            span = max(n_frames - self.cropsize, 1)
            start = int(rng.integers(0, span))
            if n_frames <= self.cropsize:
                start = 0
            starts[j] = self._song_offset[song] + start
            reduct[j] = rng.uniform() < self.reduction_rate
            swap[j] = rng.uniform() < 0.5
            inst[j] = rng.uniform() < 0.01
            rng.uniform()  # mixup draw (gated off; keeps streams aligned)
        return starts, reduct, swap, inst

    def gather(self, starts, reduct, swap, inst):
        """Materialize a batch on device -> (X, y) f32 (B, 2, F, crop)."""
        import functools

        import jax

        fn = getattr(self, "_gather_jit", None)
        if fn is None:
            fn = jax.jit(
                functools.partial(_gather_batch, cropsize=self.cropsize)
            )
            self._gather_jit = fn
        if self.mesh is not None:
            from vocal_remover_tpu.parallel import mesh as mesh_lib

            starts, reduct, swap, inst = mesh_lib.shard_batch(
                self.mesh, starts, reduct, swap, inst
            )
        return fn(self.X_all, self.y_all, self.rweight,
                  starts, reduct, swap, inst)


class DeviceValidationSource:
    """Fixed validation windows resident on device.

    The host path re-uploads every validation patch each epoch
    (dataset.ValidationSet + Loader); for corpora that fit in HBM the
    patches are uploaded once and epochs slice them in place. Magnitude
    mode only (same gate as DeviceTrainingSource).
    """

    def __init__(self, patch_list, is_complex=False, dtype=None,
                 mesh=None):
        if is_complex:
            raise ValueError(
                "device-resident validation holds magnitudes; complex "
                "mode needs the host path (ValidationSet)"
            )
        import jax
        import jax.numpy as jnp

        if dtype is None:
            dtype = jnp.bfloat16
        Xs, ys = [], []
        for p in patch_list:
            data = np.load(p)
            Xs.append(np.abs(data["X"]).astype(np.float32))
            ys.append(np.abs(data["y"]).astype(np.float32))
        X = np.stack(Xs) if Xs else np.zeros((0, 2, 1, 1), np.float32)
        y = np.stack(ys) if ys else np.zeros((0, 2, 1, 1), np.float32)
        self.nbytes = X.size * np.dtype(dtype).itemsize * 2
        _check_hbm_fit(self.nbytes)
        put = jax.device_put
        if mesh is not None:
            from vocal_remover_tpu.parallel import mesh as mesh_lib

            rep = mesh_lib.replicated(mesh)
            put = lambda a: jax.device_put(a, rep)  # noqa: E731
        self.X = put(jnp.asarray(X, dtype))
        self.y = put(jnp.asarray(y, dtype))

    def __len__(self):
        return int(self.X.shape[0])

    def batches(self, batchsize: int):
        """(X_slice, y_slice, n) device batches, in order (validation
        is deterministic — reference train.py:269 shuffle=False)."""
        n = len(self)
        for i in range(0, n, batchsize):
            j = min(i + batchsize, n)
            yield self.X[i:j], self.y[i:j], j - i


class DeviceLoader:
    """Epoch iterator over a DeviceTrainingSource: yields
    (starts, reduct, swap, inst) index batches with Loader-compatible
    shuffle/epoch semantics (loader.py)."""

    def __init__(self, source, batchsize, shuffle=True, seed=0,
                 drop_last=False):
        self.source = source
        self.batchsize = batchsize
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self._epoch = 0

    def set_epoch(self, epoch: int):
        """Position at `epoch` (resume support) — same per-epoch
        derived order as Loader.set_epoch."""
        self._epoch = int(epoch)

    def __len__(self):
        n = len(self.source)
        if self.drop_last:
            return n // self.batchsize
        return -(-n // self.batchsize)

    def __iter__(self):
        epoch = self._epoch
        self.source.set_epoch(epoch)
        self._epoch += 1
        n = len(self.source)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng((0x0BD5, self.seed, epoch)).shuffle(order)
        for i in range(0, n, self.batchsize):
            b = order[i : i + self.batchsize]
            if self.drop_last and len(b) < self.batchsize:
                return
            yield self.source.index_batch(b)

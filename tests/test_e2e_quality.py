"""End-to-end learning proof: the full loop (dataset -> cache -> loader
-> jitted training -> checkpoint -> Separator) must actually learn to
separate a synthetic mixture — SDR after training beats the untrained
model by a clear margin."""

import numpy as np
import pytest
import jax

from vocal_remover_tpu.data import cache, dataset, pairing
from vocal_remover_tpu.data.loader import Loader
from vocal_remover_tpu.models.cascaded import CascadedNet
from vocal_remover_tpu.ops.stft import stft_np
from vocal_remover_tpu.separate.separator import Separator
from vocal_remover_tpu.train import metrics
from vocal_remover_tpu.train.step import Trainer
from vocal_remover_tpu.utils import audio


SR = 8000
N_FFT, HOP = 256, 128


def _make_dataset(root, rng, n_songs=4, seconds=16):
    mix = root / "mixtures"
    inst = root / "instruments"
    mix.mkdir()
    inst.mkdir()
    t = np.arange(SR * seconds) / SR
    for i in range(n_songs):
        # instruments: low-frequency tones; vocals: high-frequency tones
        inst_w = 0.35 * np.sin(2 * np.pi * (150 + 30 * i) * t) + \
            0.2 * np.sin(2 * np.pi * (420 + 25 * i) * t)
        voc_w = 0.3 * np.sin(2 * np.pi * (1900 + 110 * i) * t + i)
        y = np.stack([inst_w, 0.9 * inst_w]).astype(np.float32)
        x = y + np.stack([voc_w, voc_w]).astype(np.float32)
        audio.write_wav(str(mix / f"s{i}.wav"), x, SR)
        audio.write_wav(str(inst / f"s{i}.wav"), y, SR)
    return pairing.make_pair(str(mix), str(inst))


def _separate_sdr(model, variables, wave, inst_ref):
    sp = Separator(model, variables, batchsize=2, cropsize=256)
    y_est, _ = sp.separate_wave(wave)
    return metrics.sdr(inst_ref, y_est)


@pytest.mark.slow
def test_training_improves_sdr(tmp_path, rng):
    pairs = _make_dataset(tmp_path, rng)
    tset = cache.make_training_set(pairs, SR, HOP, N_FFT)

    model = CascadedNet(N_FFT, HOP, 4, 8)
    init_vars = model.init(jax.random.PRNGKey(0))

    ds = dataset.TrainingSet(
        tset * 6, cropsize=256, reduction_rate=0, reduction_weight=None,
        mixup_rate=0, mixup_alpha=1, seed=0,
    )
    loader = Loader(ds, batchsize=4, shuffle=True, num_workers=2, seed=0)

    trainer = Trainer(model, init_vars, learning_rate=2e-3)
    losses = [trainer.train_epoch(loader) for _ in range(6)]
    assert losses[-1] < losses[0] * 0.7, losses

    # fresh eval song from the same distribution
    t = np.arange(SR * 8) / SR
    inst_w = np.stack([
        0.35 * np.sin(2 * np.pi * 165 * t),
        0.3 * np.sin(2 * np.pi * 165 * t),
    ]).astype(np.float32)
    voc_w = 0.3 * np.sin(2 * np.pi * 1950 * t).astype(np.float32)
    wave = inst_w + np.stack([voc_w, voc_w])

    sdr_before = _separate_sdr(model, init_vars, wave, inst_w)
    sdr_after = _separate_sdr(model, trainer.variables, wave, inst_w)
    assert sdr_after > sdr_before + 3.0, (sdr_before, sdr_after)
    assert sdr_after > 5.0, sdr_after

"""CLI surface integration tests: inference end-to-end on a tiny wav,
train --debug smoke on a synthetic dataset, converter CLI paths,
augment/pseudo flows. All run the real entry points in-process."""

import json
import os

import numpy as np
import pytest
import jax

from vocal_remover_tpu.models import CascadedNet, convert
from vocal_remover_tpu.utils import audio


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """A small random-weight native checkpoint + its model config."""
    td = tmp_path_factory.mktemp("ckpt")
    model = CascadedNet(256, 128, 8, 16)
    variables = model.init(jax.random.PRNGKey(0))
    path = str(td / "model.vrt.npz")
    convert.save_native(path, variables, convert.model_config(model))
    return path


@pytest.fixture
def song(tmp_path):
    sr = 44100
    t = np.arange(sr * 4) / sr
    w = np.stack([
        0.5 * np.sin(2 * np.pi * 440 * t),
        0.4 * np.sin(2 * np.pi * 220 * t),
    ]).astype(np.float32)
    p = str(tmp_path / "song.wav")
    audio.write_wav(p, w, sr)
    return p, w, sr


def test_inference_cli_fast_path(tiny_ckpt, song, tmp_path):
    from vocal_remover_tpu.cli.inference import main

    path, w, sr = song
    out = str(tmp_path / "out")
    main([
        "-i", path, "-P", tiny_ckpt, "-f", "256", "-H", "128",
        "-o", out, "-B", "2",
    ])
    inst, sr2 = audio.read_wav(os.path.join(out, "song_Instruments.wav"))
    voc, _ = audio.read_wav(os.path.join(out, "song_Vocals.wav"))
    assert sr2 == sr and inst.shape == w.shape
    # energy conservation: instruments + vocals ~= original (mask sums
    # to 1); iSTFT attenuates the first/last half-window, so compare
    # the interior (the reference behaves identically there)
    n_fft = 256
    np.testing.assert_allclose(
        (inst + voc)[:, n_fft:-n_fft], w[:, n_fft:-n_fft], atol=5e-3
    )


def test_inference_cli_postprocess_tta_image(tiny_ckpt, song, tmp_path):
    from vocal_remover_tpu.cli.inference import main

    path, w, sr = song
    out = str(tmp_path / "out2")
    main([
        "-i", path, "-P", tiny_ckpt, "-f", "256", "-H", "128",
        "-o", out, "-B", "2", "--tta", "--postprocess", "--output_image",
    ])
    assert os.path.exists(os.path.join(out, "song_Instruments.wav"))
    assert os.path.exists(os.path.join(out, "song_Instruments.jpg"))
    assert os.path.exists(os.path.join(out, "song_Vocals.jpg"))


def test_inference_cli_stream(tiny_ckpt, song, tmp_path):
    from vocal_remover_tpu.cli.inference import main

    path, w, sr = song
    out = str(tmp_path / "stream_out")
    main([
        "-i", path, "-P", tiny_ckpt, "-f", "256", "-H", "128",
        "-o", out, "-B", "2", "--stream",
    ])
    inst, _ = audio.read_wav(os.path.join(out, "song_Instruments.wav"))
    voc, _ = audio.read_wav(os.path.join(out, "song_Vocals.wav"))
    assert inst.shape == w.shape
    n_fft = 256
    np.testing.assert_allclose(
        (inst + voc)[:, n_fft:-n_fft], w[:, n_fft:-n_fft], atol=5e-3
    )


def test_inference_cli_batch_dir(tiny_ckpt, song, tmp_path):
    from vocal_remover_tpu.cli.inference import main

    path, w, sr = song
    out = str(tmp_path / "batch_out")
    main([
        "--input_dir", os.path.dirname(path), "-P", tiny_ckpt,
        "-f", "256", "-H", "128", "-o", out, "-B", "2",
    ])
    inst, _ = audio.read_wav(os.path.join(out, "song_Instruments.wav"))
    voc, _ = audio.read_wav(os.path.join(out, "song_Vocals.wav"))
    assert inst.shape == w.shape
    n_fft = 256
    np.testing.assert_allclose(
        (inst + voc)[:, n_fft:-n_fft], w[:, n_fft:-n_fft], atol=5e-3
    )


def test_inference_cli_batch_dir_grouped(tiny_ckpt, song, tmp_path):
    """--group 2 over 3 songs: one merged model stream per pair, same
    outputs as per-song serving (energy conservation per song)."""
    from vocal_remover_tpu.cli.inference import main

    path, w, sr = song
    d = os.path.dirname(path)
    for name in ("song2.wav", "song3.wav"):
        audio.write_wav(os.path.join(d, name), 0.5 * w, sr)
    out = str(tmp_path / "group_out")
    main([
        "--input_dir", d, "-P", tiny_ckpt,
        "-f", "256", "-H", "128", "-o", out, "-B", "2", "--group", "2",
    ])
    n_fft = 256
    for name, scale in (("song", 1.0), ("song2", 0.5), ("song3", 0.5)):
        inst, _ = audio.read_wav(os.path.join(out, f"{name}_Instruments.wav"))
        voc, _ = audio.read_wav(os.path.join(out, f"{name}_Vocals.wav"))
        assert inst.shape == w.shape
        np.testing.assert_allclose(
            (inst + voc)[:, n_fft:-n_fft], scale * w[:, n_fft:-n_fft],
            atol=5e-3,
        )


@pytest.fixture
def dataset_dir(tmp_path):
    sr = 44100
    mix = tmp_path / "ds" / "mixtures"
    inst = tmp_path / "ds" / "instruments"
    mix.mkdir(parents=True)
    inst.mkdir(parents=True)
    for i in range(2):
        t = np.arange(sr * 8) / sr
        y = np.stack([
            0.4 * np.sin(2 * np.pi * (200 + 40 * i) * t),
            0.35 * np.sin(2 * np.pi * (300 + 40 * i) * t),
        ]).astype(np.float32)
        v = 0.2 * np.sin(2 * np.pi * 1000 * t).astype(np.float32)
        x = y + np.stack([v, v])
        audio.write_wav(str(mix / f"s{i}.wav"), x, sr)
        audio.write_wav(str(inst / f"s{i}.wav"), y, sr)
    return str(tmp_path / "ds")


def test_train_cli_debug_smoke(dataset_dir, tmp_path, monkeypatch):
    """One epoch of the real train CLI on a synthetic dataset
    (--debug truncates to 1 song, reference train.py:186-189)."""
    from vocal_remover_tpu.cli import train as train_cli

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        train_cli, "build_parser", _small_model_parser(train_cli)
    )
    out = str(tmp_path / "models")
    train_cli.main([
        "-d", dataset_dir, "--debug", "-E", "1", "-B", "2", "-p", "2",
        "-C", "256", "-c", "256", "-w", "2", "--output_dir", out,
    ])
    files = os.listdir(out)
    assert any(f.startswith("model_iter0") for f in files)
    assert "train_state.msgpack" in files
    losses = [f for f in os.listdir(tmp_path) if f.startswith("loss_")]
    assert losses
    with open(os.path.join(tmp_path, losses[0])) as f:
        log = json.load(f)
    assert len(log) == 1 and all(np.isfinite(log[0]))


def _small_model_parser(train_cli):
    """Shrink the model the train CLI builds (n_fft flag already exists;
    we lower nout via a wrapper since the reference hard-codes 32/128,
    train.py:208)."""
    import vocal_remover_tpu.cli.train as tc
    from vocal_remover_tpu.models import CascadedNet as Real

    orig = tc.build_parser

    def patched():
        p = orig()
        p.set_defaults(n_fft=256, hop_length=128, sr=44100)
        return p

    return patched


def test_train_cli_device_data_cache(dataset_dir, tmp_path, monkeypatch):
    """The device-resident data path through the real CLI: one epoch,
    checkpoint written, finite losses (train + validation both run from
    HBM-resident magnitudes)."""
    from vocal_remover_tpu.cli import train as train_cli

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        train_cli, "build_parser", _small_model_parser(train_cli)
    )
    out = str(tmp_path / "models")
    train_cli.main([
        "-d", dataset_dir, "--debug", "-E", "1", "-B", "2", "-p", "2",
        "-C", "256", "-c", "256", "-w", "2", "-v", "0.5",
        "--output_dir", out, "--device_data_cache",
    ])
    files = os.listdir(out)
    assert any(f.startswith("model_iter0") for f in files)
    losses = [f for f in os.listdir(tmp_path) if f.startswith("loss_")]
    with open(os.path.join(tmp_path, losses[0])) as f:
        log = json.load(f)
    assert len(log) == 1 and all(np.isfinite(log[0]))


def test_train_cli_resume(dataset_dir, tmp_path, monkeypatch):
    from vocal_remover_tpu.cli import train as train_cli

    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "models")
    args = [
        "-d", dataset_dir, "--debug", "-B", "2", "-p", "2", "-w", "2",
        "-f", "256", "-H", "128", "--output_dir", out,
    ]
    train_cli.main(args + ["-E", "1"])
    # resume for one more epoch from the saved state
    train_cli.main(
        args + ["-E", "2", "--resume", os.path.join(out,
                                                    "train_state.msgpack")]
    )


def test_augment_cli(dataset_dir):
    from vocal_remover_tpu.cli.augment import main

    mix = os.path.join(dataset_dir, "mixtures")
    inst = os.path.join(dataset_dir, "instruments")
    main(["-m", mix, "-i", inst, "-p", "-1", "-f", "512", "-l", "256"])
    cache = os.path.join(mix, "sr44100_hl256_nf512")
    files = os.listdir(cache)
    assert any(f.endswith("_pitch-1.npy") for f in files)
    spec = np.load(os.path.join(cache, sorted(files)[0]))
    assert spec.dtype == np.complex64 and spec.shape[0] == 2
    assert spec.shape[1] == 257  # (2, F, T) untransposed, like reference


def test_pseudo_cli(dataset_dir, tiny_ckpt, tmp_path, monkeypatch):
    from vocal_remover_tpu.cli.pseudo import main

    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "pseudo")
    main([
        "-m", os.path.join(dataset_dir, "mixtures"),
        "-i", os.path.join(dataset_dir, "instruments"),
        "-P", tiny_ckpt, "-f", "256", "-H", "128", "-B", "2",
        "-o", out,
    ])
    files = os.listdir(out)
    assert any(f.endswith("_PseudoInstruments.npy") for f in files)
    spec = np.load(os.path.join(
        out, [f for f in files if f.endswith(".npy")][0]
    ))
    assert spec.dtype == np.complex64 and spec.shape[0] == 2


def test_evaluate_cli(dataset_dir, tiny_ckpt, tmp_path):
    from vocal_remover_tpu.cli.evaluate import main

    out_json = str(tmp_path / "eval.json")
    main([
        "-P", tiny_ckpt, "-m", os.path.join(dataset_dir, "mixtures"),
        "-i", os.path.join(dataset_dir, "instruments"),
        "-f", "256", "-H", "128", "-B", "2", "--json", out_json,
    ])
    with open(out_json) as f:
        res = json.load(f)
    assert len(res["songs"]) == 2
    assert np.isfinite(res["mean"]["instrumental_sdr"])


def test_spec_debug_cli(dataset_dir, tmp_path, monkeypatch):
    from vocal_remover_tpu.cli.spec_debug import main

    monkeypatch.chdir(tmp_path)
    mix = os.path.join(dataset_dir, "mixtures", "s0.wav")
    inst = os.path.join(dataset_dir, "instruments", "s0.wav")
    main([mix, inst])
    for f in ("test_X.jpg", "test_y.wav", "test_v.wav"):
        assert os.path.exists(os.path.join(tmp_path, f))


def test_dataset_images_cli(dataset_dir, tmp_path):
    from vocal_remover_tpu.cli.dataset_images import main

    out = str(tmp_path / "imgs")
    main([
        os.path.join(dataset_dir, "mixtures"),
        os.path.join(dataset_dir, "instruments"),
        out,
    ])
    assert len(os.listdir(out)) == 2


def test_plot_log_cli(tmp_path):
    from vocal_remover_tpu.cli.plot_log import main

    log_path = str(tmp_path / "loss_x.json")
    with open(log_path, "w") as f:
        json.dump([[0.5, 0.6], [0.4, 0.5]], f)
    out = str(tmp_path / "curve.png")
    main([log_path, out])
    assert os.path.exists(out)


def test_inference_cli_data_parallel(tiny_ckpt, song, tmp_path):
    """--data_parallel shards the patch axis over the (virtual 8-dev)
    mesh; output must match the single-device CLI run exactly."""
    from vocal_remover_tpu.cli.inference import main

    path, w, sr = song
    out1 = str(tmp_path / "out1")
    outN = str(tmp_path / "outN")
    base = ["-i", path, "-P", tiny_ckpt, "-f", "256", "-H", "128", "-B", "2"]
    main(base + ["-o", out1])
    main(base + ["-o", outN, "--data_parallel", "0"])
    a, _ = audio.read_wav(os.path.join(out1, "song_Instruments.wav"))
    b, _ = audio.read_wav(os.path.join(outN, "song_Instruments.wav"))
    np.testing.assert_allclose(a, b, atol=2e-4)

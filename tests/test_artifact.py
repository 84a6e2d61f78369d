"""AOT serving artifacts (separate/artifact.py, cli/export.py).

The artifact contract: one self-contained ``.vrtx`` file (exported
StableHLO with baked weights + pipeline geometry) reproduces the live
model's serving outputs, with no model code or checkpoint on the
serving host. Reference deployment contrast: inference.py:128-131
rebuilds torch modules from lib/nets.py + a pickled state_dict.
"""

import os

import jax
import numpy as np
import pytest

from vocal_remover_tpu.models import convert
from vocal_remover_tpu.models.cascaded import CascadedNet
from vocal_remover_tpu.separate.artifact import (
    ArtifactModel,
    artifact_separator,
    export_artifact,
    load_artifact,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = CascadedNet(256, 128, 8, 16)
    variables = model.init(jax.random.PRNGKey(0))
    return model, variables


@pytest.fixture(scope="module")
def tiny_artifact(tiny_model, tmp_path_factory):
    model, variables = tiny_model
    path = str(tmp_path_factory.mktemp("artifact") / "model.vrtx")
    export_artifact(
        model, variables, path, platforms=("cpu",),
        cropsizes=(256, 384), dtype=None,
    )
    return path


def _served_fn(tiny_model):
    from vocal_remover_tpu.models import serving

    model, variables = tiny_model
    sv = serving.serving_variables(variables, None)
    return model, sv


def test_artifact_matches_model_any_batch_any_crop(tiny_model,
                                                   tiny_artifact):
    """Loaded artifact == serving-transformed model, across the batch
    sizes (symbolic dim) and both exported crop geometries."""
    model, sv = _served_fn(tiny_model)
    am = load_artifact(tiny_artifact)
    assert am.cropsizes == [256, 384]
    assert (am.n_fft, am.hop_length, am.offset, am.is_complex) == (
        model.n_fft, model.hop_length, model.offset, model.is_complex,
    )
    rng = np.random.default_rng(0)
    for batch in (1, 3):
        for crop in (256, 384):
            x = np.abs(rng.standard_normal(
                (batch, model.output_bin, crop, 2)
            )).astype(np.float32)
            got = np.asarray(am({}, x))
            want = np.asarray(model(sv, x))
            np.testing.assert_allclose(got, want, atol=1e-5)


def test_artifact_separator_end_to_end(tiny_model, tiny_artifact):
    """Full Separator pipeline over an ArtifactModel == over the live
    model (same serving transform), both crop geometries."""
    from vocal_remover_tpu.ops.stft import stft_np
    from vocal_remover_tpu.separate.separator import Separator

    model, sv = _served_fn(tiny_model)
    rng = np.random.default_rng(1)
    wave = (rng.standard_normal((2, 44100)) * 0.1).astype(np.float32)
    X = stft_np(wave, model.n_fft, model.hop_length)

    for crop in (256, 384):
        sp_live = Separator(model, sv, batchsize=2, cropsize=crop)
        sp_art = artifact_separator(tiny_artifact, batchsize=2,
                                    cropsize=crop)
        y_live, v_live = sp_live.separate(X)
        y_art, v_art = sp_art.separate(X)
        np.testing.assert_allclose(
            np.abs(y_art), np.abs(y_live), atol=2e-4
        )
        np.testing.assert_allclose(
            np.abs(v_art), np.abs(v_live), atol=2e-4
        )


def test_artifact_rejects_bad_inputs(tiny_model, tiny_artifact):
    model, _ = tiny_model
    am = load_artifact(tiny_artifact)
    x = np.zeros((1, model.output_bin, 256, 2), np.float32)
    with pytest.raises(ValueError, match="empty variables"):
        am({"conv": {}}, x)
    with pytest.raises(ValueError, match="no entry for cropsize"):
        am({}, np.zeros((1, model.output_bin, 128, 2), np.float32))
    with pytest.raises(ValueError, match="patches"):
        am({}, np.zeros((1, model.output_bin + 1, 256, 2), np.float32))


def test_artifact_future_format_rejected(tmp_path, tiny_artifact):
    import json
    import zipfile

    bad = str(tmp_path / "future.vrtx")
    with zipfile.ZipFile(tiny_artifact) as zin, \
            zipfile.ZipFile(bad, "w") as zout:
        meta = json.loads(zin.read("meta.json").decode())
        meta["format_version"] = 999
        zout.writestr("meta.json", json.dumps(meta))
        for crop in meta["cropsizes"]:
            zout.writestr(f"exported_{crop}.bin",
                          zin.read(f"exported_{crop}.bin"))
    with pytest.raises(ValueError, match="format_version"):
        load_artifact(bad)


def test_export_cli_inference_cli_roundtrip(tmp_path):
    """cli/export.py -> cli/inference.py -P model.vrtx: served outputs
    match the same checkpoint served live at the same precision."""
    from vocal_remover_tpu.cli.export import main as export_main
    from vocal_remover_tpu.cli.inference import main as infer_main
    from vocal_remover_tpu.utils import audio

    model = CascadedNet(256, 128, 8, 16)
    variables = model.init(jax.random.PRNGKey(2))
    ckpt = str(tmp_path / "model.vrt.npz")
    convert.save_native(ckpt, variables, convert.model_config(model))

    art = str(tmp_path / "model.vrtx")
    export_main([ckpt, art, "--platforms", "cpu",
                 "--cropsizes", "256", "--precision", "bfloat16"])
    assert os.path.getsize(art) > 0

    sr = 44100
    t = np.arange(sr * 2) / sr
    w = np.stack([
        0.5 * np.sin(2 * np.pi * 440 * t),
        0.4 * np.sin(2 * np.pi * 220 * t),
    ]).astype(np.float32)
    songp = str(tmp_path / "song.wav")
    audio.write_wav(songp, w, sr)

    out_live = str(tmp_path / "live")
    out_art = str(tmp_path / "art")
    common = ["-i", songp, "-f", "256", "-H", "128", "-B", "2",
              "--precision", "bfloat16"]
    infer_main(common + ["-P", ckpt, "-o", out_live])
    infer_main(common + ["-P", art, "-o", out_art])

    for stem in ("song_Instruments.wav", "song_Vocals.wav"):
        a, _ = audio.read_wav(os.path.join(out_live, stem))
        b, _ = audio.read_wav(os.path.join(out_art, stem))
        np.testing.assert_allclose(a, b, atol=2e-3)

"""BN folding and weight casting for serving (models/serving.py):
eval forwards must match the untransformed variables."""

import zlib

import numpy as np
import pytest
import jax

from vocal_remover_tpu.models.cascaded import CascadedNet
from vocal_remover_tpu.models.serving import (
    cast_weights,
    fold_batch_norms,
)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    model = CascadedNet(256, 128, 8, 16)
    key = jax.random.PRNGKey(3)
    variables = model.init(key)
    # make BN stats non-trivial so folding is actually exercised
    def perturb(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else path[-1]
        a = np.asarray(leaf)
        # crc32, not hash(): str hashes are salted per process and would
        # make the perturbations (and the tolerance checks) irreproducible
        seed = zlib.crc32("/".join(str(p) for p in path).encode())
        r = np.random.default_rng(seed)
        if name in ("mean", "bias"):
            return a + r.standard_normal(a.shape).astype(a.dtype) * 0.1
        if name in ("var", "scale"):
            return a * (1.0 + 0.3 * np.abs(r.standard_normal(a.shape))).astype(
                a.dtype
            )
        return leaf

    variables = jax.tree_util.tree_map_with_path(perturb, variables)
    x = np.abs(rng.standard_normal((2, 129, 256, 2))).astype(np.float32)
    return model, variables, x


def test_fold_batch_norms_matches_eval_forward(setup):
    model, variables, x = setup
    ref = np.asarray(model(variables, x))
    folded = fold_batch_norms(variables)
    out = np.asarray(model(folded, x))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_fold_is_not_identity(setup):
    """Folding must actually move the BN affine into the kernels."""
    model, variables, x = setup
    folded = fold_batch_norms(variables)
    w0 = np.asarray(variables["stg3_full_band_net"]["enc1"]["conv"])
    w1 = np.asarray(folded["stg3_full_band_net"]["enc1"]["conv"])
    assert np.abs(w0 - w1).max() > 1e-3
    bn = folded["stg3_full_band_net"]["enc1"]["bn"]
    np.testing.assert_array_equal(np.asarray(bn["scale"]), 1.0)
    np.testing.assert_array_equal(np.asarray(bn["mean"]), 0.0)


def test_cast_weights_bf16_close(setup):
    from vocal_remover_tpu.nn import config as nn_config

    model, variables, x = setup
    ref = np.asarray(model(variables, x))
    v16 = cast_weights(fold_batch_norms(variables))
    # BN vectors stay f32
    assert v16["stg3_full_band_net"]["enc1"]["bn"]["bias"].dtype == np.float32
    assert v16["stg3_full_band_net"]["enc1"]["conv"].dtype == jax.numpy.bfloat16
    with nn_config.precision("bfloat16"):
        out = np.asarray(model(v16, x)).astype(np.float32)
    # sigmoid-mask deltas stay small under bf16 weights+activations
    assert np.abs(out - ref).max() < 0.05
    assert np.abs(out - ref).mean() < 2e-3


def _snr_db(ref, test):
    num = float(np.sum(ref.astype(np.float64) ** 2))
    den = float(np.sum((ref - test).astype(np.float64) ** 2))
    return float("inf") if den == 0 else 10.0 * np.log10(num / max(den, 1e-300))


def test_quantize_int8_structure(setup):
    from vocal_remover_tpu.models.serving import quantize_int8

    model, variables, x = setup
    q = quantize_int8(fold_batch_norms(variables))
    enc = q["stg3_full_band_net"]["enc1"]["conv"]
    assert set(enc.keys()) == {"q", "scale"}
    assert np.asarray(enc["q"]).dtype == np.int8
    assert np.asarray(enc["scale"]).dtype == np.float32
    # f32-kept zones: LSTM branch and mask heads
    lstm_conv = q["stg3_full_band_net"]["lstm_dec2"]["conv"]["conv"]
    assert hasattr(lstm_conv, "shape") and lstm_conv.dtype == np.float32
    assert hasattr(q["out"]["conv"], "shape")
    # per-channel scale covers every output channel
    kq = np.asarray(enc["q"], np.float32) * np.asarray(enc["scale"])
    w = np.asarray(
        fold_batch_norms(variables)["stg3_full_band_net"]["enc1"]["conv"]
    )
    assert np.abs(kq - w).max() <= np.abs(w).max() / 127.0 + 1e-7


def test_int8_serving_mask_quality(setup):
    """The int8 serving quality gate (VERDICT r03 #1): masks from the
    quantized conv stack must stay >= 40 dB SNR vs the f32 eval
    forward on a realistic magnitude input."""
    from vocal_remover_tpu.models.serving import serving_variables
    from vocal_remover_tpu.nn import config as nn_config

    model, variables, x = setup
    ref = np.asarray(model(variables, x))
    v8 = serving_variables(variables, "int8")
    with nn_config.precision("bfloat16"):
        out = np.asarray(model(v8, x)).astype(np.float32)
    snr = _snr_db(ref, out)
    assert snr >= 40.0, f"int8 mask SNR {snr:.1f} dB < 40 dB gate"
    assert np.abs(out - ref).max() < 0.1


def test_int8_separation_quality(setup):
    """End-to-end: int8 Separator output waves vs f32 on a synthetic
    song — the separated stems must agree at >= 40 dB."""
    from vocal_remover_tpu.models.serving import serving_variables
    from vocal_remover_tpu.nn import config as nn_config
    from vocal_remover_tpu.ops.stft import stft_np
    from vocal_remover_tpu.separate.separator import Separator

    model, variables, _ = setup
    rng = np.random.default_rng(5)
    n = 44100 * 2
    t = np.arange(n) / 44100.0
    wave = np.stack([
        0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(n),
        0.4 * np.sin(2 * np.pi * 330 * t) + 0.1 * rng.standard_normal(n),
    ]).astype(np.float32)
    X = stft_np(wave, model.n_fft, model.hop_length)

    y_ref, v_ref = Separator(model, variables, 4, 256).separate(X)
    v8 = serving_variables(variables, "int8")
    with nn_config.precision("bfloat16"):
        y8, v8_spec = Separator(model, v8, 4, 256).separate(X)
    for ref_s, test_s in ((y_ref, y8), (v_ref, v8_spec)):
        snr = _snr_db(np.abs(ref_s), np.abs(test_s))
        assert snr >= 40.0, f"int8 stem SNR {snr:.1f} dB < 40 dB gate"


def test_int8_static_calibration(setup):
    """Calibrated static activation scales: a_scale leaves embedded,
    and quality on in-distribution inputs still >= 40 dB."""
    from vocal_remover_tpu.models.serving import serving_variables
    from vocal_remover_tpu.nn import config as nn_config

    model, variables, x = setup
    ref = np.asarray(model(variables, x))
    v8 = serving_variables(
        variables, "int8", model=model, calibration_batches=[x]
    )
    enc = v8["stg3_full_band_net"]["enc1"]["conv"]
    assert "a_scale" in enc and np.asarray(enc["a_scale"]).dtype == np.float32
    with nn_config.precision("bfloat16"):
        out = np.asarray(model(v8, x)).astype(np.float32)
    snr = _snr_db(ref, out)
    assert snr >= 40.0, f"calibrated int8 mask SNR {snr:.1f} dB < 40 dB"


def test_flat_encoder_serving_parity(setup):
    """serving_variables(flat=True): the pixel-packed enc2..enc3 flat
    kernels (nn/conv_pack.py) reproduce the XLA eval forward exactly
    (same f32 arithmetic, different schedule)."""
    from vocal_remover_tpu.models.serving import serving_variables

    model, variables, x = setup
    ref = np.asarray(model(serving_variables(variables, None), x))
    vf = serving_variables(variables, None, model=model, flat=True)
    assert any(
        "flat_enc" in vf.get(name, {})
        for name in model._children
    )
    out = np.asarray(model(vf, x))
    assert np.abs(out - ref).max() < 2e-5


def test_serving_snr_artifact():
    """The committed per-round serving-SNR artifact (generated by
    scripts/check_serving_snr.py at flagship geometry) holds its
    quality gates — full-size serving-transform parity is a recorded,
    asserted artifact rather than a bench note (VERDICT r04 #7)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = glob.glob(os.path.join(root, "SERVING_SNR_r*.json"))
    if not files:
        pytest.skip("no SERVING_SNR artifact committed yet")
    latest = max(files, key=lambda p: int(
        re.search(r"_r(\d+)\.json$", p).group(1)))
    with open(latest) as f:
        rep = json.load(f)
    assert rep["modes"], rep
    for mode, entry in rep["modes"].items():
        assert entry["snr_db"] >= entry["gate_db"], (mode, entry)

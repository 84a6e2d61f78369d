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

"""Pallas BiLSTM kernel vs the scan implementation (interpreter mode on
the CPU backend exercises the same kernel code that compiles on TPU)."""

import numpy as np
import pytest
import jax

from vocal_remover_tpu.nn import config, lstm
from vocal_remover_tpu.nn.lstm_pallas import bilstm_pallas


@pytest.mark.parametrize("t_len,n,input_size,hidden", [
    (16, 4, 32, 16),
    (33, 2, 64, 32),
])
def test_pallas_matches_scan(rng, t_len, n, input_size, hidden):
    params = lstm.init_bilstm(jax.random.PRNGKey(0), input_size, hidden)
    x = rng.standard_normal((t_len, n, input_size)).astype(np.float32)
    ref = np.asarray(lstm.bilstm(params, x))
    out = np.asarray(bilstm_pallas(params, x))
    assert out.shape == ref.shape == (t_len, n, 2 * hidden)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_config_dispatch(rng):
    params = lstm.init_bilstm(jax.random.PRNGKey(1), 16, 8)
    x = rng.standard_normal((8, 2, 16)).astype(np.float32)
    ref = np.asarray(lstm.bilstm(params, x))
    config.set_lstm_impl("pallas")
    try:
        out = np.asarray(lstm.bilstm(params, x))
    finally:
        config.set_lstm_impl("scan")
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.reference
def test_pallas_matches_torch(reference_lib, rng):
    """Pallas path through the full LSTMModule vs the torch oracle."""
    import torch

    from vocal_remover_tpu.nn import layers as L

    tmod = reference_lib.layers.LSTMModule(4, 32, 16)
    jmod = L.LSTMModule(4, 32, 16)
    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    v = jmod.from_torch(sd, "")
    x = rng.standard_normal((2, 4, 32, 12)).astype(np.float32)
    tmod.eval()
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()
    config.set_lstm_impl("pallas")
    try:
        y, _ = jmod.apply(v, np.moveaxis(x, 1, -1).copy(), train=False)
    finally:
        config.set_lstm_impl("scan")
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(y), -1, 1), ref, atol=3e-5
    )

"""Layer-by-layer numerics vs the reference torch modules with copied
weights (SURVEY.md §4.1 test strategy)."""

import numpy as np
import pytest
import torch

from vocal_remover_tpu.nn import layers as L


def to_nhwc(x_nchw):
    return np.moveaxis(x_nchw, 1, -1).copy()


def to_nchw(x_nhwc):
    return np.moveaxis(x_nhwc, -1, 1).copy()


def state_np(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def run_eval(module, variables, x_nchw):
    y, _ = module.apply(variables, np.asarray(to_nhwc(x_nchw)), train=False)
    return to_nchw(np.asarray(y))


def torch_eval(mod, x_nchw):
    mod.eval()
    with torch.no_grad():
        return mod(torch.from_numpy(x_nchw)).numpy()


@pytest.mark.reference
@pytest.mark.parametrize(
    "ksize,stride,pad,dilation",
    [(3, 1, 1, 1), (3, 2, 1, 1), (1, 1, 0, 1), (3, 1, 4, 4)],
)
def test_conv_bn_activ(reference_lib, rng, ksize, stride, pad, dilation):
    tmod = reference_lib.layers.Conv2DBNActiv(5, 7, ksize, stride, pad, dilation)
    # randomize BN stats so eval mode is a real test
    tmod.conv[1].running_mean.normal_()
    tmod.conv[1].running_var.uniform_(0.5, 2.0)
    tmod.conv[1].weight.data.normal_()
    tmod.conv[1].bias.data.normal_()
    jmod = L.Conv2DBNActiv(5, 7, ksize, stride, pad, dilation)
    v = jmod.from_torch(state_np(tmod), "")
    x = rng.standard_normal((2, 5, 16, 24)).astype(np.float32)
    np.testing.assert_allclose(
        run_eval(jmod, v, x), torch_eval(tmod, x), atol=2e-5
    )


@pytest.mark.reference
def test_conv_bn_activ_train_mode(reference_lib, rng):
    """Train-mode batch stats + running-stat update match torch."""
    tmod = reference_lib.layers.Conv2DBNActiv(3, 4, 3, 1, 1)
    jmod = L.Conv2DBNActiv(3, 4, 3, 1, 1)
    v = jmod.from_torch(state_np(tmod), "")
    x = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)

    tmod.train()
    ref = tmod(torch.from_numpy(x)).detach().numpy()
    y, v2 = jmod.apply(v, np.asarray(to_nhwc(x)), train=True)
    np.testing.assert_allclose(to_nchw(np.asarray(y)), ref, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(v2["bn"]["mean"]),
        tmod.conv[1].running_mean.numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(v2["bn"]["var"]),
        tmod.conv[1].running_var.numpy(),
        rtol=1e-5,
    )


@pytest.mark.reference
def test_encoder(reference_lib, rng):
    tmod = reference_lib.layers.Encoder(4, 8, 3, 2, 1)
    jmod = L.Encoder(4, 8, 3, 2, 1)
    v = jmod.from_torch(state_np(tmod), "")
    x = rng.standard_normal((2, 4, 32, 40)).astype(np.float32)
    np.testing.assert_allclose(
        run_eval(jmod, v, x), torch_eval(tmod, x), atol=2e-5
    )


@pytest.mark.reference
def test_decoder_with_skip(reference_lib, rng):
    tmod = reference_lib.layers.Decoder(6 + 4, 6, 3, 1, 1)
    jmod = L.Decoder(6 + 4, 6, 3, 1, 1)
    v = jmod.from_torch(state_np(tmod), "")
    x = rng.standard_normal((2, 6, 8, 10)).astype(np.float32)
    skip = rng.standard_normal((2, 4, 16, 24)).astype(np.float32)

    tmod.eval()
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x), torch.from_numpy(skip)).numpy()
    y, _ = jmod.apply(
        v, np.asarray(to_nhwc(x)), np.asarray(to_nhwc(skip)), train=False
    )
    np.testing.assert_allclose(to_nchw(np.asarray(y)), ref, atol=2e-5)


@pytest.mark.reference
def test_aspp(reference_lib, rng):
    dil = ((4, 2), (8, 4), (12, 6))
    tmod = reference_lib.layers.ASPPModule(8, 8, dil)
    jmod = L.ASPPModule(8, 8, dil)
    v = jmod.from_torch(state_np(tmod), "")
    x = rng.standard_normal((2, 8, 32, 48)).astype(np.float32)
    np.testing.assert_allclose(
        run_eval(jmod, v, x), torch_eval(tmod, x), atol=3e-5
    )


@pytest.mark.reference
def test_lstm_module(reference_lib, rng):
    tmod = reference_lib.layers.LSTMModule(6, 32, 16)
    tmod.dense[1].running_mean.normal_()
    tmod.dense[1].running_var.uniform_(0.5, 2.0)
    jmod = L.LSTMModule(6, 32, 16)
    v = jmod.from_torch(state_np(tmod), "")
    x = rng.standard_normal((2, 6, 32, 20)).astype(np.float32)
    np.testing.assert_allclose(
        run_eval(jmod, v, x), torch_eval(tmod, x), atol=3e-5
    )


@pytest.mark.reference
def test_lstm_module_train_mode(reference_lib, rng):
    tmod = reference_lib.layers.LSTMModule(3, 16, 8)
    jmod = L.LSTMModule(3, 16, 8)
    v = jmod.from_torch(state_np(tmod), "")
    x = rng.standard_normal((2, 3, 16, 12)).astype(np.float32)
    tmod.train()
    ref = tmod(torch.from_numpy(x)).detach().numpy()
    y, _ = jmod.apply(v, np.asarray(to_nhwc(x)), train=True)
    np.testing.assert_allclose(to_nchw(np.asarray(y)), ref, atol=2e-4)


@pytest.mark.reference
def test_to_torch_roundtrip(reference_lib, rng):
    """from_torch . to_torch == identity on the state dict."""
    tmod = reference_lib.layers.LSTMModule(4, 16, 8)
    jmod = L.LSTMModule(4, 16, 8)
    sd = state_np(tmod)
    v = jmod.from_torch(sd, "")
    out = {}
    jmod.to_torch(v, "", out)
    for k in sd:
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(out[k], sd[k], err_msg=k)

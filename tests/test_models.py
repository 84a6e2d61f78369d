"""CascadedNet parity vs the reference torch model (SURVEY.md §4.2)."""

import numpy as np
import pytest
import torch

from vocal_remover_tpu.models.cascaded import CascadedNet, param_count


def state_np(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(x):
    return np.moveaxis(x, 1, -1).copy()


def to_nchw(x):
    return np.moveaxis(x, -1, 1).copy()


@pytest.fixture(scope="module")
def small_pair(reference_lib):
    """A small CascadedNet (n_fft=256) + converted params — fast oracle."""
    torch.manual_seed(0)
    tmod = reference_lib.nets.CascadedNet(256, 128, 8, 16)
    # randomize BN stats so eval mode exercises running stats
    for m in tmod.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.running_mean.normal_(0, 0.02)
            m.running_var.uniform_(0.8, 1.2)
    jmod = CascadedNet(256, 128, 8, 16)
    v = jmod.from_torch(state_np(tmod))
    return tmod, jmod, v


@pytest.mark.reference
def test_param_count_default(reference_lib):
    """The flagship config must have exactly 14,740,882 trainable params
    (measured from reference nets.py:46 with train.py:208 args)."""
    jmod = CascadedNet(2048, 1024, 32, 128)
    import jax

    v = jax.eval_shape(lambda k: jmod.init(k), jax.random.PRNGKey(0))
    n = param_count(v)
    assert n == 14_740_882


@pytest.mark.reference
def test_forward_parity(small_pair, rng):
    tmod, jmod, v = small_pair
    x = rng.standard_normal((2, 2, 129, 128)).astype(np.float32) * 2
    tmod.eval()
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()
    ours = to_nchw(np.asarray(jmod(v, np.asarray(to_nhwc(x)))))
    assert ours.shape == ref.shape == (2, 2, 129, 128)
    np.testing.assert_allclose(ours, ref, atol=5e-5)


@pytest.mark.reference
def test_predict_mask_and_predict(small_pair, rng):
    tmod, jmod, v = small_pair
    x = rng.standard_normal((1, 2, 129, 160)).astype(np.float32)
    tmod.eval()
    with torch.no_grad():
        ref_mask = tmod.predict_mask(torch.from_numpy(x)).numpy()
        ref_pred = tmod.predict(torch.from_numpy(x)).numpy()
    ours_mask = to_nchw(np.asarray(jmod.predict_mask(v, np.asarray(to_nhwc(x)))))
    ours_pred = to_nchw(np.asarray(jmod.predict(v, np.asarray(to_nhwc(x)))))
    assert ours_mask.shape == ref_mask.shape  # time trimmed by 2*offset
    np.testing.assert_allclose(ours_mask, ref_mask, atol=5e-5)
    np.testing.assert_allclose(ours_pred, ref_pred, atol=5e-5)


@pytest.mark.reference
def test_mask_range_and_padding(small_pair, rng):
    _, jmod, v = small_pair
    x = np.abs(rng.standard_normal((1, 129, 128, 2))).astype(np.float32)
    mask = np.asarray(jmod(v, x))
    assert (mask >= 0).all() and (mask <= 1).all()
    # top output bin is replicate-padded from the last computed bin
    np.testing.assert_array_equal(mask[:, -1], mask[:, -2])


@pytest.mark.reference
def test_complex_mode_forward(reference_lib, rng):
    """is_complex=True (dormant in reference: train.py:208 passes False)
    — parity on the bounded-mask path with re/im stacked channels."""
    torch.manual_seed(1)
    tmod = reference_lib.nets.CascadedNet(256, 128, 8, 16, True)
    tmod.eval()
    jmod = CascadedNet(256, 128, 8, 16, is_complex=True)
    v = jmod.from_torch(state_np(tmod))
    re = rng.standard_normal((1, 2, 129, 128)).astype(np.float32)
    im = rng.standard_normal((1, 2, 129, 128)).astype(np.float32)
    with torch.no_grad():
        ref = tmod(torch.complex(torch.from_numpy(re), torch.from_numpy(im)))
    ref_np = np.concatenate([ref.real.numpy(), ref.imag.numpy()], axis=1)
    x = np.concatenate([to_nhwc(re), to_nhwc(im)], axis=-1)
    ours = to_nchw(np.asarray(jmod(v, np.asarray(x))))
    np.testing.assert_allclose(ours, ref_np, atol=5e-5)


@pytest.mark.reference
def test_state_dict_roundtrip(small_pair):
    tmod, jmod, v = small_pair
    sd = state_np(tmod)
    out = jmod.to_torch(v)
    for k in sd:
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(out[k], sd[k], err_msg=k)


@pytest.mark.reference
def test_export_loads_into_reference_strict(reference_lib, small_pair):
    """to_torch output must load into the real reference model with
    strict=True — proves complete, exactly-named key coverage."""
    tmod, jmod, v = small_pair
    sd = jmod.to_torch(v)
    fresh = reference_lib.nets.CascadedNet(256, 128, 8, 16)
    fresh.load_state_dict(
        {k: torch.from_numpy(np.asarray(val).copy()) for k, val in sd.items()}
    )
    x = torch.randn(1, 2, 129, 128)
    tmod.eval()
    fresh.eval()
    with torch.no_grad():
        np.testing.assert_allclose(
            fresh(x).numpy(), tmod(x).numpy(), atol=1e-6
        )


def test_aux_head(small_pair, rng):
    """aux head (dead weight in reference nets.py:80) is exposed for
    deep supervision and produces a full-shape mask."""
    _, jmod, v = small_pair
    x = np.abs(rng.standard_normal((1, 129, 128, 2))).astype(np.float32)
    (mask, aux_mask), _ = jmod.apply(v, x, train=False, aux=True)
    assert mask.shape == aux_mask.shape == (1, 129, 128, 2)


def test_int8_quantized_checkpoint(tmp_path, rng):
    """save_native(quantize="int8"): ~4x smaller file, per-channel
    error bound absmax/254 on every quantized leaf, and the dequantized
    model's masks stay close to the f32 model's."""
    import os

    import jax

    from vocal_remover_tpu.models import convert

    model = CascadedNet(256, 128, 8, 16)
    v = model.init(jax.random.PRNGKey(0))

    p32 = str(tmp_path / "m.vrt.npz")
    pq8 = str(tmp_path / "m_q8.vrt.npz")
    convert.save_native(p32, v, convert.model_config(model))
    convert.save_native(pq8, v, convert.model_config(model),
                        quantize="int8")
    assert os.path.getsize(pq8) < 0.45 * os.path.getsize(p32)

    vq, config = convert.load_native(pq8)
    assert config["arch"] == "CascadedNet"
    flat_ref = jax.tree_util.tree_leaves_with_path(v)
    flat_q = dict(jax.tree_util.tree_leaves_with_path(vq))
    for path, w in flat_ref:
        wq = flat_q[path]
        w = np.asarray(w)
        if w.ndim >= 2:  # quantized: per-output-channel bound
            absmax = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0)
            bound = absmax / 254.0 + 1e-8
            assert (np.abs(wq - w).reshape(-1, w.shape[-1]).max(axis=0)
                    <= bound).all(), path
        else:  # BN vectors / biases stay exact
            np.testing.assert_array_equal(wq, w, err_msg=str(path))

    x = np.abs(rng.standard_normal((1, 129, 160, 2))).astype(np.float32)
    m32 = np.asarray(model(v, x))
    mq8 = np.asarray(model(vq, x))
    assert np.abs(mq8 - m32).max() < 0.05
    assert np.abs(mq8 - m32).mean() < 2e-3

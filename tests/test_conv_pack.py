"""Pixel-packed flat conv (nn/conv_pack.py) vs the XLA reference path,
in interpreter mode on CPU (the TPU compile path is exercised by
scripts/bench_conv_pack.py and the serving benchmarks)."""

import numpy as np
import pytest
import jax.numpy as jnp

from vocal_remover_tpu.nn import functional as F
from vocal_remover_tpu.nn.conv_pack import (
    build_flat_layer,
    flat_conv,
    flat_conv_supported,
    flat_layer_apply,
    from_flat,
    to_flat,
)


def ref_conv(x, w, b, stride, act):
    y = F.conv2d(x, w, stride=stride,
                 padding=(w.shape[0] - 1) // 2)
    if b is not None:
        y = y + b[None, None, None, :]
    if act:
        y = F.ACTIVATIONS[act](y)
    return np.asarray(y)


@pytest.mark.parametrize("c,cout,h,w", [
    (32, 64, 40, 256),    # flagship enc shape class (pack 4)
    (64, 64, 24, 256),    # pack 2
    (16, 32, 24, 512),    # pack 8
    (128, 128, 24, 64),   # pack 1 (block == pixel)
    (8, 8, 16, 1024),     # pack 16
])
@pytest.mark.parametrize("act", ["leaky_relu", None])
def test_stride1_3x3_matches_xla(c, cout, h, w, act):
    rng = np.random.default_rng(c + cout)
    x = rng.standard_normal((2, h, w, c)).astype(np.float32)
    wk = (rng.standard_normal((3, 3, c, cout)) * 0.2).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)

    assert flat_conv_supported(x.shape, wk.shape, 1)
    ref = ref_conv(x, wk, b, 1, act)
    out = np.asarray(flat_conv(jnp.asarray(x), wk, b, act=act,
                               interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=3e-5)


@pytest.mark.parametrize("c,cout,h,w", [
    (32, 64, 40, 256),   # p_in 4 -> p_out 2
    (16, 32, 24, 256),   # p_in 8 -> p_out 4
    (64, 128, 32, 256),  # p_in 2 -> p_out 1
])
def test_stride2_matches_xla(c, cout, h, w):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, h, w, c)).astype(np.float32)
    wk = (rng.standard_normal((3, 3, c, cout)) * 0.2).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)

    assert flat_conv_supported(x.shape, wk.shape, 2)
    ref = ref_conv(x, wk, b, 2, "leaky_relu")
    out = np.asarray(flat_conv(jnp.asarray(x), wk, b, stride=2,
                               act="leaky_relu", interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_1x1_matches_xla():
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 20, 256, 32)).astype(np.float32)
    wk = (rng.standard_normal((1, 1, 32, 48)) * 0.3).astype(np.float32)
    b = rng.standard_normal(48).astype(np.float32)

    assert flat_conv_supported(x.shape, wk.shape, 1)
    ref = ref_conv(x, wk, b, 1, "relu")
    out = np.asarray(flat_conv(jnp.asarray(x), wk, b, act="relu",
                               interpret=True))
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_flat_chain_encoder_levels():
    """Flat-to-flat chain like the encoder stack: enc-conv2 (s1) ->
    enc-conv1 (s2) -> enc-conv2 (s1), tensors staying flat throughout
    (relayout only at the chain boundary)."""
    rng = np.random.default_rng(13)
    n, h, w, c = 2, 32, 256, 32
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    w1 = (rng.standard_normal((3, 3, c, c)) * 0.2).astype(np.float32)
    b1 = rng.standard_normal(c).astype(np.float32)
    w2 = (rng.standard_normal((3, 3, c, 2 * c)) * 0.2).astype(np.float32)
    b2 = rng.standard_normal(2 * c).astype(np.float32)
    w3 = (rng.standard_normal((3, 3, 2 * c, 2 * c)) * 0.1).astype(
        np.float32)
    b3 = rng.standard_normal(2 * c).astype(np.float32)

    r = ref_conv(x, w1, b1, 1, "leaky_relu")
    r = ref_conv(r, w2, b2, 2, "leaky_relu")
    ref = ref_conv(r, w3, b3, 1, "leaky_relu")

    p1 = 128 // c                  # 4
    l1 = build_flat_layer(w1, b1, p1, 1)
    l2 = build_flat_layer(w2, b2, p1 // 2, 2)   # p_in 4 -> p_out 2
    l3 = build_flat_layer(w3, b3, p1 // 2, 1)
    xf = to_flat(jnp.asarray(x), p1)
    wb = w // p1
    f = flat_layer_apply(l1, xf, h, wb, interpret=True)
    f = flat_layer_apply(l2, f, h, wb, interpret=True)
    f = flat_layer_apply(l3, f, h // 2, wb, interpret=True)
    out = np.asarray(from_flat(f, h // 2, w // 2, 2 * c))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_bf16_io():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 16, 256, 32)).astype(np.float32)
    wk = (rng.standard_normal((3, 3, 32, 32)) * 0.2).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    ref = ref_conv(x, wk, b, 1, "leaky_relu")
    out = np.asarray(flat_conv(jnp.asarray(x, jnp.bfloat16), wk, b,
                               act="leaky_relu", interpret=True)
                     ).astype(np.float32)
    assert np.abs(out - ref).max() < 0.1
    assert np.abs(out - ref).mean() < 0.01


def test_unsupported_shapes_rejected():
    # dilation, ragged widths, odd H@s2, lane-starved outputs
    assert not flat_conv_supported((1, 8, 256, 32), (3, 3, 32, 64),
                                   1, dilation=2)
    assert not flat_conv_supported((1, 8, 250, 32), (3, 3, 32, 64), 1)
    assert not flat_conv_supported((1, 9, 256, 32), (3, 3, 32, 64), 2)
    # channel-shrinking conv: p_out*cout < 128 (XLA fallback)
    assert not flat_conv_supported((1, 8, 256, 128), (3, 3, 128, 64), 1)

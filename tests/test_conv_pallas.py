"""Fused Pallas conv (nn/conv_pallas.py) vs the XLA reference path, in
interpreter mode on CPU (the TPU compile path is exercised by the
serving benchmarks)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vocal_remover_tpu.nn import functional as F
from vocal_remover_tpu.nn.conv_pallas import (
    fused_conv_chw,
    prepare_weights_s1,
    prepare_weights_s2,
    space_to_depth,
)


def ref_conv(x_chw, w, b, stride, act):
    """XLA NHWC conv + bias + act, returned in NCHW for comparison."""
    x = jnp.transpose(x_chw, (0, 2, 3, 1))
    y = F.conv2d(x, w, stride=stride, padding=1)
    y = y + b[None, None, None, :]
    y = F.ACTIVATIONS[act](y)
    return np.asarray(jnp.transpose(y, (0, 3, 1, 2)))


@pytest.mark.parametrize("cin,cout,h,w", [
    (2, 8, 40, 128),
    (8, 16, 33, 128),   # ragged H
    (26, 32, 64, 256),  # stage-3 enc1 shape class
])
@pytest.mark.parametrize("act", ["relu", "leaky_relu"])
def test_stride1_matches_xla(cin, cout, h, w, act):
    rng = np.random.default_rng(cin * 100 + cout)
    x = rng.standard_normal((2, cin, h, w)).astype(np.float32)
    wk = (rng.standard_normal((3, 3, cin, cout)) * 0.2).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)

    ref = ref_conv(x, wk, b, 1, act)
    w2, taps, pad = prepare_weights_s1(wk)
    out = np.asarray(
        fused_conv_chw(jnp.asarray(x), w2, b, taps, pad, act=act,
                       interpret=True)
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.parametrize("cin,cout,h,w", [
    (8, 16, 40, 128),
    (32, 64, 64, 256),
])
def test_stride2_s2d_matches_xla(cin, cout, h, w):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, cin, h, w)).astype(np.float32)
    wk = (rng.standard_normal((3, 3, cin, cout)) * 0.2).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)

    ref = ref_conv(x, wk, b, 2, "leaky_relu")
    z = space_to_depth(jnp.asarray(x))
    w2, taps, pad = prepare_weights_s2(wk)
    out = np.asarray(
        fused_conv_chw(z, w2, b, taps, pad, act="leaky_relu",
                       interpret=True)
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_bf16_io():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 8, 32, 128)).astype(np.float32)
    wk = (rng.standard_normal((3, 3, 8, 8)) * 0.2).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    ref = ref_conv(x, wk, b, 1, "relu")
    w2, taps, pad = prepare_weights_s1(wk)
    out = np.asarray(
        fused_conv_chw(jnp.asarray(x, jnp.bfloat16), w2, b, taps, pad,
                       act="relu", interpret=True)
    ).astype(np.float32)
    assert np.abs(out - ref).max() < 0.1
    # accumulate in f32: mean error stays at bf16-input level
    assert np.abs(out - ref).mean() < 0.01

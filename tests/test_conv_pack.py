"""Pixel-packed flat conv (nn/conv_pack.py) vs the XLA reference path,
in interpreter mode on CPU (the TPU compile path is exercised by
scripts/bench_conv_pack.py and the serving benchmarks)."""

import numpy as np
import pytest
import jax.numpy as jnp

from vocal_remover_tpu.nn import functional as F
from vocal_remover_tpu.nn.conv_pack import flat_conv, flat_conv_supported


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
    (128, 64, 24, 64),    # pack 1 (no block shifts within rows)
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
    (32, 64, 40, 256),   # s2d -> 128 flat channels, pack 1
    (16, 32, 24, 256),   # s2d -> 64 flat channels, pack 2
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
    wk = (rng.standard_normal((1, 1, 32, 16)) * 0.3).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)

    assert flat_conv_supported(x.shape, wk.shape, 1)
    ref = ref_conv(x, wk, b, 1, "relu")
    out = np.asarray(flat_conv(jnp.asarray(x), wk, b, act="relu",
                               interpret=True))
    np.testing.assert_allclose(out, ref, atol=3e-5)


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
    # dilation, non-square kernels, C > 128, ragged widths
    assert not flat_conv_supported((1, 8, 256, 32), (3, 3, 32, 64),
                                   1, dilation=2)
    assert not flat_conv_supported((1, 8, 256, 48), (3, 3, 48, 64), 1)
    assert not flat_conv_supported((1, 8, 250, 32), (3, 3, 32, 64), 1)
    assert not flat_conv_supported((1, 8, 256, 256), (3, 3, 256, 64), 1)
    assert not flat_conv_supported((1, 9, 256, 32), (3, 3, 32, 64), 2)

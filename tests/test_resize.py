"""Bilinear align_corners=True upsampling vs torch F.interpolate
(used by reference lib/layers.py:57 Decoder and :96 ASPP)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vocal_remover_tpu.ops.resize import resize_bilinear, upsample2x


def _torch_resize(x_nhwc, out_h, out_w):
    t = torch.from_numpy(np.moveaxis(x_nhwc, -1, 1).copy())
    y = F.interpolate(t, size=(out_h, out_w), mode="bilinear", align_corners=True)
    return np.moveaxis(y.numpy(), 1, -1)


@pytest.mark.parametrize("h,w", [(8, 16), (5, 7), (1, 9), (64, 32)])
def test_upsample2x_matches_torch(rng, h, w):
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    ours = np.asarray(upsample2x(x))
    ref = _torch_resize(x, 2 * h, 2 * w)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("h,w,oh,ow", [(1, 12, 16, 12), (4, 6, 9, 13)])
def test_resize_matches_torch(rng, h, w, oh, ow):
    x = rng.standard_normal((1, h, w, 2)).astype(np.float32)
    ours = np.asarray(resize_bilinear(x, oh, ow))
    ref = _torch_resize(x, oh, ow)
    np.testing.assert_allclose(ours, ref, atol=1e-5)

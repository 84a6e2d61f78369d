"""Property tests for windowing math (reference lib/dataset.py:198-205,
inference.py:42-68): full coverage, no overlap, correct stitch."""

import numpy as np
import pytest

from vocal_remover_tpu.ops.windowing import (
    extract_patches,
    make_padding,
    num_patches,
    stitch_masks,
)


@pytest.mark.parametrize("width", [1, 100, 128, 129, 1000, 4096])
@pytest.mark.parametrize("cropsize,offset", [(256, 64), (128, 32), (64, 32)])
def test_make_padding_covers_everything(width, cropsize, offset):
    left, right, roi = make_padding(width, cropsize, offset)
    assert left == offset
    padded = left + width + right
    n = num_patches(padded, roi, offset)
    assert n * roi >= width  # every frame covered
    # patch i valid region = [i*roi + offset - left, ...) in original coords
    # = [i*roi, (i+1)*roi): contiguous, disjoint, starting at 0.
    assert (padded - cropsize) % roi == 0 or padded - 2 * offset >= n * roi


def test_extract_and_stitch_roundtrip(rng):
    cropsize, offset = 64, 16
    width = 200
    left, right, roi = make_padding(width, cropsize, offset)
    x = rng.standard_normal((2, 33, width)).astype(np.float32)
    xp = np.pad(x, ((0, 0), (0, 0), (left, right)))
    patches = np.asarray(extract_patches(xp, cropsize, roi, offset))
    n = num_patches(xp.shape[-1], roi, offset)
    assert patches.shape == (n, 2, 33, cropsize)
    # identity "model": stitching the patch centers reproduces the padded
    # interior, whose first `width` frames are the original signal.
    out = np.asarray(stitch_masks(patches, offset))[..., :width]
    np.testing.assert_array_equal(out, x)


def test_stitch_matches_reference_loop(rng):
    """Vectorized stitch == the reference's per-patch trim+concat loop."""
    cropsize, offset = 32, 8
    width = 70
    left, right, roi = make_padding(width, cropsize, offset)
    xp = rng.standard_normal((2, 5, left + width + right)).astype(np.float32)
    patches = np.asarray(extract_patches(xp, cropsize, roi, offset))
    ours = np.asarray(stitch_masks(patches, offset))
    # reference-style loop (inference.py:55-66)
    chunks = [p[..., offset:-offset] for p in patches]
    ref = np.concatenate(chunks, axis=-1)
    np.testing.assert_array_equal(ours, ref)

"""Sliding-window math and patch extraction for whole-song separation.

Reimplements the reference's windowing contract (reference:
lib/dataset.py:198-205 `make_padding`; inference.py:42-68 patch loop):
a song of `width` STFT frames is left-padded by `offset`, right-padded so
that `roi_size = cropsize - 2*offset` divides the interior, cut into
overlapping `cropsize`-frame patches every `roi_size` frames, and each
patch contributes only its central `roi_size` frames to the output.

TPU-first difference: instead of a Python loop pushing one small batch at
a time, `extract_patches` produces the full (num_patches, ...) array in
one gather so the model runs in a few large batched device calls, and
`stitch` concatenates the valid centers back — both jit-friendly with
static shapes.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["make_padding", "num_patches", "extract_patches", "stitch_masks"]


def make_padding(width: int, cropsize: int, offset: int):
    """(pad_left, pad_right, roi_size) for a `width`-frame spectrogram.

    Identical contract to reference lib/dataset.py:198-205: every input
    frame is covered exactly once by a patch's valid (offset-trimmed)
    center region.
    """
    left = offset
    roi_size = cropsize - offset * 2
    if roi_size == 0:
        roi_size = cropsize
    right = roi_size - (width % roi_size) + left
    return left, right, roi_size


def num_patches(padded_width: int, roi_size: int, offset: int) -> int:
    """Patch count over an already-padded width (reference inference.py:44)."""
    return (padded_width - 2 * offset) // roi_size


@functools.lru_cache(maxsize=32)
def _patch_starts(n_patches: int, roi_size: int) -> np.ndarray:
    return (np.arange(n_patches) * roi_size).astype(np.int32)


def extract_patches(x, cropsize: int, roi_size: int, offset: int):
    """Slice an (..., T_padded) trailing-time array into overlapping patches.

    Args:
      x: array whose *last* axis is padded time.
    Returns:
      (num_patches, ..., cropsize) array; patch i covers
      [i*roi_size, i*roi_size + cropsize).
    """
    n = num_patches(x.shape[-1], roi_size, offset)
    if cropsize == 2 * roi_size and x.shape[-1] >= (n + 1) * roi_size:
        # default geometry (50% overlap): adjacent roi segments pair up
        # into patches via reshape+concat — no gather on the hot path
        segs = x[..., : (n + 1) * roi_size]
        segs = segs.reshape(*x.shape[:-1], n + 1, roi_size)
        patches = jnp.concatenate([segs[..., :-1, :], segs[..., 1:, :]],
                                  axis=-1)
    else:
        import jax

        # device-built indices (no O(n*cropsize) host constant)
        p = jax.lax.broadcasted_iota(jnp.int32, (n, cropsize), 0)
        k = jax.lax.broadcasted_iota(jnp.int32, (n, cropsize), 1)
        patches = x[..., p * roi_size + k]  # (..., n, cropsize)
    return jnp.moveaxis(patches, -2, 0)


def stitch_masks(masks, offset: int):
    """Concatenate per-patch valid centers along time.

    Args:
      masks: (num_patches, ..., cropsize) — full-patch model outputs.
    Returns:
      (..., num_patches * roi_size) stitched output, matching the
      reference's per-patch `predict_mask` trim + concat
      (inference.py:55-66, nets.py:124-131).
    """
    if offset > 0:
        masks = masks[..., offset:-offset]
    n = masks.shape[0]
    roi = masks.shape[-1]
    out = jnp.moveaxis(masks, 0, -2)  # (..., n, roi)
    return out.reshape(*out.shape[:-2], n * roi)

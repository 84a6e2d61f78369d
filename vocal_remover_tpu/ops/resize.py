"""Bilinear resampling with PyTorch `align_corners=True` semantics.

The reference's Decoder upsamples 2x with
`F.interpolate(mode='bilinear', align_corners=True)` (reference:
lib/layers.py:57) and ASPP re-expands a frequency-pooled branch the same
way (lib/layers.py:96). `jax.image.resize` does not implement the
align_corners grid, so we build the (sparse, two-taps-per-row)
interpolation matrices host-side and apply them as dense matmuls along
the H and W axes — which is exactly what the MXU wants anyway.

Matrices are cached per (n_in, n_out) and baked into the jitted graph as
constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["interp_matrix", "upsample2x", "resize_bilinear"]


@functools.lru_cache(maxsize=128)
def interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Row-stochastic (n_out, n_in) matrix for 1-D align_corners=True
    linear interpolation (source index = i * (n_in-1) / (n_out-1))."""
    A = np.zeros((n_out, n_in), np.float32)
    if n_in == 1 or n_out == 1:
        A[:, 0] = 1.0
        return A
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, n_in - 2)
    w = src - i0
    A[np.arange(n_out), i0] = (1.0 - w).astype(np.float32)
    A[np.arange(n_out), i0 + 1] += w.astype(np.float32)
    return A


def _apply_axis(x, A: np.ndarray, axis: int):
    # keep the activation dtype (bf16 chains stay bf16)
    M = jnp.asarray(A).astype(x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.matmul(x, M.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(y, -1, axis)


def resize_bilinear(x, out_h: int, out_w: int):
    """Resize NHWC `x` to (out_h, out_w) with align_corners=True."""
    n, h, w, c = x.shape
    if h != out_h:
        x = _apply_axis(x, interp_matrix(h, out_h), 1)
    if w != out_w:
        x = _apply_axis(x, interp_matrix(w, out_w), 2)
    return x


def upsample2x(x):
    """2x bilinear upsample of NHWC `x` (align_corners=True),
    equivalent to torch F.interpolate(scale_factor=2)."""
    n, h, w, c = x.shape
    return resize_bilinear(x, 2 * h, 2 * w)

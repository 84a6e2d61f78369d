"""Bilinear resampling with PyTorch `align_corners=True` semantics.

The reference's Decoder upsamples 2x with
`F.interpolate(mode='bilinear', align_corners=True)` (reference:
lib/layers.py:57) and ASPP re-expands a frequency-pooled branch the same
way (lib/layers.py:96). `jax.image.resize` does not implement the
align_corners grid (source index i*(n_in-1)/(n_out-1)), so the
interpolation is built host-side as a row-stochastic two-taps-per-row
matrix and applied as a dense matmul on the MXU — measured faster than
the gather+lerp formulation at the model's decoder shapes, despite the
extra FLOPs, because gathers run on the VPU while the (tiny) matmul
rides the systolic array and fuses with neighbours. `interp_taps`
retains the O(n) gather formulation for reference/benchmarks.

Matrices/taps are cached per (n_in, n_out) and baked into the jitted
graph as constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["interp_matrix", "interp_taps", "upsample2x", "resize_bilinear"]


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


@functools.lru_cache(maxsize=128)
def interp_taps(n_in: int, n_out: int):
    """(i0, i1, w) tap tables for align_corners=True interpolation:
    out[j] = in[i0[j]] * (1 - w[j]) + in[i1[j]] * w[j]."""
    if n_in == 1 or n_out == 1:
        z = np.zeros(n_out, np.int32)
        return z, z, np.zeros(n_out, np.float32)
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(src).astype(np.int32), 0, n_in - 2)
    w = (src - i0).astype(np.float32)
    return i0, (i0 + 1).astype(np.int32), w


def _apply_axis(x, n_out: int, axis: int):
    """Interpolate along `axis` via the (two-taps-per-row) matrix as a
    dense matmul — measured faster on the MXU than gather+lerp for the
    model's decoder shapes. Precision follows nn.config (f32 for parity,
    bf16 multiplies in the fast modes)."""
    from vocal_remover_tpu.nn import config

    M = jnp.asarray(interp_matrix(x.shape[axis], n_out)).astype(x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.matmul(x, M.T, precision=config.get_precision())
    return jnp.moveaxis(y, -1, axis)


def resize_bilinear(x, out_h: int, out_w: int):
    """Resize NHWC `x` to (out_h, out_w) with align_corners=True."""
    n, h, w, c = x.shape
    if h != out_h:
        x = _apply_axis(x, out_h, 1)
    if w != out_w:
        x = _apply_axis(x, out_w, 2)
    return x


def upsample2x(x):
    """2x bilinear upsample of NHWC `x` (align_corners=True),
    equivalent to torch F.interpolate(scale_factor=2)."""
    n, h, w, c = x.shape
    return resize_bilinear(x, 2 * h, 2 * w)

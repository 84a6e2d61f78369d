"""Bilinear resampling with PyTorch `align_corners=True` semantics.

The reference's Decoder upsamples 2x with
`F.interpolate(mode='bilinear', align_corners=True)` (reference:
lib/layers.py:57) and ASPP re-expands a frequency-pooled branch the same
way (lib/layers.py:96). `jax.image.resize` does not implement the
align_corners grid (source index i*(n_in-1)/(n_out-1)).

Two implementations, chosen by shape:

  * **Exact 2x (every Decoder): phase-split lerp.** The align_corners
    grid at n_out = 2*n_in has FIXED taps with position-affine weights:
    out[2k]   = (k/(2h-1))      * x[k-1] + (1 - k/(2h-1))      * x[k]
    out[2k+1] = ((h+k)/(2h-1))  * x[k]   + ((h-1-k)/(2h-1))    * x[k+1]
    (indices edge-clamped; k=0 / k=h-1 fall out of the same formulas).
    Each phase is two elementwise multiplies of shifted views and the
    interleave is a free major-dim reshape ((..., h, 2, ...) ->
    (..., 2h, ...)), so the whole op is bandwidth-bound VPU work that
    XLA fuses with its neighbours. The previous dense interp-matrix
    matmul formulation contracted a 2-nonzeros-per-row (2n, n) matrix
    on the MXU: at the decoder shapes (time axis = cropsize) those
    matmuls cost ~n/2 x the useful FLOPs and summed to ~45% of the
    whole model's FLOP budget (dec1/dec2 dominate — BENCH_NOTES r05).

  * **General ratios (ASPP's pooled-branch re-expand, 1 -> h, plus
    arbitrary test shapes): row-stochastic two-taps-per-row matrix as
    a dense matmul.** These shapes are tiny (n_in = 1 broadcasts) and
    the matrix rides the MXU and fuses with neighbours.

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
    dense matmul (general-ratio fallback; the hot exact-2x decoder path
    uses _up2x_axis). Precision follows nn.config (f32 for parity,
    bf16 multiplies in the fast modes)."""
    from vocal_remover_tpu.nn import config

    if x.shape[axis] == 1:
        # align_corners from a single sample is a pure broadcast
        # (ASPP's frequency-pooled branch re-expand, lib/layers.py:96)
        reps = [1] * x.ndim
        reps[axis] = n_out
        return jnp.tile(x, reps)

    M = jnp.asarray(interp_matrix(x.shape[axis], n_out)).astype(x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.matmul(x, M.T, precision=config.get_precision())
    return jnp.moveaxis(y, -1, axis)


@functools.lru_cache(maxsize=128)
def _up2x_weights(h: int):
    """f32 phase weights for the exact-2x align_corners grid (see
    module docstring): (a, b) with a[k] = k/(2h-1) (even-phase weight
    of x[k-1]) and b[k] = (h+k)/(2h-1) (odd-phase weight of x[k]).
    Computed in f64 then cast, matching interp_matrix's numerics."""
    k = np.arange(h, dtype=np.float64)
    d = 2.0 * h - 1.0
    return (k / d).astype(np.float32), ((h + k) / d).astype(np.float32)


def _up2x_axis(x, axis: int):
    """Exact 2x align_corners upsample along `axis` as a phase-split
    lerp + free interleave reshape. Elementwise products run in f32
    (the f32 weights promote bf16 inputs) and the result is cast back
    to x.dtype, matching the matmul formulation's f32 accumulation."""
    h = x.shape[axis]
    a, b = _up2x_weights(h)
    shape = [1] * x.ndim
    shape[axis] = h
    a = jnp.asarray(a).reshape(shape)
    b = jnp.asarray(b).reshape(shape)

    def shift(src, lo, hi, edge):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(lo, hi)
        body = src[tuple(sl)]
        sl[axis] = edge
        return jnp.concatenate([body, src[tuple(sl)]][:: 1 if lo else -1],
                               axis=axis)

    x_prev = shift(x, 0, h - 1, slice(0, 1))        # x[max(k-1, 0)]
    x_next = shift(x, 1, h, slice(h - 1, h))        # x[min(k+1, h-1)]
    even = a * x_prev + (1.0 - a) * x
    odd = b * x + (1.0 - b) * x_next
    y = jnp.stack([even, odd], axis=axis + 1).astype(x.dtype)
    out_shape = list(x.shape)
    out_shape[axis] = 2 * h
    return y.reshape(out_shape)


def resize_bilinear(x, out_h: int, out_w: int, lerp2x: bool = True):
    """Resize NHWC `x` to (out_h, out_w) with align_corners=True.

    `lerp2x` selects the exact-2x formulation (both produce the same
    align_corners grid; measured on 1x v5e, flagship decoder shapes —
    BENCH_NOTES r05):

      * True (training): phase-split lerp. The interp matmuls were
        ~45% of the step's FLOPs and triple in backward; dropping them
        halves the fused train step (23.3 -> 11.9 ms at B=4 crop 256).
      * False (eval/serving): dense interp-matrix matmul. In the bf16
        serving forward the lerp's shifted-copy + interleave graphs
        cost MORE than the matmul FLOPs (65.0 vs 54.8 ms/forward) and
        their padded temporaries OOM the grouped wide-crop graph, so
        the forward-only path keeps the MXU form.
    """
    n, h, w, c = x.shape
    if h != out_h:
        x = _up2x_axis(x, 1) if lerp2x and out_h == 2 * h \
            else _apply_axis(x, out_h, 1)
    if w != out_w:
        x = _up2x_axis(x, 2) if lerp2x and out_w == 2 * w \
            else _apply_axis(x, out_w, 2)
    return x


def upsample2x(x, lerp: bool = True):
    """2x bilinear upsample of NHWC `x` (align_corners=True),
    equivalent to torch F.interpolate(scale_factor=2). `lerp` as in
    resize_bilinear(lerp2x=...)."""
    n, h, w, c = x.shape
    return resize_bilinear(x, 2 * h, 2 * w, lerp2x=lerp)

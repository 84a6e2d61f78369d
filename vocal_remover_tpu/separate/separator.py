"""Whole-song separation engine.

Capability-parity with reference inference.py:16-102 `Separator`
(separate / separate_tta / postprocess semantics, including the
reference's two normalization quirks), redesigned TPU-first:

  * The reference slices patches in numpy and pushes them through the
    model 4 at a time with per-batch H2D/D2H transfers (inference.py:
    55-64). Here the *entire* padded magnitude spectrogram is shipped to
    the device once; patch extraction, the model forward over all
    patches (chunked via `lax.map` to bound activation memory), the
    offset trim, and the stitch all run inside ONE jitted call.
  * Patch counts are rounded up to a multiple of 4*batchsize so jitted
    shapes fall into buckets (bounded recompiles across song lengths);
    the surplus stitched frames are dropped on the host.
  * Spectrograms cross the host boundary as (real, imag) float pairs —
    the TPU runtime cannot transfer complex64.

Normalization quirks faithfully kept (SURVEY.md §3.2): `separate`
scales by max|X| of the *unpadded* spectrogram (inference.py:74), while
`separate_tta` scales by the numpy-lexicographic complex max of each
*padded* spectrogram (inference.py:87,94) — which only affects the mask
input through its magnitude |c|.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vocal_remover_tpu.ops.windowing import (
    extract_patches,
    make_padding,
    num_patches,
    stitch_masks,
)
from vocal_remover_tpu.utils.spec import merge_artifacts


class Separator:
    def __init__(self, model, variables, batchsize=4, cropsize=256,
                 postprocess=False, progress=None):
        self.model = model
        self.variables = variables
        self.offset = model.offset
        self.batchsize = max(1, batchsize)
        self.cropsize = cropsize
        self.postprocess = postprocess
        self.progress = progress  # optional callable(str) for status lines

    # ------------------------------------------------------------------
    # jitted core: padded (re, im) -> stitched mask
    # ------------------------------------------------------------------

    @functools.lru_cache(maxsize=8)
    def _forward_fn(self, padded_frames: int, roi_size: int):
        crop, off, bs = self.cropsize, self.offset, self.batchsize
        n = num_patches(padded_frames, roi_size, off)
        model, variables = self.model, self.variables

        n_chunks = n // bs

        @jax.jit
        def run(re, im, inv_scale):
            mag = jnp.sqrt(re * re + im * im) * inv_scale  # (C, F, Tpad)
            patches = extract_patches(mag, crop, roi_size, off)
            x = jnp.transpose(patches, (0, 2, 3, 1))  # (P, F, crop, C)

            def chunk(xb):
                return model(variables, xb)

            masks = jax.lax.map(
                chunk, x.reshape(n_chunks, bs, *x.shape[1:])
            )
            masks = masks.reshape(n, *masks.shape[2:])  # (P, F, crop, C)
            masks = jnp.transpose(masks, (0, 3, 1, 2))  # (P, C, F, crop)
            return stitch_masks(masks, off)  # (C, F, P*roi)

        return run

    def _separate(self, X_spec_pad: np.ndarray, roi_size: int,
                  inv_scale: float) -> np.ndarray:
        """Padded complex spectrogram -> mask over the padded interior."""
        run = self._forward_fn(X_spec_pad.shape[2], roi_size)
        re = np.ascontiguousarray(X_spec_pad.real, np.float32)
        im = np.ascontiguousarray(X_spec_pad.imag, np.float32)
        mask = run(re, im, np.float32(inv_scale))
        return np.asarray(mask)

    # ------------------------------------------------------------------
    # public API (reference inference.py:70-102)
    # ------------------------------------------------------------------

    def _pad_spec(self, X_spec, extra_shift=0):
        n_frame = X_spec.shape[2]
        pad_l, pad_r, roi_size = make_padding(
            n_frame, self.cropsize, self.offset
        )
        pad_l += extra_shift
        pad_r += extra_shift
        # round patch count up to a bucket (multiple of 4*batchsize)
        n = num_patches(pad_l + n_frame + pad_r, roi_size, self.offset)
        gran = 4 * self.batchsize
        n_bucket = -(-n // gran) * gran
        pad_r += (n_bucket - n) * roi_size
        X_pad = np.pad(X_spec, ((0, 0), (0, 0), (pad_l, pad_r)))
        return X_pad, roi_size

    def separate(self, X_spec: np.ndarray):
        """(2, F, T) complex spectrogram -> (y_spec, v_spec)."""
        n_frame = X_spec.shape[2]
        X_pad, roi_size = self._pad_spec(X_spec)
        inv_scale = 1.0 / np.abs(X_spec).max()

        mask = self._separate(X_pad, roi_size, inv_scale)
        mask = mask[:, :, :n_frame]

        return self._postprocess(X_spec, mask)

    def separate_tta(self, X_spec: np.ndarray):
        """TTA: second pass shifted by roi//2 frames, masks averaged
        (reference inference.py:83-102)."""
        n_frame = X_spec.shape[2]

        X_pad, roi_size = self._pad_spec(X_spec)
        inv_scale = 1.0 / np.abs(X_pad.max())  # complex lexicographic max
        mask = self._separate(X_pad, roi_size, inv_scale)[:, :, :n_frame]

        X_pad2, _ = self._pad_spec(X_spec, extra_shift=roi_size // 2)
        inv_scale2 = 1.0 / np.abs(X_pad2.max())
        mask_tta = self._separate(X_pad2, roi_size, inv_scale2)
        mask_tta = mask_tta[:, :, roi_size // 2 :]

        mask = (mask + mask_tta[:, :, :n_frame]) * 0.5

        return self._postprocess(X_spec, mask)

    def _postprocess(self, X_spec, mask):
        if self.postprocess:
            mask_mag = np.abs(mask)
            mask_mag = merge_artifacts(mask_mag)
            mask = mask_mag * np.exp(1.0j * np.angle(mask))

        X_mag = np.abs(X_spec)
        X_phase = np.exp(1.0j * np.angle(X_spec))

        y_spec = mask * X_mag * X_phase
        v_spec = (1 - mask) * X_mag * X_phase

        return y_spec, v_spec

"""Loss functions.

The live training objective is L1(mask * X, y) on magnitudes (reference
train.py:89); validation is L1 on the offset-trimmed masked spectrogram
(train.py:122-130). The wave-domain SDR losses the reference defines but
leaves dormant (train.py:37-65, commented out at :83-88/:125-129) are
carried here as working, jittable device code (batched iSTFT included).
"""

from __future__ import annotations

import jax.numpy as jnp

from vocal_remover_tpu.ops.stft import istft


def l1(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def mask_l1_loss(mask, X_mag, y_mag):
    """Training loss: L1 between masked mixture and instrumental target."""
    return l1(mask * X_mag, y_mag)


def to_wave(spec_re, spec_im, n_fft, hop_length):
    """Batched device iSTFT of (..., F, T) re/im spectrograms
    (reference train.py:37-43 `to_wave`)."""
    return istft(spec_re, spec_im, n_fft, hop_length)


def sdr_loss(y, y_pred, eps=1e-8):
    """Negative scale-invariant correlation SDR (reference train.py:46-50)."""
    num = jnp.sum(y * y_pred)
    den = jnp.linalg.norm(y.ravel()) * jnp.linalg.norm(y_pred.ravel()) + eps
    return -(num / den)


def weighted_sdr_loss(y, y_pred, n, n_pred, eps=1e-8):
    """Noise-weighted SDR (reference train.py:53-65)."""
    y_sdr = jnp.sum(y * y_pred)
    y_sdr = y_sdr / (
        jnp.linalg.norm(y.ravel()) * jnp.linalg.norm(y_pred.ravel()) + eps
    )
    noise_sdr = jnp.sum(n * n_pred)
    noise_sdr = noise_sdr / (
        jnp.linalg.norm(n.ravel()) * jnp.linalg.norm(n_pred.ravel()) + eps
    )
    a = jnp.sum(y ** 2)
    a = a / (jnp.sum(y ** 2) + jnp.sum(n ** 2) + eps)
    return -(a * y_sdr + (1 - a) * noise_sdr)

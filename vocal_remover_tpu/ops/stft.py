"""STFT / iSTFT kernels for TPU.

TPU-native reimplementation of the reference's spectrogram path
(reference: lib/spec_utils.py:26-31 `wave_to_spectrogram`,
lib/spec_utils.py:157-165 `spectrogram_to_wave`, which delegate to
librosa.stft/istft). Semantics match librosa defaults: centered frames,
reflect padding, periodic Hann window, win_length == n_fft.

Design notes (TPU):
  * The axon TPU backend cannot transfer complex64 host<->device, so all
    public entry points take and return *real* arrays; the complex
    spectrogram is represented as a (real, imag) pair. Complex dtypes are
    only formed transiently inside jit (for irfft).
  * Framing is a gather with statically-known indices; XLA lowers this to
    an efficient dynamic-slice loop. Window multiply fuses into the FFT's
    prologue.
  * Overlap-add in `istft` avoids scatter-add entirely: frames are split
    into ceil(n_fft/hop) interleaved groups whose members do not overlap,
    each group is laid out with reshape+pad, and the groups are summed.
    This keeps the op purely dense/vectorized, which XLA fuses well.
  * All shapes are static under jit; the number of frames is derived from
    the (static) wave length, so a given song length compiles once.

Host-side numpy mirrors (`stft_np`/`istft_np`) are provided for the data
pipeline (spectrogram caching) so dataset preparation does not need a
device round trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hann_window",
    "stft",
    "istft",
    "stft_np",
    "istft_np",
    "num_frames",
    "istft_length",
]


def hann_window(n_fft: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window, identical to librosa's default stft window
    (and torch.hann_window(n_fft, periodic=True))."""
    n = np.arange(n_fft)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)).astype(dtype)


def num_frames(length: int, n_fft: int, hop_length: int) -> int:
    """Number of STFT frames for a centered transform of `length` samples."""
    return 1 + (length + 2 * (n_fft // 2) - n_fft) // hop_length


def istft_length(n_frames: int, n_fft: int, hop_length: int) -> int:
    """Output length of a centered iSTFT (librosa default, length=None)."""
    return n_fft + hop_length * (n_frames - 1) - 2 * (n_fft // 2)


@functools.lru_cache(maxsize=32)
def _frame_indices(n_frames: int, n_fft: int, hop_length: int) -> np.ndarray:
    return (
        np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    ).astype(np.int32)


@functools.lru_cache(maxsize=32)
def _window_sumsquare(
    n_frames: int, n_fft: int, hop_length: int
) -> np.ndarray:
    """Sum of squared synthesis windows over the overlap-add output grid.

    Data independent for fixed (n_frames, n_fft, hop): computed host-side
    with numpy and baked into the jitted iSTFT as a constant.
    """
    w2 = hann_window(n_fft, np.float64) ** 2
    total = n_fft + hop_length * (n_frames - 1)
    out = np.zeros(total, np.float64)
    for t in range(n_frames):
        out[t * hop_length : t * hop_length + n_fft] += w2
    return out.astype(np.float32)


def _device_frame_indices(n_frames: int, n_fft: int, hop_length: int):
    """Frame gather indices built on device via iota — no O(T*n_fft)
    host constant baked into the graph (a 10-minute song's index table
    is ~200 MB, which overflows compile-request limits)."""
    t = jax.lax.broadcasted_iota(jnp.int32, (n_frames, n_fft), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (n_frames, n_fft), 1)
    return t * hop_length + k


@functools.partial(jax.jit, static_argnums=(1, 2))
def stft(wave, n_fft: int, hop_length: int):
    """Centered STFT of a real signal.

    Args:
      wave: (..., length) float32. Leading dims (e.g. channels) are batched.
      n_fft, hop_length: static ints.

    Returns:
      (real, imag): each (..., n_fft // 2 + 1, n_frames) float32, matching
      librosa.stft's (freq, time) layout.
    """
    pad = n_fft // 2
    pad_cfg = [(0, 0)] * (wave.ndim - 1) + [(pad, pad)]
    x = jnp.pad(wave, pad_cfg, mode="reflect")
    n = num_frames(wave.shape[-1], n_fft, hop_length)
    idx = _device_frame_indices(n, n_fft, hop_length)
    frames = x[..., idx]  # (..., n_frames, n_fft)
    frames = frames * jnp.asarray(hann_window(n_fft))
    spec = jnp.fft.rfft(frames, axis=-1)  # (..., n_frames, n_bins)
    real = jnp.moveaxis(jnp.real(spec), -1, -2).astype(jnp.float32)
    imag = jnp.moveaxis(jnp.imag(spec), -1, -2).astype(jnp.float32)
    return real, imag


def _overlap_add(frames, n_fft: int, hop_length: int):
    """Dense grouped overlap-add: (..., n_frames, n_fft) -> (..., total).

    Frames t, t + G, t + 2G, ... (G = ceil(n_fft / hop)) never overlap, so
    each group is laid out contiguously with reshape + pad and the G
    shifted group signals are summed. No scatter ops.
    """
    *lead, n_frames, _ = frames.shape
    total = n_fft + hop_length * (n_frames - 1)
    groups = -(-n_fft // hop_length)  # ceil
    stride = groups * hop_length
    out = jnp.zeros((*lead, total), frames.dtype)
    for g in range(groups):
        fr = frames[..., g::groups, :]  # (..., tg, n_fft)
        tg = fr.shape[-2]
        if tg == 0:
            continue
        fr = jnp.pad(fr, [(0, 0)] * (fr.ndim - 1) + [(0, stride - n_fft)])
        flat = fr.reshape(*lead, tg * stride)
        left = g * hop_length
        room = total - left
        if flat.shape[-1] > room:
            flat = flat[..., :room]
        else:
            flat = jnp.pad(
                flat, [(0, 0)] * (flat.ndim - 1) + [(0, room - flat.shape[-1])]
            )
        out = out + jnp.pad(flat, [(0, 0)] * (flat.ndim - 1) + [(left, 0)])
    return out


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def istft(real, imag, n_fft: int, hop_length: int, length: int | None = None):
    """Centered iSTFT (librosa-compatible).

    Args:
      real, imag: (..., n_bins, n_frames) float32.
      length: optional output sample count; default trims n_fft//2 per side.

    Returns:
      (..., length) float32 signal.
    """
    n_frames = real.shape[-1]
    spec = jax.lax.complex(
        jnp.moveaxis(real, -1, -2), jnp.moveaxis(imag, -1, -2)
    )  # (..., n_frames, n_bins)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)
    window = jnp.asarray(hann_window(n_fft))
    frames = frames * window
    y = _overlap_add(frames, n_fft, hop_length)
    # window-sum-square normalization computed ON DEVICE (data
    # independent but length dependent — a host-side table would bake
    # an O(length) constant into the graph). For the default 50%-
    # overlap geometry the interior is exactly periodic with period
    # hop (each sample sees two window halves), so the whole vector is
    # [first half-window, tiled period, last half-window] — a tiny
    # tile instead of a full O(length * n_fft) overlap-add pass.
    w2v = window * window
    if hop_length * 2 == n_fft and n_frames >= 2:
        period = w2v[:hop_length] + w2v[hop_length:]
        wss = jnp.concatenate([
            w2v[:hop_length],
            jnp.tile(period, n_frames - 1),
            w2v[hop_length:],
        ])
    else:
        w2 = jnp.broadcast_to(w2v, (n_frames, n_fft))
        wss = _overlap_add(w2, n_fft, hop_length)
    tiny = np.finfo(np.float32).tiny
    y = jnp.where(wss > tiny, y / jnp.maximum(wss, tiny), y)
    pad = n_fft // 2
    y = y[..., pad : y.shape[-1] - pad]
    if length is not None:
        if length <= y.shape[-1]:
            y = y[..., :length]
        else:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])])
    return y


# ---------------------------------------------------------------------------
# Host (numpy) mirrors for the data-preparation pipeline.
# ---------------------------------------------------------------------------


def stft_np(wave: np.ndarray, n_fft: int, hop_length: int) -> np.ndarray:
    """Host STFT returning a complex (..., n_bins, n_frames) array.

    Same numerics as `stft` (up to FFT implementation rounding); used by
    the spectrogram cache writer (reference: lib/spec_utils.py:122-154)
    where complex numpy arrays are the on-disk format.
    """
    pad = n_fft // 2
    x = np.pad(wave, [(0, 0)] * (wave.ndim - 1) + [(pad, pad)], mode="reflect")
    n = num_frames(wave.shape[-1], n_fft, hop_length)
    idx = _frame_indices(n, n_fft, hop_length)
    frames = x[..., idx] * hann_window(n_fft, np.float64)
    spec = np.fft.rfft(frames, axis=-1).astype(np.complex64)
    return np.moveaxis(spec, -1, -2)


def istft_np(
    spec: np.ndarray, n_fft: int, hop_length: int, length: int | None = None
) -> np.ndarray:
    """Host iSTFT of a complex (..., n_bins, n_frames) array."""
    n_frames = spec.shape[-1]
    frames = np.fft.irfft(np.moveaxis(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * hann_window(n_fft, np.float64)
    total = n_fft + hop_length * (n_frames - 1)
    y = np.zeros(frames.shape[:-2] + (total,), np.float64)
    for t in range(n_frames):
        y[..., t * hop_length : t * hop_length + n_fft] += frames[..., t, :]
    wss = _window_sumsquare(n_frames, n_fft, hop_length).astype(np.float64)
    tiny = np.finfo(np.float32).tiny
    y = np.where(wss > tiny, y / np.maximum(wss, tiny), y)
    pad = n_fft // 2
    y = y[..., pad : y.shape[-1] - pad]
    if length is not None:
        if length <= y.shape[-1]:
            y = y[..., :length]
        else:
            y = np.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])])
    return y.astype(np.float32)

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
  * Patch counts are rounded up to whole chunks of `batchsize` so
    jitted shapes fall into buckets (bounded recompiles across song
    lengths); the surplus stitched frames are dropped on the host.
  * Spectrograms cross the host boundary as (real, imag) float pairs —
    the TPU runtime cannot transfer complex64.

Normalization quirks faithfully kept (SURVEY.md §3.2): `separate`
scales by max|X| of the *unpadded* spectrogram (inference.py:74), while
`separate_tta` scales by the numpy-lexicographic complex max of each
*padded* spectrogram (inference.py:87,94) — which only affects the mask
input through its magnitude |c|.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vocal_remover_tpu.ops.stft import istft, stft
from vocal_remover_tpu.ops.windowing import (
    extract_patches,
    make_padding,
    num_patches,
    stitch_masks,
)
from vocal_remover_tpu.utils.spec import merge_artifacts


class Separator:
    def __init__(self, model, variables, batchsize=4, cropsize=256,
                 postprocess=False, mesh=None):
        """mesh: optional jax Mesh — shards the patch axis of a song
        across all mesh devices (sequence parallelism; patches are
        halo-free by the windowing contract, so no collectives are
        needed until the stitch's implicit all-gather). Weights are
        replicated; `batchsize` chunking is replaced by one sharded
        model call."""
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from vocal_remover_tpu.parallel import mesh as mesh_lib

            self.variables = mesh_lib.replicate(mesh, variables)
            self._n_shards = int(np.prod(list(mesh.shape.values())))
        else:
            # pin weights on device once; jitted calls take them as
            # arguments (never as baked-in constants)
            self.variables = jax.device_put(variables)
            self._n_shards = 1
        self.offset = model.offset
        self.batchsize = max(1, batchsize)
        self.cropsize = cropsize
        self.postprocess = postprocess
        # per-instance cache of jitted executables; dies with the
        # instance (an lru_cache on the bound methods would key a global
        # cache on `self` and pin weights + executables alive forever).
        # Bounded: whole-song executables key on exact sample counts, so
        # a long-lived instance fed many distinct lengths would
        # otherwise accumulate compiled programs without limit.
        self._fn_cache: dict = {}
        self._fn_cache_max = 8

    # ------------------------------------------------------------------
    # jitted core: padded (re, im) -> stitched mask
    # ------------------------------------------------------------------

    def _cached_fn(self, key, build):
        """LRU over the jitted-executable cache (move-to-back on hit,
        evict oldest past _fn_cache_max)."""
        fn = self._fn_cache.pop(key, None)
        if fn is None:
            fn = build()
            while len(self._fn_cache) >= self._fn_cache_max:
                self._fn_cache.pop(next(iter(self._fn_cache)))
        self._fn_cache[key] = fn
        return fn

    def _forward_fn(self, padded_frames: int, roi_size: int):
        return self._cached_fn(
            ("fwd", padded_frames, roi_size),
            lambda: self._build_forward_fn(padded_frames, roi_size),
        )

    def _build_forward_fn(self, padded_frames: int, roi_size: int):
        crop, off, bs = self.cropsize, self.offset, self.batchsize
        n = num_patches(padded_frames, roi_size, off)
        model = self.model
        is_cx = model.is_complex

        n_chunks = n // bs

        @jax.jit
        def run(re, im, inv_scale, variables):
            if is_cx:
                # complex model: scaled re/im stacked as channels
                # [reL, reR, imL, imR] (same layout as training)
                feats = jnp.concatenate([re, im], axis=0) * inv_scale
            else:
                feats = jnp.sqrt(re * re + im * im) * inv_scale
            patches = extract_patches(feats, crop, roi_size, off)
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
        """Padded complex spectrogram -> mask over the padded interior.
        Real-valued (sigmoid) mask for magnitude models; complex
        (tanh-bounded) mask for is_complex models."""
        run = self._forward_fn(X_spec_pad.shape[2], roi_size)
        re = np.ascontiguousarray(X_spec_pad.real, np.float32)
        im = np.ascontiguousarray(X_spec_pad.imag, np.float32)
        mask = np.asarray(run(re, im, np.float32(inv_scale), self.variables))
        if self.model.is_complex:
            mask = mask[:2] + 1j * mask[2:]
        return mask

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
        # round patch count up to a whole number of chunks
        n = num_patches(pad_l + n_frame + pad_r, roi_size, self.offset)
        gran = self.batchsize
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

    # ------------------------------------------------------------------
    # fully on-device wave -> wave path (the TPU-native product path)
    # ------------------------------------------------------------------

    def _wave_fn(self, n_samples: int, tta: bool, pcm16_io: bool,
                 only_instruments: bool = False):
        return self._cached_fn(
            ("wave", n_samples, tta, pcm16_io, only_instruments),
            lambda: self._build_wave_fn(
                n_samples, tta, pcm16_io, only_instruments
            ),
        )

    def _build_wave_fn(self, n_samples: int, tta: bool, pcm16_io: bool,
                       only_instruments: bool = False):
        """Build the jitted whole-song pipeline for a given length:
        device STFT -> patched model forward (x2 shifted for TTA) ->
        mask -> complex reconstruction -> device iSTFT. One device call
        per song; nothing but the wave crosses the host boundary.

        pcm16_io: exchange int16 PCM with the host (4x less interconnect
        traffic — the host link is the bottleneck for whole songs);
        dequant/quant run on device and reproduce the PCM_16 wav
        conversion exactly, so outputs match the f32 path + write_wav.
        """
        model = self.model
        n_fft, hop = model.n_fft, model.hop_length
        crop, off, bs = self.cropsize, self.offset, self.batchsize

        from vocal_remover_tpu.ops.stft import num_frames

        n_frame = num_frames(n_samples, n_fft, hop)
        pad_l0, pad_r0, roi = make_padding(n_frame, crop, off)
        shift = roi // 2

        gran = bs * self._n_shards if self.mesh is not None else bs
        mesh = self.mesh

        def bucketed(pad_l, pad_r):
            """Round the patch count up to whole chunks."""
            n = num_patches(pad_l + n_frame + pad_r, roi, off)
            n_bucket = -(-n // gran) * gran
            return pad_l, pad_r + (n_bucket - n) * roi

        pad_l, pad_r = bucketed(pad_l0, pad_r0)
        pad2_l, pad2_r = bucketed(pad_l0 + shift, pad_r0 + shift)

        is_cx = model.is_complex

        def masks_for(re_pad, im_pad, inv_scale, variables):
            if is_cx:
                feats = jnp.concatenate([re_pad, im_pad], axis=0) * inv_scale
            else:
                feats = jnp.sqrt(re_pad * re_pad + im_pad * im_pad) * inv_scale
            patches = extract_patches(feats, crop, roi, off)
            x = jnp.transpose(patches, (0, 2, 3, 1))
            n_p = x.shape[0]  # whole multiple of gran by construction
            if mesh is not None:
                # sequence parallelism: patch axis sharded over the mesh
                from jax.sharding import NamedSharding, PartitionSpec

                x = jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, PartitionSpec(mesh.axis_names))
                )
                out = model(variables, x)
            else:
                out = jax.lax.map(
                    lambda xb: model(variables, xb),
                    x.reshape(n_p // bs, bs, *x.shape[1:]),
                )
                out = out.reshape(n_p, *out.shape[2:])
            out = jnp.transpose(out, (0, 3, 1, 2))
            return stitch_masks(out, off)

        def lexmax_abs(re, im):
            """|numpy-lexicographic max| of a complex array given as
            re/im — reproduces `X_spec_pad.max()` (inference.py:87)."""
            r_star = jnp.max(re)
            i_star = jnp.max(jnp.where(re == r_star, im, -jnp.inf))
            return jnp.sqrt(r_star * r_star + i_star * i_star)

        @jax.jit
        def run(wave, variables):
            if pcm16_io:
                wave = wave.astype(jnp.float32) / 32768.0
            re, im = stft(wave, n_fft, hop)  # (2, F, T)
            pad_cfg = ((0, 0), (0, 0), (pad_l, pad_r))
            re_pad = jnp.pad(re, pad_cfg)
            im_pad = jnp.pad(im, pad_cfg)

            if tta:
                inv1 = 1.0 / lexmax_abs(re_pad, im_pad)
                m1 = masks_for(re_pad, im_pad, inv1, variables)[..., :n_frame]
                pad2 = ((0, 0), (0, 0), (pad2_l, pad2_r))
                re2 = jnp.pad(re, pad2)
                im2 = jnp.pad(im, pad2)
                inv2 = 1.0 / lexmax_abs(re2, im2)
                m2 = masks_for(re2, im2, inv2, variables)[..., shift:]
                mask = (m1 + m2[..., :n_frame]) * 0.5
            else:
                inv = 1.0 / jnp.max(jnp.sqrt(re * re + im * im))
                mask = masks_for(re_pad, im_pad, inv, variables)[..., :n_frame]

            def to_i16(w):
                # identical to utils.audio.write_wav's PCM_16 conversion
                w = jnp.clip(w, -1.0, 1.0 - 1.0 / 32768.0)
                return jnp.round(w * 32768.0).astype(jnp.int16)

            if is_cx:
                # complex mask multiply: y = m (*) X, v = X - y
                mr, mi = mask[:2], mask[2:]
                y_re = mr * re - mi * im
                y_im = mr * im + mi * re
                v_re, v_im = re - y_re, im - y_im
            else:
                y_re, y_im = mask * re, mask * im
                v_re, v_im = (1 - mask) * re, (1 - mask) * im

            y_wave = istft(y_re, y_im, n_fft, hop, n_samples)
            if only_instruments:
                # caller reconstructs vocals as mixture - instruments
                return (to_i16(y_wave),) if pcm16_io else (y_wave,)
            v_wave = istft(v_re, v_im, n_fft, hop, n_samples)
            if pcm16_io:
                return to_i16(y_wave), to_i16(v_wave)
            return y_wave, v_wave

        return run

    # ------------------------------------------------------------------
    # cross-song patch batching: many songs, one merged model stream
    # ------------------------------------------------------------------

    def _multiwave_fn(self, n_songs: int, n_samples: int, tta: bool,
                      pcm16_io: bool, only_instruments: bool = False):
        return self._cached_fn(
            ("multiwave", n_songs, n_samples, tta, pcm16_io,
             only_instruments),
            lambda: self._build_multiwave_fn(
                n_songs, n_samples, tta, pcm16_io, only_instruments
            ),
        )

    def _build_multiwave_fn(self, n_songs: int, n_samples: int, tta: bool,
                            pcm16_io: bool,
                            only_instruments: bool = False):
        """Jitted pipeline over a STACK of equal-length songs.

        Per-song semantics are identical to `_build_wave_fn` (per-song
        normalization, same windowing contract), but the patch axes of
        all songs are merged into ONE model-call stream before the
        `batchsize` chunking. This matters for wide-crop serving: at
        --cropsize 1024 a 60 s song is only 3 patches, and batch-3
        convs/LSTM underfill the MXU (measured MFU 11.35% -> 8.82%,
        BENCH_NOTES.md patch-geometry study); merging 8 songs restores
        batch-24 chunks while keeping the 1.6x overlap-FLOP saving.
        """
        model = self.model
        n_fft, hop = model.n_fft, model.hop_length
        crop, off, bs = self.cropsize, self.offset, self.batchsize
        S = n_songs

        from vocal_remover_tpu.ops.stft import num_frames

        n_frame = num_frames(n_samples, n_fft, hop)
        pad_l, pad_r, roi = make_padding(n_frame, crop, off)
        shift = roi // 2
        is_cx = model.is_complex

        def merged_masks(re_pad, im_pad, inv, variables):
            # re_pad/im_pad: (S, 2, F, T_pad); inv: (S,) per-song scale
            scale = inv[:, None, None, None]
            if is_cx:
                feats = jnp.concatenate([re_pad, im_pad], axis=1) * scale
            else:
                feats = jnp.sqrt(re_pad * re_pad + im_pad * im_pad) * scale
            patches = extract_patches(feats, crop, roi, off)  # (P,S,C,F,c)
            x = jnp.transpose(patches, (1, 0, 3, 4, 2))  # (S,P,F,crop,C)
            n_p = x.shape[1]
            x = x.reshape(S * n_p, *x.shape[2:])
            # pad the MERGED patch axis (not each song's frames) up to a
            # whole number of chunks; at most bs-1 wasted patches per
            # group instead of per song
            total = -(-(S * n_p) // bs) * bs
            if total != S * n_p:
                x = jnp.concatenate(
                    [x, jnp.zeros((total - S * n_p, *x.shape[1:]), x.dtype)],
                    axis=0,
                )
            out = jax.lax.map(
                lambda xb: model(variables, xb),
                x.reshape(total // bs, bs, *x.shape[1:]),
            )
            out = out.reshape(total, *out.shape[2:])[: S * n_p]
            out = out.reshape(S, n_p, *out.shape[1:])
            out = jnp.transpose(out, (0, 1, 4, 2, 3))  # (S,P,C,F,crop)
            return jax.vmap(lambda m: stitch_masks(m, off))(out)

        def lexmax_abs(re, im):
            r_star = jnp.max(re)
            i_star = jnp.max(jnp.where(re == r_star, im, -jnp.inf))
            return jnp.sqrt(r_star * r_star + i_star * i_star)

        @jax.jit
        def run(waves, variables):  # waves: (S, 2, n_samples)
            if pcm16_io:
                waves = waves.astype(jnp.float32) / 32768.0
            re, im = jax.vmap(lambda w: stft(w, n_fft, hop))(waves)
            pad_cfg = ((0, 0), (0, 0), (0, 0), (pad_l, pad_r))
            re_pad = jnp.pad(re, pad_cfg)
            im_pad = jnp.pad(im, pad_cfg)

            if tta:
                inv1 = 1.0 / jax.vmap(lexmax_abs)(re_pad, im_pad)
                m1 = merged_masks(re_pad, im_pad, inv1, variables)
                m1 = m1[..., :n_frame]
                pad2 = ((0, 0), (0, 0), (0, 0),
                        (pad_l + shift, pad_r + shift))
                re2 = jnp.pad(re, pad2)
                im2 = jnp.pad(im, pad2)
                inv2 = 1.0 / jax.vmap(lexmax_abs)(re2, im2)
                m2 = merged_masks(re2, im2, inv2, variables)[..., shift:]
                mask = (m1 + m2[..., :n_frame]) * 0.5
            else:
                inv = 1.0 / jnp.max(
                    jnp.sqrt(re * re + im * im), axis=(1, 2, 3)
                )
                mask = merged_masks(re_pad, im_pad, inv, variables)
                mask = mask[..., :n_frame]

            def to_i16(w):
                w = jnp.clip(w, -1.0, 1.0 - 1.0 / 32768.0)
                return jnp.round(w * 32768.0).astype(jnp.int16)

            if is_cx:
                mr, mi = mask[:, :2], mask[:, 2:]
                y_re = mr * re - mi * im
                y_im = mr * im + mi * re
                v_re, v_im = re - y_re, im - y_im
            else:
                y_re, y_im = mask * re, mask * im
                v_re, v_im = (1 - mask) * re, (1 - mask) * im

            do_istft = jax.vmap(
                lambda r, i: istft(r, i, n_fft, hop, n_samples)
            )
            y_wave = do_istft(y_re, y_im)
            if only_instruments:
                return (to_i16(y_wave),) if pcm16_io else (y_wave,)
            v_wave = do_istft(v_re, v_im)
            if pcm16_io:
                return to_i16(y_wave), to_i16(v_wave)
            return y_wave, v_wave

        return run

    def separate_waves(self, waves: np.ndarray, tta: bool = False,
                       pcm16_io: bool = False):
        """(S, 2, n_samples) stack of equal-length songs ->
        (instruments_stack, vocals_stack), each (S, 2, n_samples).

        Cross-song patch batching: all songs' patches run through one
        merged `batchsize`-chunked model stream (one device dispatch for
        the whole group). Per-song outputs match `separate_wave` — every
        patch sees the same model and its own song's normalization; only
        the chunk boundaries differ. Requires postprocess=False like
        `separate_wave`.
        """
        if self.postprocess:
            raise ValueError(
                "separate_waves is the pure-device path; postprocess "
                "requires the spectrogram API (separate/separate_tta)"
            )
        waves = np.asarray(waves)
        if waves.ndim != 3:
            raise ValueError("separate_waves expects a (S, 2, n) stack")
        run = self._multiwave_fn(waves.shape[0], waves.shape[-1], tta,
                                 pcm16_io)
        if pcm16_io and waves.dtype != np.int16:
            from vocal_remover_tpu import native

            enc = native.pcm16_encode(
                np.ascontiguousarray(waves, np.float32)
            )
            if enc is not None:
                waves = enc
            else:
                waves = np.clip(waves, -1.0, 1.0 - 1.0 / 32768.0)
                waves = np.round(waves * 32768.0).astype(np.int16)
        dtype = np.int16 if pcm16_io else np.float32
        y, v = run(np.ascontiguousarray(waves, dtype), self.variables)
        return np.asarray(y), np.asarray(v)

    def separate_wave(self, wave: np.ndarray, tta: bool = False,
                      pcm16_io: bool = False, bucket: int | None = None):
        """(2, n_samples) wave -> (instruments_wave, vocals_wave).

        Pure-device fast path; requires postprocess=False (the
        merge_artifacts refinement is data-dependent host logic; use
        `separate` for that path). With pcm16_io=True, takes/returns
        int16 PCM arrays (input float is quantized host-side first).

        bucket: round the song length up to a multiple of `bucket`
        samples with zero padding (outputs trimmed back), so every song
        shares one jitted executable per bucket instead of one per
        exact length (a whole-pipeline compile is minutes on a cold
        cache). Same scheme as directory-mode serving. The only
        numerical difference vs exact-length: the STFT's centered
        reflect padding at the song tail sees zeros instead of
        reflected audio, which perturbs the final <= n_fft samples at
        window-rolloff level.
        """
        if self.postprocess:
            raise ValueError(
                "separate_wave is the pure-device path; postprocess "
                "requires the spectrogram API (separate/separate_tta)"
            )
        n_orig = wave.shape[-1]
        if bucket:
            padded = -(-n_orig // bucket) * bucket
            if padded != n_orig:
                wave = np.pad(wave, ((0, 0), (0, padded - n_orig)))
        run = self._wave_fn(wave.shape[-1], tta, pcm16_io)
        if pcm16_io and wave.dtype != np.int16:
            from vocal_remover_tpu import native

            enc = native.pcm16_encode(np.ascontiguousarray(wave, np.float32))
            if enc is not None:
                wave = enc
            else:
                wave = np.clip(wave, -1.0, 1.0 - 1.0 / 32768.0)
                wave = np.round(wave * 32768.0).astype(np.int16)
        dtype = np.int16 if pcm16_io else np.float32
        y, v = run(np.ascontiguousarray(wave, dtype), self.variables)
        return (
            np.asarray(y)[:, :n_orig],
            np.asarray(v)[:, :n_orig],
        )

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

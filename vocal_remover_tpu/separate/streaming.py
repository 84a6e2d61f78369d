"""Streamed whole-song separation: constant memory, one compile.

`separate_wave` (separator.py) ships the whole song through one jitted
call — ideal for songs, but memory and compile time grow with length
(one compile per length bucket). This module processes audio of ANY
length in fixed-size segments of K patches each, with:

  * bit-faithful equality to the monolithic path (same masks, same
    overlap-add): each segment recomputes its one-patch halo so no
    cross-segment state is needed, zeroed "virtual padding" frames
    reproduce the global spectrogram padding, and the global
    normalization statistics are computed by a streamed device pass;
  * ONE compiled function per mode reused by every segment of every
    song (edge segments differ only in runtime arguments);
  * O(segment) device memory; host memory is O(segment) except in
    postprocess mode, which assembles the (small) full-song mask
    host-side for the artifact merge;
  * full feature parity with the monolithic path: TTA (the half-roi
    shifted second pass, reference inference.py:83-102) runs inside
    the same segment function, and `--postprocess` (merge_artifacts,
    reference lib/spec_utils.py:60-93) runs as a two-phase stream:
    mask phase -> host artifact merge -> apply phase.

Geometry (all in STFT frames; roi = cropsize - 2*offset, pad_l = offset
per the windowing contract, reference lib/dataset.py:198-205):

  segment k owns patches [kK, (k+1)K) => valid padded frames
  [kK*roi + off, ...), i.e. original frames [kK*roi, (k+1)K*roi).
  It computes patches [kK-1, (k+1)K+1) (one halo patch each side), so
  the masked frames needed by its overlap-add halo are local. The TTA
  pass re-extracts patches from the same local spectrogram on the grid
  shifted by -shift (= roi//2) frames; shifted patches [kK, (k+1)K]
  cover the same overlap-add span.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vocal_remover_tpu.ops.stft import (
    _device_frame_indices,
    hann_window,
    num_frames,
)
from vocal_remover_tpu.ops.windowing import extract_patches, stitch_masks


class StreamingSeparator:
    """Segment-streamed counterpart of Separator.separate_wave with the
    same normalization quirks per mode: global max |X| without TTA
    (reference inference.py:74), numpy-lexicographic complex max with
    TTA (inference.py:87,94 — zero padding included).
    """

    def __init__(self, model, variables, segment_patches=32, batchsize=8,
                 pcm16_io=False, vocals_residual=False, pipeline_depth=3,
                 tta=False, postprocess=False):
        """pcm16_io: exchange int16 PCM with the device (4x less link
        traffic; exact for PCM16 sources). vocals_residual: download
        only instruments and reconstruct vocals host-side as
        mixture - instruments (halves downloads and skips the vocals
        iSTFT; exact away from the global half-window edges, like
        SeparatorService's same option). pipeline_depth: how many
        segments the upload/dispatch stage may run ahead of the
        download stage. tta: average in the half-roi-shifted second
        pass. postprocess: merge_artifacts on the full-song mask
        (two streamed phases; host holds the mask, never the specs)."""
        if getattr(model, "is_complex", False):
            raise ValueError(
                "StreamingSeparator feeds magnitude patches and applies "
                "the mask as a real multiplier; complex-mask "
                "checkpoints separate through Separator instead"
            )
        self.model = model
        self.variables = jax.device_put(variables)
        self.bs = batchsize
        self.pcm16_io = pcm16_io
        self.vocals_residual = vocals_residual
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.tta = bool(tta)
        self.postprocess = bool(postprocess)
        # K + 2 (owned + halo patches) must fill whole chunks
        self.K = max(
            batchsize - 2,
            -(-(segment_patches + 2) // batchsize) * batchsize - 2,
        )
        self.offset = model.offset
        n_fft, hop = model.n_fft, model.hop_length
        assert model.offset * 2 <= 256  # crop = 2*roi geometry
        self.crop = 256 if model.offset == 64 else 4 * model.offset
        self.roi = self.crop - 2 * self.offset
        assert n_fft // 2 == hop, (
            "streaming assumes the default 50%-overlap STFT geometry"
        )
        self._seg_fns: dict = {}

    # -- static geometry -------------------------------------------------

    def _geometry(self):
        n_fft, hop = self.model.n_fft, self.model.hop_length
        K, roi, off, crop = self.K, self.roi, self.offset, self.crop
        pad = n_fft // 2
        seg_frames = (K + 3) * roi  # frames feeding K+2 patches
        slice_len = (seg_frames - 1) * hop + n_fft
        return n_fft, hop, K, roi, off, crop, pad, seg_frames, slice_len

    # -- the jitted segment functions ------------------------------------

    def _segment_fn(self, mode: str):
        """mode: 'direct' (mask model + reconstruction in one call),
        'mask' (postprocess phase 1: return the stitched mask), or
        'apply' (postprocess phase 2: reconstruct from a given mask).
        Cached per instance (an lru_cache on the bound method would pin
        the instance + jitted executable alive globally)."""
        fn = self._seg_fns.get(mode)
        if fn is None:
            fn = self._seg_fns[mode] = self._build_segment_fn(mode)
        return fn

    def _build_segment_fn(self, mode: str):
        (n_fft, hop, K, roi, off, crop, pad, seg_frames,
         slice_len) = self._geometry()
        model = self.model
        bs = self.bs
        n_patches = K + 2
        window = jnp.asarray(hann_window(n_fft))
        emit = K * roi * hop  # OLA positions emitted per segment
        span = K * roi + 2    # masked frames feeding the OLA halo
        shift = roi // 2
        pcm16 = self.pcm16_io
        only_y = self.vocals_residual
        tta = self.tta

        def spectrogram(wave_slice, frame_valid):
            """Local STFT with the global padding frames zeroed."""
            if pcm16:
                wave_slice = wave_slice.astype(jnp.float32) / 32768.0
            idx = _device_frame_indices(seg_frames, n_fft, hop)
            frames = wave_slice[:, idx] * window  # (2, seg_frames, n_fft)
            spec = jnp.fft.rfft(frames, axis=-1)
            re = jnp.real(spec).astype(jnp.float32)
            im = jnp.imag(spec).astype(jnp.float32)
            re = re * frame_valid[None, :, None]
            im = im * frame_valid[None, :, None]
            re = jnp.moveaxis(re, -1, -2)  # (2, F, seg_frames)
            im = jnp.moveaxis(im, -1, -2)
            return re, im

        def model_masks(feats, variables):
            """(2, F, (K+3)*roi) scaled magnitudes -> stitched mask;
            stitched index j covers original frame (a-1)*roi + j."""
            patches = extract_patches(feats, crop, roi, off)
            x = jnp.transpose(patches, (0, 2, 3, 1))
            out = jax.lax.map(
                lambda xb: model(variables, xb),
                x.reshape(n_patches // bs, bs, *x.shape[1:]),
            )
            out = out.reshape(n_patches, *out.shape[2:])
            out = jnp.transpose(out, (0, 3, 1, 2))
            return stitch_masks(out, off)

        def model_masks_shifted(feats, variables):
            """The TTA pass: patches on the grid shifted by -shift
            frames. Stitched index j covers original frame
            a*roi - shift + j; indices >= (K+1)*roi come from a
            zero-padded dummy patch and must not be read."""
            feats_pad = jnp.pad(feats, ((0, 0), (0, 0), (0, roi)))
            feats2 = jax.lax.slice_in_dim(
                feats_pad, roi - shift, roi - shift + seg_frames, axis=-1
            )
            return model_masks(feats2, variables)

        def mask_spans(re, im, inv_scale, variables, lo, n_take):
            """Averaged (TTA) or plain stitched mask over local frame
            window [lo, lo + n_take) in pass-1 stitched coordinates."""
            mag = jnp.sqrt(re * re + im * im) * inv_scale
            m1 = model_masks(mag, variables)
            m = jax.lax.slice_in_dim(m1, lo, lo + n_take, axis=-1)
            if tta:
                m2 = model_masks_shifted(mag, variables)
                # stitched2[j] = frame a*roi - shift + j; frame
                # (a-1)*roi + lo + t  <=>  j = lo + t + shift - roi
                lo2 = lo + shift - roi
                m2s = jax.lax.slice_in_dim(m2, lo2, lo2 + n_take, axis=-1)
                m = (m + m2s) * 0.5
            return m

        def ola_frames(fr):
            """(C, span, n_fft) frames -> OLA positions
            [hop, hop + emit) relative to frame A-1."""
            total = n_fft + hop * (span - 1)
            acc = jnp.zeros((fr.shape[0], total), jnp.float32)
            for g in range(2):  # n_fft/hop == 2 groups
                f_g = fr[:, g::2]
                tg = f_g.shape[1]
                flat = f_g.reshape(fr.shape[0], tg * n_fft)
                left = g * hop
                room = total - left
                if flat.shape[-1] > room:
                    flat = flat[:, :room]
                else:
                    flat = jnp.pad(flat,
                                   ((0, 0), (0, room - flat.shape[-1])))
                acc = acc + jnp.pad(flat, ((0, 0), (left, 0)))
            return acc[:, hop : hop + emit]

        def reconstruct(m, re, im, frame_valid):
            """Masked span -> (instruments[, vocals]) emitted samples."""
            xr = jax.lax.slice_in_dim(re, roi + off - 1, roi + off - 1 + span,
                                      axis=-1)
            xi = jax.lax.slice_in_dim(im, roi + off - 1, roi + off - 1 + span,
                                      axis=-1)
            yr, yi = m * xr, m * xi

            # the global window-sum-square slice for the emitted
            # positions == local OLA of window^2 over the span's VALID
            # frames (invalid = global spectrogram padding contributes
            # no window energy), so it needs no host transfer. As math:
            # wss(t) = sum_k valid[k] w^2(t - k*hop) — a hop-strided
            # transposed convolution of the validity vector with w^2,
            # O(span * n_fft) MACs instead of materializing the
            # (span, n_fft) window-frame array for a full OLA pass.
            valid_span = jax.lax.slice_in_dim(
                frame_valid, roi + off - 1, roi + off - 1 + span, axis=0
            )
            wss_full = jax.lax.conv_transpose(
                valid_span[None, None, :],
                (window * window)[None, None, :],
                strides=(hop,),
                padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
                transpose_kernel=True,
                precision=jax.lax.Precision.HIGHEST,
            )[0, 0]
            wss = wss_full[hop : hop + emit]
            tiny = np.finfo(np.float32).tiny

            def ola(sr_, si_):
                s = jax.lax.complex(
                    jnp.moveaxis(sr_, -1, -2), jnp.moveaxis(si_, -1, -2)
                )
                fr = jnp.fft.irfft(s, n=n_fft, axis=-1) * window
                acc = ola_frames(fr)
                return jnp.where(wss > tiny, acc / jnp.maximum(wss, tiny),
                                 acc)

            def quant(wv):
                if not pcm16:
                    return wv
                wv = jnp.clip(wv, -1.0, 1.0 - 1.0 / 32768.0)
                return jnp.round(wv * 32768.0).astype(jnp.int16)

            y = quant(ola(yr, yi))
            if only_y:
                return (y,)
            vr, vi = (1 - m) * xr, (1 - m) * xi
            v = quant(ola(vr, vi))
            return y, v

        if mode == "direct":
            @jax.jit
            def run(wave_slice, frame_valid, inv_scale, variables):
                re, im = spectrogram(wave_slice, frame_valid)
                # masked frames needed for OLA: [A-1, B+1); stitched-mask
                # index of frame A-1 = a*roi - 1 is roi - 1
                m = mask_spans(re, im, inv_scale, variables, roi - 1, span)
                return reconstruct(m, re, im, frame_valid)

            return run

        if mode == "mask":
            @jax.jit
            def run_mask(wave_slice, frame_valid, inv_scale, variables):
                re, im = spectrogram(wave_slice, frame_valid)
                # emitted frames [A, B) only; neighbors cover the halo
                return mask_spans(re, im, inv_scale, variables, roi, K * roi)

            return run_mask

        if mode == "apply":
            @jax.jit
            def run_apply(wave_slice, frame_valid, mask_span):
                re, im = spectrogram(wave_slice, frame_valid)
                return reconstruct(mask_span, re, im, frame_valid)

            return run_apply

        raise ValueError(f"unknown segment mode {mode!r}")

    # -- host orchestration ----------------------------------------------

    def _wave_window(self, wave, lo, hi):
        """wave samples [lo, hi) with librosa-style reflect padding
        beyond the ends (only the global edges ever reflect)."""
        L = wave.shape[-1]
        if lo >= 0 and hi <= L:
            return wave[:, lo:hi]
        idx = np.arange(lo, hi)
        idx = np.abs(idx)  # left reflect
        idx = np.where(idx >= L, 2 * L - 2 - idx, idx)  # right reflect
        idx = np.clip(idx, 0, L - 1)
        return wave[:, idx]

    def _encode_input(self, wave):
        if self.pcm16_io and wave.dtype != np.int16:
            from vocal_remover_tpu import native

            enc = native.pcm16_encode(np.ascontiguousarray(wave, np.float32))
            if enc is None:
                enc = np.round(
                    np.clip(wave, -1, 1 - 1 / 32768.0) * 32768.0
                ).astype(np.int16)
            return enc
        if not self.pcm16_io:
            return np.ascontiguousarray(wave, np.float32)
        return wave

    def _segments(self, n_segments, n_frame, wave):
        """Generate (k, p0, wave_slice, frame_valid) per segment."""
        (n_fft, hop, K, roi, off, crop, pad, seg_frames,
         slice_len) = self._geometry()
        for k in range(n_segments):
            a = k * K  # first owned patch
            # segment frames (orig coords): [(a-1)*roi - off, ...)
            f0 = (a - 1) * roi - off
            lo = f0 * hop - pad
            win = self._wave_window(wave, lo, lo + slice_len)
            valid = (
                (np.arange(f0, f0 + seg_frames) >= 0)
                & (np.arange(f0, f0 + seg_frames) < n_frame)
            ).astype(np.float32)
            # OLA positions emitted: [A*hop, B*hop), A = a*roi
            yield k, a * roi * hop, win, valid

    def _pipelined(self, produce, consume):
        """Run `produce(put) -> None` in a thread dispatching device work
        ahead (bounded by pipeline_depth) while this thread consumes
        results in order; errors on either side propagate."""
        import queue as _queue
        import threading as _threading

        q: _queue.Queue = _queue.Queue(maxsize=self.pipeline_depth)
        stop = _threading.Event()

        def _put(item) -> bool:
            # bounded put that gives up when the consumer has stopped —
            # otherwise a consumer-side error would leave this thread
            # blocked on the full queue forever (plus its in-flight
            # device buffers)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except _queue.Full:
                    continue
            return False

        def producer():
            try:
                produce(_put, stop)
            except BaseException as e:  # surface in the consumer
                _put(e)
                return
            _put(None)

        _threading.Thread(target=producer, daemon=True).start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                consume(item)
        finally:
            stop.set()

    def separate_wave(self, wave: np.ndarray):
        """(2, L) wave -> (instruments, vocals), streaming segments.
        Matches Separator.separate_wave / the spectrogram-API path
        (same TTA and postprocess semantics) within float tolerance for
        any length. With pcm16_io, takes float or int16 input and
        returns int16 PCM."""
        (n_fft, hop, K, roi, off, crop, pad, seg_frames,
         slice_len) = self._geometry()
        L = wave.shape[-1]
        n_frame = num_frames(L, n_fft, hop)
        n_valid = -(-n_frame // roi) * roi  # frames covered by patches
        n_segments = -(-n_valid // (K * roi))

        wave_x = self._encode_input(wave)

        # pass 1 (streamed, on device): global normalization statistics
        mag_max, r_star, i_star = self._global_spec_stats(wave_x)
        if self.tta:
            # reference separate_tta normalizes by the numpy-
            # lexicographic complex max of the PADDED spectrogram
            # (inference.py:87,94): max real part, then max imag among
            # its achievers; zero padding contributes a (0, 0) candidate
            if 0.0 > r_star or (0.0 == r_star and 0.0 > i_star):
                r_star, i_star = 0.0, 0.0
            scale = float(np.sqrt(r_star * r_star + i_star * i_star))
        else:
            scale = mag_max
        inv_scale = np.float32(1.0 / scale if scale > 0 else 1.0)

        out_dtype = np.int16 if self.pcm16_io else np.float32
        y_out = np.zeros((2, L), out_dtype)
        v_out = np.zeros((2, L), out_dtype)
        emit = K * roi * hop
        wave = wave_x  # device windows come from the (maybe int16) wave

        def drain_waves(item):
            p0, outs = item
            y_seg = outs[0]
            # output samples [p0 - pad, p0 - pad + emit)
            s0 = p0 - pad
            src0 = max(0, -s0)
            dst0 = max(0, s0)
            n_copy = min(emit - src0, L - dst0)
            if n_copy <= 0:
                return
            y_host = np.asarray(y_seg[:, src0 : src0 + n_copy])
            y_out[:, dst0 : dst0 + n_copy] = y_host
            if len(outs) > 1:
                v_out[:, dst0 : dst0 + n_copy] = np.asarray(
                    outs[1][:, src0 : src0 + n_copy]
                )
            else:  # vocals by residual: mixture - instruments
                x_host = wave[:, dst0 : dst0 + n_copy]
                if out_dtype == np.int16:
                    vv = x_host.astype(np.int32) - y_host.astype(np.int32)
                    v_out[:, dst0 : dst0 + n_copy] = np.clip(
                        vv, -32768, 32767
                    ).astype(np.int16)
                else:  # float path: plain float residual
                    v_out[:, dst0 : dst0 + n_copy] = x_host - y_host

        if not self.postprocess:
            run = self._segment_fn("direct")

            def produce(put, stop_evt):
                for k, p0, win, valid in self._segments(
                    n_segments, n_frame, wave
                ):
                    if stop_evt.is_set():
                        return
                    outs = run(win, valid, inv_scale,
                               self.variables)  # async dispatch
                    if not put((p0, outs)):
                        return

            self._pipelined(produce, drain_waves)
        else:
            self._separate_postprocess(
                wave, n_segments, n_frame, n_valid, inv_scale, drain_waves
            )

        # the centered iSTFT's natural length is hop*(n_frame-1); the
        # monolithic path zero-pads beyond it (ops/stft.py istft length
        # handling) — reproduce that tail exactly
        natural = hop * (n_frame - 1)
        if natural < L:
            y_out[:, natural:] = 0
            if self.vocals_residual:  # v = mixture - 0 there
                v_out[:, natural:] = wave[:, natural:]
            else:
                v_out[:, natural:] = 0
        return y_out, v_out

    def _separate_postprocess(self, wave, n_segments, n_frame, n_valid,
                              inv_scale, drain_waves):
        """Two-phase postprocess stream: (1) download each segment's
        stitched mask and assemble the full-song mask host-side — the
        only O(song) host buffer, (2, F, T) f32, as in the reference's
        host postprocess — (2) merge_artifacts on it, (3) re-stream the
        segments applying the refined mask."""
        from vocal_remover_tpu.utils.spec import merge_artifacts

        (n_fft, hop, K, roi, off, crop, pad, seg_frames,
         slice_len) = self._geometry()
        n_bins = n_fft // 2 + 1
        full_mask = np.zeros((2, n_bins, n_valid), np.float32)

        mask_fn = self._segment_fn("mask")

        def produce_masks(put, stop_evt):
            for k, p0, win, valid in self._segments(
                n_segments, n_frame, wave
            ):
                if stop_evt.is_set():
                    return
                m = mask_fn(win, valid, inv_scale, self.variables)
                if not put((k, m)):
                    return

        def drain_masks(item):
            k, m = item
            f_lo = k * K * roi
            n_take = min(K * roi, n_valid - f_lo)
            full_mask[:, :, f_lo : f_lo + n_take] = np.asarray(
                m[:, :, :n_take]
            )

        self._pipelined(produce_masks, drain_masks)

        refined = merge_artifacts(full_mask[:, :, :n_frame])

        apply_fn = self._segment_fn("apply")
        span = K * roi + 2

        def produce_apply(put, stop_evt):
            for k, p0, win, valid in self._segments(
                n_segments, n_frame, wave
            ):
                if stop_evt.is_set():
                    return
                # mask for frames [A-1, B+1); out-of-range frames hit
                # zeroed spectrogram so any value works — pad with zeros
                a_roi = k * K * roi
                lo = a_roi - 1
                m_span = np.zeros((2, n_bins, span), np.float32)
                s_lo = max(0, lo)
                s_hi = min(n_frame, lo + span)
                if s_hi > s_lo:
                    m_span[:, :, s_lo - lo : s_hi - lo] = refined[
                        :, :, s_lo:s_hi
                    ]
                outs = apply_fn(win, valid, m_span)
                if not put((a_roi * hop, outs)):
                    return

        self._pipelined(produce_apply, drain_waves)

    # -- global normalization statistics (streamed device reduction) -----

    def _global_spec_stats(self, wave, chunk_frames=4096):
        """One streamed device pass over the song's STFT frames
        returning (max |X|, lexicographic-max real, its max imag) —
        exactly the global spectrogram's frames (reflect-padded edges
        included), with no O(song) host FFT and no O(chunk) constants
        baked into the graph. The lexicographic complex max is only
        consumed by TTA normalization, so non-TTA streams skip those
        reductions and return zeros for (r, i)."""
        n_fft, hop = self.model.n_fft, self.model.hop_length
        pad = n_fft // 2
        n_frame = num_frames(wave.shape[-1], n_fft, hop)
        # chunk_frames stays FIXED across songs (short songs mask the
        # tail) so this helper, too, compiles exactly once
        slice_len = (chunk_frames - 1) * hop + n_fft
        tta = self.tta
        fn = self._seg_fns.get(("stats", chunk_frames, tta))
        if fn is None:
            pcm16 = self.pcm16_io
            window = jnp.asarray(hann_window(n_fft))

            @jax.jit
            def stats(win, valid):
                if pcm16:
                    win = win.astype(jnp.float32) / 32768.0
                idx = _device_frame_indices(chunk_frames, n_fft, hop)
                frames = win[:, idx] * window
                spec = jnp.fft.rfft(frames, axis=-1)
                re = jnp.real(spec).astype(jnp.float32)
                im = jnp.imag(spec).astype(jnp.float32)
                ok = valid[None, :, None] > 0
                mag = jnp.where(ok, jnp.sqrt(re * re + im * im), 0.0)
                if not tta:
                    return (jnp.max(mag),)
                neg = jnp.float32(-np.inf)
                r_max = jnp.max(jnp.where(ok, re, neg))
                i_at = jnp.max(jnp.where(ok & (re == r_max), im, neg))
                return jnp.max(mag), r_max, i_at

            fn = self._seg_fns[("stats", chunk_frames, tta)] = stats

        mag_max = 0.0
        cands = []
        for t0 in range(0, n_frame, chunk_frames):
            lo = t0 * hop - pad
            win = self._wave_window(wave, lo, lo + slice_len)
            t = np.arange(t0, t0 + chunk_frames)
            valid = (t < n_frame).astype(np.float32)
            out = fn(win, valid)
            mag_max = max(mag_max, float(out[0]))
            if tta:
                cands.append((float(out[1]), float(out[2])))
        if tta:
            r_star = max(r for r, _ in cands)
            i_star = max(i for r, i in cands if r == r_star)
        else:
            r_star = i_star = 0.0
        return (mag_max if mag_max > 0 else 1.0), r_star, i_star

"""Streamed whole-song separation: constant memory, one compile.

`separate_wave` (separator.py) ships the whole song through one jitted
call — ideal for songs, but memory and compile time grow with length
(one compile per length bucket). This module processes audio of ANY
length in fixed-size segments of K patches each, with:

  * bit-faithful equality to the monolithic path (same masks, same
    overlap-add): each segment recomputes its one-patch halo so no
    cross-segment state is needed, zeroed "virtual padding" frames
    reproduce the global spectrogram padding, and the global
    window-sum-square normalization is passed in per segment;
  * ONE compiled function reused by every segment of every song
    (edge segments differ only in runtime arguments);
  * O(segment) device and host memory.

Geometry (all in STFT frames; roi = cropsize - 2*offset, pad_l = offset
per the windowing contract, reference lib/dataset.py:198-205):

  segment k owns patches [kK, (k+1)K) => valid padded frames
  [kK*roi + off, ...), i.e. original frames [kK*roi, (k+1)K*roi).
  It computes patches [kK-1, (k+1)K+1) (one halo patch each side), so
  the masked frames needed by its overlap-add halo are local.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vocal_remover_tpu.ops.stft import hann_window, num_frames
from vocal_remover_tpu.ops.windowing import extract_patches, stitch_masks


class StreamingSeparator:
    """Segment-streamed counterpart of Separator.separate_wave
    (separate-mode normalization: global max |X|; no TTA/postprocess).
    """

    def __init__(self, model, variables, segment_patches=32, batchsize=8,
                 pcm16_io=False, vocals_residual=False, pipeline_depth=3):
        """pcm16_io: exchange int16 PCM with the device (4x less link
        traffic; exact for PCM16 sources). vocals_residual: download
        only instruments and reconstruct vocals host-side as
        mixture - instruments (halves downloads and skips the vocals
        iSTFT; exact away from the global half-window edges, like
        SeparatorService's same option). pipeline_depth: how many
        segments the upload/dispatch stage may run ahead of the
        download stage."""
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

    # -- static geometry -------------------------------------------------

    def _geometry(self):
        n_fft, hop = self.model.n_fft, self.model.hop_length
        K, roi, off, crop = self.K, self.roi, self.offset, self.crop
        pad = n_fft // 2
        seg_frames = (K + 3) * roi  # frames feeding K+2 patches
        slice_len = (seg_frames - 1) * hop + n_fft
        return n_fft, hop, K, roi, off, crop, pad, seg_frames, slice_len

    # -- the single jitted segment function ------------------------------

    def _segment_fn(self):
        # per-instance cache (an lru_cache on the bound method would pin
        # the instance + jitted executable alive globally)
        fn = getattr(self, "_segment_fn_cached", None)
        if fn is not None:
            return fn
        fn = self._build_segment_fn()
        self._segment_fn_cached = fn
        return fn

    def _build_segment_fn(self):
        (n_fft, hop, K, roi, off, crop, pad, seg_frames,
         slice_len) = self._geometry()
        model = self.model
        bs = self.bs
        n_patches = K + 2
        window = jnp.asarray(hann_window(n_fft))
        emit = K * roi * hop  # OLA positions emitted per segment
        pcm16 = self.pcm16_io
        only_y = self.vocals_residual

        @jax.jit
        def run(wave_slice, frame_valid, inv_scale, variables):
            if pcm16:
                wave_slice = wave_slice.astype(jnp.float32) / 32768.0
            # frames of the original spectrogram covered by this segment
            idx = (
                np.arange(seg_frames)[:, None] * hop
                + np.arange(n_fft)[None, :]
            )
            frames = wave_slice[:, idx] * window  # (2, seg_frames, n_fft)
            spec = jnp.fft.rfft(frames, axis=-1)
            re = jnp.real(spec).astype(jnp.float32)
            im = jnp.imag(spec).astype(jnp.float32)
            # zero the virtual spectrogram-padding frames
            re = re * frame_valid[None, :, None]
            im = im * frame_valid[None, :, None]
            re = jnp.moveaxis(re, -1, -2)  # (2, F, seg_frames)
            im = jnp.moveaxis(im, -1, -2)

            mag = jnp.sqrt(re * re + im * im) * inv_scale
            patches = extract_patches(mag, crop, roi, off)  # (K+2, 2, F, crop)
            x = jnp.transpose(patches, (0, 2, 3, 1))
            out = jax.lax.map(
                lambda xb: model(variables, xb),
                x.reshape(n_patches // bs, bs, *x.shape[1:]),
            )
            out = out.reshape(n_patches, *out.shape[2:])
            out = jnp.transpose(out, (0, 3, 1, 2))
            mask = stitch_masks(out, off)  # rel frames [off, off+(K+2)*roi)

            # masked original frames needed for OLA: [A-1, B+1).
            # stitched-mask index j <-> original frame (a-1)*roi + j, so
            # frame A-1 = a*roi - 1 is j = roi - 1; the local spectrogram
            # rel index of the same frame is r = j + off.
            span = K * roi + 2
            m = mask[:, :, roi - 1 : roi - 1 + span]
            xr = re[:, :, roi + off - 1 : roi + off - 1 + span]
            xi = im[:, :, roi + off - 1 : roi + off - 1 + span]
            yr, yi = m * xr, m * xi
            vr, vi = (1 - m) * xr, (1 - m) * xi

            # the global window-sum-square slice for the emitted
            # positions == local OLA of window^2 over the span's VALID
            # frames (invalid = global spectrogram padding contributes
            # no window energy), so it needs no host transfer
            valid_span = frame_valid[roi + off - 1 : roi + off - 1 + span]
            w2 = (window * window)[None, :] * valid_span[:, None]

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

            wss = ola_frames(w2[None])[0]
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
            v = quant(ola(vr, vi))
            return y, v

        return run

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

    def separate_wave(self, wave: np.ndarray):
        """(2, L) wave -> (instruments, vocals), streaming segments.
        Matches Separator.separate_wave (non-TTA) within float tolerance
        for any length. With pcm16_io, takes float or int16 input and
        returns int16 PCM."""
        (n_fft, hop, K, roi, off, crop, pad, seg_frames,
         slice_len) = self._geometry()
        L = wave.shape[-1]
        n_frame = num_frames(L, n_fft, hop)
        n_valid = -(-n_frame // roi) * roi  # frames covered by patches
        n_segments = -(-n_valid // (K * roi))

        if self.pcm16_io and wave.dtype != np.int16:
            from vocal_remover_tpu import native

            enc = native.pcm16_encode(np.ascontiguousarray(wave, np.float32))
            if enc is None:
                enc = np.round(
                    np.clip(wave, -1, 1 - 1 / 32768.0) * 32768.0
                ).astype(np.int16)
            wave_x = enc
        elif not self.pcm16_io:
            wave_x = np.ascontiguousarray(wave, np.float32)
        else:
            wave_x = wave

        # pass 1: global max |X| (reference inference.py:74), streamed
        # (chunk-wise; int16 input is dequantized per chunk)
        inv_scale = np.float32(1.0 / self._global_mag_max(wave_x))

        run = self._segment_fn()

        out_dtype = np.int16 if self.pcm16_io else np.float32
        y_out = np.zeros((2, L), out_dtype)
        v_out = np.zeros((2, L), out_dtype)
        emit = K * roi * hop
        wave = wave_x  # device windows come from the (maybe int16) wave

        def drain(item):
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

        # segment pipeline: a producer thread windows + dispatches
        # segments (H2D + device compute run ahead) while this thread
        # drains results (D2H) in order — uploads, compute, and
        # downloads of adjacent segments all overlap, so the streamed
        # path sustains max(up, compute, down) per segment instead of
        # their sum (the same 3-stage shape as SeparatorService).
        import queue as _queue
        import threading as _threading

        q: _queue.Queue = _queue.Queue(maxsize=self.pipeline_depth)
        stop = _threading.Event()

        def _put(item) -> bool:
            # bounded put that gives up when the consumer has stopped —
            # otherwise a drain()-side error would leave this thread
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
                for k in range(n_segments):
                    if stop.is_set():
                        return
                    a = k * K  # first owned patch
                    # segment frames (orig coords): [(a-1)*roi - off, …)
                    f0 = (a - 1) * roi - off
                    lo = f0 * hop - pad
                    win = self._wave_window(wave, lo, lo + slice_len)
                    valid = (
                        (np.arange(f0, f0 + seg_frames) >= 0)
                        & (np.arange(f0, f0 + seg_frames) < n_frame)
                    ).astype(np.float32)
                    # OLA positions emitted: [A*hop, B*hop), A = a*roi
                    p0 = a * roi * hop
                    outs = run(win, valid, inv_scale,
                               self.variables)  # async dispatch
                    if not _put((p0, outs)):
                        return
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
                drain(item)
        finally:
            stop.set()
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

    def _global_mag_max(self, wave, chunk_frames=4096):
        """max |STFT(wave)| streamed frame-chunk-wise — exactly the
        global spectrogram's frames (reflect-padded edges included)."""
        n_fft, hop = self.model.n_fft, self.model.hop_length
        pad = n_fft // 2
        L = wave.shape[-1]
        n_frame = num_frames(L, n_fft, hop)
        w = hann_window(n_fft, np.float64)
        best = 0.0
        for t0 in range(0, n_frame, chunk_frames):
            t1 = min(t0 + chunk_frames, n_frame)
            lo = t0 * hop - pad
            win = self._wave_window(wave, lo, (t1 - 1) * hop - pad + n_fft)
            if win.dtype == np.int16:
                win = win.astype(np.float32) / 32768.0
            idx = (
                np.arange(t1 - t0)[:, None] * hop
                + np.arange(n_fft)[None, :]
            )
            spec = np.fft.rfft(win[:, idx] * w, axis=-1).astype(np.complex64)
            best = max(best, float(np.abs(spec).max()))
        return best if best > 0 else 1.0

"""Pipelined separation service — sustained-throughput serving path.

The single-song `Separator.separate_wave` call is bounded by host-link
transfers and per-call dispatch latency, not device compute. For
production serving (many songs / long queues), this service overlaps
the three phases in a 3-stage thread pipeline:

    uploader:   host wave -> device (device_put)
    dispatcher: jitted whole-song pipeline (async dispatch)
    downloader: device separated waves -> host

so sustained throughput approaches max(upload, compute, download)
instead of their sum. PCM16 I/O keeps link traffic minimal.
"""

from __future__ import annotations

import queue
import threading

import jax
import numpy as np


class SeparatorService:
    def __init__(self, separator, pcm16_io: bool = True, tta: bool = False,
                 depth: int = 3, vocals_residual: bool = False,
                 group: int = 1, max_pending: int | None = None):
        """vocals_residual: download only the instruments stream and
        reconstruct vocals host-side as `mixture - instruments` (exact
        at PCM16 resolution by iSTFT linearity: istft((1-m)X) =
        istft(X) - istft(mX), and istft(X) == the input wave away from
        the first/last half-window). Halves device->host traffic.

        group: cross-song patch batching — equal-length songs are
        stacked `group` at a time and run through ONE merged model
        stream (Separator.separate_waves). At wide cropsizes a single
        song has too few patches to fill the chip (3 patches at
        --cropsize 1024 for 60 s), so merging groups restores full
        `batchsize` chunks; measured +28% device throughput at crop
        1024 (BENCH_NOTES.md round 3). Songs are buffered PER LENGTH,
        so interleaved lengths still form full groups; outputs are
        re-ordered to input order before yielding. Leftover partial
        groups at end-of-stream run through the per-song pipeline —
        no repeat-padding, no wasted model FLOPs.

        max_pending: bound on songs held for grouping/reordering
        (default `max(8, 4 * group)`). When exceeded, the buffer
        holding the oldest song is flushed through the per-song path
        so memory and latency stay bounded on adversarial length
        sequences."""
        self.sep = separator
        self.pcm16_io = pcm16_io
        self.tta = tta
        self.depth = depth
        self.vocals_residual = vocals_residual
        self.group = max(1, group)
        self.max_pending = max_pending or max(8, 4 * self.group)

    def _prepare(self, wave: np.ndarray) -> np.ndarray:
        if self.pcm16_io and wave.dtype != np.int16:
            from vocal_remover_tpu import native

            enc = native.pcm16_encode(
                np.ascontiguousarray(wave, np.float32)
            )
            if enc is not None:
                return enc
            w = np.clip(wave, -1.0, 1.0 - 1.0 / 32768.0)
            return np.round(w * 32768.0).astype(np.int16)
        if not self.pcm16_io:
            return np.ascontiguousarray(wave, np.float32)
        return wave

    def map(self, waves):
        """Separate an iterable of (2, n) waves; yields (y, v) host
        arrays in input order. Compile happens once per distinct length
        (plus one per distinct (group, length) with group > 1)."""
        q_up: queue.Queue = queue.Queue(maxsize=self.depth)
        q_out: queue.Queue = queue.Queue(maxsize=self.depth)
        sep, tta, pcm16 = self.sep, self.tta, self.pcm16_io
        group = self.group

        resid = self.vocals_residual and self.pcm16_io

        def uploader():
            def put_single(idx, w):
                run = sep._wave_fn(w.shape[-1], tta, pcm16, resid)
                q_up.put((run, jax.device_put(w), w, (idx,)))

            def put_group(buf):
                idxs = tuple(i for i, _ in buf)
                stack = np.stack([w for _, w in buf])
                run = sep._multiwave_fn(
                    len(buf), stack.shape[-1], tta, pcm16, resid
                )
                q_up.put((run, jax.device_put(stack), stack, idxs))

            try:
                if group == 1:
                    for idx, w in enumerate(waves):
                        put_single(idx, self._prepare(w))
                else:
                    buffers: dict = {}  # length -> [(idx, wave), ...]
                    pending = 0
                    for idx, w in enumerate(waves):
                        w = self._prepare(w)
                        buf = buffers.setdefault(w.shape[-1], [])
                        buf.append((idx, w))
                        pending += 1
                        if len(buf) == group:
                            put_group(buf)
                            pending -= group
                            del buffers[w.shape[-1]]
                        elif pending > self.max_pending:
                            # flush the buffer holding the oldest song
                            # through the per-song path (bounds memory
                            # and head-of-line latency)
                            key = min(buffers, key=lambda k: buffers[k][0][0])
                            for i, ww in buffers.pop(key):
                                put_single(i, ww)
                                pending -= 1
                    # end of stream: leftover partial groups run
                    # per-song — exact work, no repeat-padding
                    for buf in sorted(buffers.values(), key=lambda b: b[0][0]):
                        for i, ww in buf:
                            put_single(i, ww)
            except BaseException as e:
                q_up.put(e)
                return
            q_up.put(None)

        def dispatcher():
            try:
                while True:
                    item = q_up.get()
                    if item is None or isinstance(item, BaseException):
                        q_out.put(item)
                        return
                    run, dev, host_w, idxs = item
                    out = run(dev, sep.variables)  # async dispatch
                    y = out[0]
                    v = out[1] if len(out) > 1 else None
                    q_out.put((y, v, host_w, idxs))
            except BaseException as e:
                q_out.put(e)

        threading.Thread(target=uploader, daemon=True).start()
        threading.Thread(target=dispatcher, daemon=True).start()

        done: dict = {}  # original index -> (y, v) host pair
        next_idx = 0
        finished = False
        while True:
            while next_idx in done:
                yield done.pop(next_idx)
                next_idx += 1
            if finished:
                return
            item = q_out.get()
            if item is None:
                finished = True
                continue
            if isinstance(item, BaseException):
                raise item
            y, v, host_w, idxs = item
            y = np.asarray(y)
            if v is not None:
                v = np.asarray(v)
            if len(idxs) == 1:  # per-song dispatch: add the stack axis
                y, v = y[None], (None if v is None else v[None])
                host_w = host_w[None]
            for k, idx in enumerate(idxs):
                if resid:
                    vv = (host_w[k].astype(np.int32)
                          - y[k].astype(np.int32))
                    vv = np.clip(vv, -32768, 32767).astype(np.int16)
                    done[idx] = (y[k], vv)
                else:
                    done[idx] = (y[k], v[k])

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
                 group: int = 1):
        """vocals_residual: download only the instruments stream and
        reconstruct vocals host-side as `mixture - instruments` (exact
        at PCM16 resolution by iSTFT linearity: istft((1-m)X) =
        istft(X) - istft(mX), and istft(X) == the input wave away from
        the first/last half-window). Halves device->host traffic.

        group: cross-song patch batching — consecutive equal-length
        songs are stacked `group` at a time and run through ONE merged
        model stream (Separator.separate_waves). At wide cropsizes a
        single song has too few patches to fill the chip (3 patches at
        --cropsize 1024 for 60 s), so merging groups restores full
        `batchsize` chunks; measured +28% device throughput at crop
        1024 (BENCH_NOTES.md round 3). A length change flushes the
        current group (output order is always preserved); a final
        partial group is padded by repeating its last song so every
        group reuses the same compiled executable."""
        self.sep = separator
        self.pcm16_io = pcm16_io
        self.tta = tta
        self.depth = depth
        self.vocals_residual = vocals_residual
        self.group = max(1, group)

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
        arrays in order. Compile happens once per distinct length
        (per distinct (group, length) with group > 1)."""
        q_up: queue.Queue = queue.Queue(maxsize=self.depth)
        q_out: queue.Queue = queue.Queue(maxsize=self.depth)
        sep, tta, pcm16 = self.sep, self.tta, self.pcm16_io
        group = self.group

        resid = self.vocals_residual and self.pcm16_io

        def uploader():
            def put_group(buf):
                n_valid = len(buf)
                while len(buf) < group:  # pad final partial group
                    buf.append(buf[-1])
                stack = np.stack(buf)
                run = sep._multiwave_fn(
                    group, stack.shape[-1], tta, pcm16, resid
                )
                q_up.put((run, jax.device_put(stack), stack, n_valid))

            try:
                if group == 1:
                    for w in waves:
                        w = self._prepare(w)
                        run = sep._wave_fn(w.shape[-1], tta, pcm16, resid)
                        dev = jax.device_put(w)
                        q_up.put((run, dev, w, 1))
                else:
                    buf: list = []
                    for w in waves:
                        w = self._prepare(w)
                        if buf and buf[-1].shape != w.shape:
                            put_group(buf)  # length change: flush
                            buf = []
                        buf.append(w)
                        if len(buf) == group:
                            put_group(buf)
                            buf = []
                    if buf:
                        put_group(buf)
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
                    run, dev, host_w, n_valid = item
                    out = run(dev, sep.variables)  # async dispatch
                    y = out[0]
                    v = out[1] if len(out) > 1 else None
                    q_out.put((y, v, host_w, n_valid))
            except BaseException as e:
                q_out.put(e)

        threading.Thread(target=uploader, daemon=True).start()
        threading.Thread(target=dispatcher, daemon=True).start()

        while True:
            item = q_out.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            y, v, host_w, n_valid = item
            y = np.asarray(y)
            if v is not None:
                v = np.asarray(v)
            if group == 1:
                y, v = y[None], (None if v is None else v[None])
                host_w = host_w[None]
            for i in range(n_valid):
                if resid:
                    vv = host_w[i].astype(np.int32) - y[i].astype(np.int32)
                    yield y[i], np.clip(vv, -32768, 32767).astype(np.int16)
                else:
                    yield y[i], v[i]

"""Jitted training / evaluation steps.

Capability-parity with reference train.py:68-134 (`train_epoch` /
`validate_epoch`): L1 mask loss, gradient accumulation with leftover
flush, per-sample loss averaging, eval on the offset-trimmed masked
spectrogram — re-architected for TPU:

  * The whole update (forward, backward, Adam, BN stat update) is ONE
    jitted function; with a mesh, batches are sharded over the `data`
    axis and XLA inserts the gradient psum (no DDP analog needed).
  * Loss accumulation stays on device (no per-step .item() sync — the
    reference pays a D2H round trip every iteration, train.py:98).
  * Gradient accumulation keeps a device-resident grad buffer scaled by
    1/A, applied every A microbatches (and flushed at epoch end),
    matching reference train.py:91-104.
  * The LR is injected optimizer state (optax.inject_hyperparams), so
    the host-side ReduceLROnPlateau controller can update it without
    recompiling.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
import optax

from vocal_remover_tpu.nn.partition import merge, partition
from vocal_remover_tpu.parallel import mesh as mesh_lib
from vocal_remover_tpu.train import losses
from vocal_remover_tpu.train.prefetch import device_prefetch



class Trainer:
    def __init__(self, model, variables, learning_rate, accumulation_steps=1,
                 mesh=None, seed=0, dropout=True, transfer_dtype=None,
                 prefetch=2, aux_lambda=0.0, remat=False,
                 wave_loss=None, wave_loss_weight=0.01):
        self.model = model
        self.accumulation_steps = accumulation_steps
        # wave-domain auxiliary loss (the reference defines sdr_loss /
        # weighted_sdr_loss but leaves them commented out, train.py:
        # 46-65, 83-88): 'sdr' | 'weighted_sdr' adds
        # `weight * loss(istft(y), istft(mask (*) X))` to the L1 term.
        # Gradients flow through the device iSTFT. Complex models only
        # (magnitude batches carry no phase to invert).
        if wave_loss not in (None, "sdr", "weighted_sdr"):
            raise ValueError(f"unknown wave_loss {wave_loss!r}")
        if wave_loss is not None and not model.is_complex:
            raise ValueError(
                "wave_loss requires a complex-mask model (is_complex): "
                "magnitude batches have no phase to invert to waves"
            )
        self.wave_loss = wave_loss
        self.wave_loss_weight = float(wave_loss_weight)
        self.mesh = mesh
        self.dropout = dropout  # False => deterministic training (no dropout)
        # rematerialize band-net stages in backward (jax.checkpoint):
        # ~1 extra forward of FLOPs for a large peak-memory cut — for
        # batch x cropsize configs that otherwise OOM
        self.remat = bool(remat)
        # deep supervision: weight of the aux-head mask loss (the
        # reference carries the aux_out head but never trains it,
        # nets.py:80 — exposed here as a real option)
        self.aux_lambda = float(aux_lambda)
        # ship batches as e.g. jnp.bfloat16 to halve host-link traffic
        # (upcast to f32 on device before the loss); None = as-is.
        # The string "int8" selects linear uint8 quantization with a
        # per-batch scale (4x less traffic than f32) — magnitudes only;
        # dequantization runs on device. Quantization noise (~scale/510
        # expected |error|) touches inputs AND targets, so this is a
        # throughput/quality trade — see BENCH_NOTES.md.
        self.transfer_dtype = transfer_dtype
        self.prefetch = prefetch
        self.optimizer = optax.inject_hyperparams(optax.adam)(
            learning_rate=learning_rate
        )

        params, stats = partition(variables)
        # own private copies: the jitted steps donate their input buffers,
        # which must never invalidate the caller's arrays
        self.params = jax.tree_util.tree_map(lambda a: jnp.array(a), params)
        self.stats = jax.tree_util.tree_map(lambda a: jnp.array(a), stats)
        self.opt_state = self.optimizer.init(params)
        self.grad_buf = jax.tree_util.tree_map(jnp.zeros_like, params)
        self.base_key = jax.random.PRNGKey(seed)
        self._step_counter = 0

        if mesh is not None:
            # one path-based policy shards params, optimizer state, and
            # the grad buffer consistently: replication under pure dp,
            # channel-sharded conv/bn leaves when the mesh has a model
            # axis > 1 (tensor parallelism — parallel/policy.py)
            from vocal_remover_tpu.parallel import policy

            self.params = policy.shard_variables(mesh, self.params)
            self.stats = policy.shard_variables(mesh, self.stats)
            self.opt_state = policy.shard_variables(mesh, self.opt_state)
            self.grad_buf = policy.shard_variables(mesh, self.grad_buf)

        self._accum = jax.jit(self._accum_fn, donate_argnums=(1, 2))
        self._apply = jax.jit(self._apply_fn, donate_argnums=(0, 1, 2))
        self._fused = jax.jit(self._fused_fn, donate_argnums=(0, 1, 2))
        self._eval = jax.jit(self._eval_fn)
        # no-donation gradient probe (equivalence tests / debugging)
        self._grad = jax.jit(
            lambda p, s, X, y, rng: jax.value_and_grad(
                self._loss, has_aux=True
            )(p, s, X, y, rng)
        )

    # ------------------------------------------------------------------
    # jitted bodies
    # ------------------------------------------------------------------

    @staticmethod
    def _upcast(a):
        # reduced staging dtypes (bf16/f16) are upcast to f32 before the
        # loss; f64 (x64 parity tests) passes through untouched.
        # int8-staged batches arrive as {"q": uint8, "scale": f32}.
        if isinstance(a, dict):
            return a["q"].astype(jnp.float32) * a["scale"]
        return a.astype(jnp.promote_types(a.dtype, jnp.float32))

    def _mask_loss(self, mask, Xh, yh):
        if self.model.is_complex:
            # complex-mask training (the reference only sketched this in
            # comments, train.py:85-86): pred = mask (*) X as complex
            # numbers in re/im channel pairs; L1 on magnitudes.
            mr, mi = mask[..., :2], mask[..., 2:]
            xr, xi = Xh[..., :2], Xh[..., 2:]
            pr = mr * xr - mi * xi
            pi = mr * xi + mi * xr
            pred_mag = jnp.sqrt(pr * pr + pi * pi + 1e-12)
            y_mag = jnp.sqrt(
                yh[..., :2] ** 2 + yh[..., 2:] ** 2 + 1e-12
            )
            return losses.l1(pred_mag, y_mag)
        return losses.mask_l1_loss(mask, Xh, yh)

    def _wave_loss_term(self, mask, Xh, yh):
        """Wave-domain SDR loss through the device iSTFT (reference
        train.py:83-88's commented-out intent made live)."""
        mr, mi = mask[..., :2], mask[..., 2:]
        xr, xi = Xh[..., :2], Xh[..., 2:]
        pr = mr * xr - mi * xi
        pi = mr * xi + mi * xr

        def wave(re, im):
            # (N, F, T, 2) -> (N, 2, F, T) -> batched iSTFT
            return losses.to_wave(
                jnp.transpose(re, (0, 3, 1, 2)),
                jnp.transpose(im, (0, 3, 1, 2)),
                self.model.n_fft, self.model.hop_length,
            )

        y_wave = wave(yh[..., :2], yh[..., 2:])
        p_wave = wave(pr, pi)
        if self.wave_loss == "weighted_sdr":
            n_wave = wave(xr - yh[..., :2], xi - yh[..., 2:])
            n_pred = wave(xr - pr, xi - pi)
            return losses.weighted_sdr_loss(y_wave, p_wave, n_wave, n_pred)
        return losses.sdr_loss(y_wave, p_wave)

    def _loss(self, params, stats, X, y, rng):
        variables = merge(params, stats)
        # host batches are (N, C, F, T) like the reference; go NHWC on device
        Xh = jnp.transpose(self._upcast(X), (0, 2, 3, 1))
        yh = jnp.transpose(self._upcast(y), (0, 2, 3, 1))
        if not self.dropout:
            rng = None
        if self.aux_lambda > 0:
            (mask, aux_mask), new_vars = self.model.apply(
                variables, Xh, train=True, rng=rng, aux=True,
                remat=self.remat
            )
            loss = self._mask_loss(mask, Xh, yh)
            loss = loss + self.aux_lambda * self._mask_loss(
                aux_mask, Xh, yh
            )
        else:
            mask, new_vars = self.model.apply(
                variables, Xh, train=True, rng=rng, remat=self.remat
            )
            loss = self._mask_loss(mask, Xh, yh)
        if self.wave_loss is not None:
            loss = loss + self.wave_loss_weight * self._wave_loss_term(
                mask, Xh, yh
            )
        _, new_stats = partition(new_vars)
        return loss, new_stats

    def _accum_fn(self, params, stats, grad_buf, X, y, rng):
        (loss, new_stats), grads = jax.value_and_grad(
            self._loss, has_aux=True
        )(params, stats, X, y, rng)
        scale = 1.0 / self.accumulation_steps
        grad_buf = jax.tree_util.tree_map(
            lambda b, g: b + g * scale, grad_buf, grads
        )
        return loss, grad_buf, new_stats

    def _apply_fn(self, params, opt_state, grad_buf):
        updates, opt_state = self.optimizer.update(
            grad_buf, opt_state, params
        )
        params = optax.apply_updates(params, updates)
        zero = jax.tree_util.tree_map(jnp.zeros_like, grad_buf)
        return params, opt_state, zero

    def _fused_fn(self, params, stats, opt_state, X, y, rng):
        """accumulation_steps == 1 fast path: grads + Adam in one call."""
        (loss, new_stats), grads = jax.value_and_grad(
            self._loss, has_aux=True
        )(params, stats, X, y, rng)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return loss, params, new_stats, opt_state

    def _eval_fn(self, params, stats, X, y):
        variables = merge(params, stats)
        # upcast like _loss: batches may arrive in a reduced staging
        # dtype (transfer_dtype) but the loss itself is computed in f32
        Xh = jnp.transpose(self._upcast(X), (0, 2, 3, 1))
        yh = jnp.transpose(self._upcast(y), (0, 2, 3, 1))
        if self.model.is_complex:
            mask = self.model(variables, Xh)
            mr, mi = mask[..., :2], mask[..., 2:]
            xr, xi = Xh[..., :2], Xh[..., 2:]
            pred = jnp.sqrt(
                (mr * xr - mi * xi) ** 2 + (mr * xi + mi * xr) ** 2 + 1e-12
            )
            yh = jnp.sqrt(yh[..., :2] ** 2 + yh[..., 2:] ** 2 + 1e-12)
            off = self.model.offset
            pred = pred[:, :, off:-off]
        else:
            pred = self.model.predict(variables, Xh)
        # center-crop the target's time axis (axis 2 in NHWC) to the
        # offset-trimmed prediction (reference train.py:124 crop_center)
        t = pred.shape[2]
        s = (yh.shape[2] - t) // 2
        target = jax.lax.slice_in_dim(yh, s, s + t, axis=2)
        return losses.l1(pred, target)

    # ------------------------------------------------------------------
    # host-side drivers
    # ------------------------------------------------------------------

    @property
    def variables(self):
        return merge(
            jax.tree_util.tree_map(np.asarray, self.params),
            jax.tree_util.tree_map(np.asarray, self.stats),
        )

    @property
    def learning_rate(self) -> float:
        return float(self.opt_state.hyperparams["learning_rate"])

    def set_learning_rate(self, lr: float):
        self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, jnp.float32
        )

    @staticmethod
    def _quantize_u8(a):
        """magnitude batch -> {"q": uint8, "scale": f32} (scale chosen
        so 255 == batch max; device dequant = q * scale). Uses the fused
        C kernel when built (4 numpy passes -> 2 streaming passes)."""
        from vocal_remover_tpu import native

        out = native.quantize_u8(np.asarray(a))
        if out is not None:
            return out
        a = np.asarray(a, np.float32)
        hi = float(a.max())
        scale = (hi / 255.0) if hi > 0 else 1.0
        q = np.clip(np.round(a / scale), 0, 255).astype(np.uint8)
        return {"q": q, "scale": np.float32(scale)}

    def _put_batch(self, X, y):
        if self.transfer_dtype == "int8":
            if self.model.is_complex:
                raise ValueError(
                    "int8 staging quantizes nonnegative magnitudes; "
                    "complex-mode batches carry signed re/im channels"
                )
            X = self._quantize_u8(X)
            y = self._quantize_u8(y)
        elif self.transfer_dtype is not None:
            X = np.asarray(X).astype(self.transfer_dtype)
            y = np.asarray(y).astype(self.transfer_dtype)
        if self.mesh is not None:
            return mesh_lib.shard_batch(self.mesh, X, y)
        return jax.device_put(X), jax.device_put(y)

    def _staged(self, loader):
        """Iterate (X_dev, y_dev, batch_len) with background H2D staging."""
        it = ((self._put_batch(X, y), len(X)) for X, y in loader)
        if self.prefetch > 0:
            return device_prefetch(it, lambda z: z, depth=self.prefetch)
        return it

    def compute_grads(self, X, y):
        """(loss, grads) for one batch — NO update, no buffer donation.

        The exact-equivalence probe for mesh tests: gradients compare
        tightly across dp/tp layouts (unlike post-Adam params, where the
        sign of a ~0 gradient under different reduction orders flips a
        whole lr-sized step)."""
        Xd, yd = self._put_batch(X, y)
        rng = jax.random.fold_in(self.base_key, self._step_counter)
        (loss, _), grads = self._grad(self.params, self.stats, Xd, yd, rng)
        return float(loss), jax.tree_util.tree_map(np.asarray, grads)

    def train_epoch(self, loader) -> float:
        """One epoch; returns dataset-mean per-sample loss
        (reference train.py:68-105 semantics, incl. leftover flush)."""
        A = self.accumulation_steps
        sum_loss = jnp.zeros(())
        n_samples = 0
        itr = -1
        for itr, ((Xd, yd), blen) in enumerate(self._staged(loader)):
            rng = jax.random.fold_in(self.base_key, self._step_counter)
            self._step_counter += 1
            if A == 1:
                loss, self.params, self.stats, self.opt_state = self._fused(
                    self.params, self.stats, self.opt_state, Xd, yd, rng
                )
            else:
                loss, self.grad_buf, self.stats = self._accum(
                    self.params, self.stats, self.grad_buf, Xd, yd, rng
                )
                if (itr + 1) % A == 0:
                    self.params, self.opt_state, self.grad_buf = self._apply(
                        self.params, self.opt_state, self.grad_buf
                    )
            sum_loss = sum_loss + loss * blen
            n_samples += blen
        if A > 1 and itr >= 0 and (itr + 1) % A != 0:
            self.params, self.opt_state, self.grad_buf = self._apply(
                self.params, self.opt_state, self.grad_buf
            )
        return float(sum_loss) / max(n_samples, 1)

    def train_epoch_device(self, source, index_loader) -> float:
        """One epoch over a device-resident dataset
        (data/device_cache.py): the host ships ~100 bytes of crop
        indices + aug flags per step; crops and augmentations
        materialize on the TPU. Same loss/accumulation semantics as
        train_epoch."""
        A = self.accumulation_steps
        sum_loss = jnp.zeros(())
        n_samples = 0
        itr = -1
        for itr, idx_batch in enumerate(index_loader):
            blen = len(idx_batch[0])
            Xd, yd = source.gather(*idx_batch)
            rng = jax.random.fold_in(self.base_key, self._step_counter)
            self._step_counter += 1
            if A == 1:
                loss, self.params, self.stats, self.opt_state = self._fused(
                    self.params, self.stats, self.opt_state, Xd, yd, rng
                )
            else:
                loss, self.grad_buf, self.stats = self._accum(
                    self.params, self.stats, self.grad_buf, Xd, yd, rng
                )
                if (itr + 1) % A == 0:
                    self.params, self.opt_state, self.grad_buf = self._apply(
                        self.params, self.opt_state, self.grad_buf
                    )
            sum_loss = sum_loss + loss * blen
            n_samples += blen
        if A > 1 and itr >= 0 and (itr + 1) % A != 0:
            self.params, self.opt_state, self.grad_buf = self._apply(
                self.params, self.opt_state, self.grad_buf
            )
        return float(sum_loss) / max(n_samples, 1)

    def validate_epoch(self, loader) -> float:
        sum_loss = jnp.zeros(())
        n_samples = 0
        for (Xd, yd), blen in self._staged(loader):
            loss = self._eval(self.params, self.stats, Xd, yd)
            sum_loss = sum_loss + loss * blen
            n_samples += blen
        return float(sum_loss) / max(n_samples, 1)

    def validate_epoch_device(self, source, batchsize: int) -> float:
        """Validation over a DeviceValidationSource: patches stay
        resident on device; no per-epoch host uploads."""
        sum_loss = jnp.zeros(())
        n_samples = 0
        for Xd, yd, blen in source.batches(batchsize):
            loss = self._eval(self.params, self.stats, Xd, yd)
            sum_loss = sum_loss + loss * blen
            n_samples += blen
        return float(sum_loss) / max(n_samples, 1)

"""Global numerics configuration for the NN stack.

`precision` controls the MXU multiply precision of convs/matmuls:
  * "highest"  — full f32 (needed for parity tests vs the torch oracle
                 and for bit-faithful separation with converted
                 checkpoints).
  * "default"  — lets XLA use bf16 multiplies on the MXU (fastest).

`compute_dtype` optionally casts activations (bf16 inference mode).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

_precision = "highest"
_compute_dtype = jnp.float32
_lstm_impl = "scan"
_calibration_recorder = None


def get_calibration_recorder():
    """dict (kernel-leaf id -> input amax) while an int8 activation-
    scale calibration pass is active (models/serving.
    calibrate_act_scales), else None."""
    return _calibration_recorder


@contextlib.contextmanager
def calibration(recorder: dict):
    """Route every float conv2d's input amax into `recorder` for the
    duration (eager forwards only — traced calls cannot record)."""
    global _calibration_recorder
    old = _calibration_recorder
    _calibration_recorder = recorder
    try:
        yield recorder
    finally:
        _calibration_recorder = old


def set_lstm_impl(impl: str):
    """'scan' (differentiable, default) or 'pallas' (fused TPU kernel,
    inference paths)."""
    global _lstm_impl
    assert impl in ("scan", "pallas")
    _lstm_impl = impl


def get_lstm_impl() -> str:
    return _lstm_impl


def set_precision(p: str):
    """highest = f32 MXU (parity), default = bf16 MXU multiplies with
    f32 activations, bfloat16 = bf16 activations end-to-end (halves HBM
    traffic of the conv stack; masks differ from f32 at the ~1e-4
    level — serving mode, not for parity checks)."""
    global _precision, _compute_dtype
    assert p in ("highest", "default", "bfloat16")
    _precision = p
    _compute_dtype = jnp.bfloat16 if p == "bfloat16" else jnp.float32


def get_precision():
    if _precision == "highest":
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def set_compute_dtype(dt):
    global _compute_dtype
    _compute_dtype = dt


def get_compute_dtype():
    return _compute_dtype


@contextlib.contextmanager
def precision(p: str):
    global _precision, _compute_dtype
    old_p, old_dt = _precision, _compute_dtype
    set_precision(p)
    try:
        yield
    finally:
        # restore both globals (set_precision couples _compute_dtype to
        # the mode; a caller may also have overridden it directly)
        _precision, _compute_dtype = old_p, old_dt

"""Parameter initializers reproducing torch layer defaults.

torch nn.Conv2d / nn.Linear default to kaiming_uniform(a=sqrt(5)), which
reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)); nn.LSTM initializes every
tensor U(-1/sqrt(hidden), 1/sqrt(hidden)); BatchNorm is (1, 0). Matching
the init family keeps from-scratch training dynamics comparable to the
reference (reference relies on these defaults throughout lib/layers.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def conv_kernel(key, shape, dtype=jnp.float32):
    """HWIO conv kernel, torch Conv2d default init."""
    kh, kw, cin, cout = shape
    fan_in = kh * kw * cin
    return uniform(key, shape, 1.0 / np.sqrt(fan_in), dtype)


def linear_weight(key, shape, dtype=jnp.float32):
    """(in, out) dense weight, torch Linear default init."""
    fan_in = shape[0]
    return uniform(key, shape, 1.0 / np.sqrt(fan_in), dtype)


def linear_bias(key, shape, fan_in, dtype=jnp.float32):
    return uniform(key, shape, 1.0 / np.sqrt(fan_in), dtype)


def lstm_param(key, shape, hidden, dtype=jnp.float32):
    return uniform(key, shape, 1.0 / np.sqrt(hidden), dtype)

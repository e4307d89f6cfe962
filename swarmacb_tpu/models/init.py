"""Weight initializers matching ML-Agents / torch semantics exactly.

The reference builds every layer through ``_linear_layer``
(poca_networks.py:58-82) with three kernel inits plus a gain multiplier:

  - "kaiming_normal": torch ``kaiming_normal_(nonlinearity="linear")`` →
    N(0, 1/fan_in) (gain 1, mode fan_in)
  - "xavier_uniform": U(±√(6/(fan_in+fan_out)))
  - "normal": N(0, 1)
  then ``weight *= kernel_gain``; biases zero.

The critic's value head uses a bare ``nn.Linear`` (poca_networks.py:521),
i.e. torch's default init: kaiming_uniform(a=√5) → U(±1/√fan_in) for both
kernel and bias.

flax kernels are (fan_in, fan_out) — fan axes differ from torch's
(out, in) layout, handled below.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_normal(gain: float = 1.0):
    """torch kaiming_normal_(nonlinearity='linear', mode='fan_in') × gain."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        std = 1.0 / math.sqrt(fan_in)
        return jax.random.normal(key, shape, dtype) * (std * gain)

    return init


def xavier_uniform(gain: float = 1.0):
    """torch xavier_uniform_ × gain. For an (fan_in, fan_out) kernel."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound) * gain

    return init


def normal_gain(gain: float = 1.0):
    """N(0, 1) × gain — used with the T-Fixup gain (0.125/h)^0.5."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * gain

    return init


def torch_linear_default_kernel():
    """torch nn.Linear default: kaiming_uniform(a=√5) → U(±1/√fan_in)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(shape[0])
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_default_bias(fan_in: int):
    """torch nn.Linear default bias: U(±1/√fan_in)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def lstm_xavier_ih():
    """torch LSTM weight_ih xavier_uniform over the stacked (4H, in) matrix.

    We keep the stacked-kernel layout (in, 4H); torch computes fan from the
    (4H, in) matrix → fan_in=in, fan_out=4H — identical bound.
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in, four_h = shape[0], shape[1]
        bound = math.sqrt(6.0 / (fan_in + four_h))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def lstm_orthogonal_hh():
    """torch orthogonal_ on the stacked (4H, H) recurrent matrix.

    jax's orthogonal initializer QR-orthogonalizes the larger dimension the
    same way torch does (semi-orthogonal for non-square).
    """
    return jax.nn.initializers.orthogonal()

"""Parameter initializers matching PyTorch layer defaults.

Initialization statistics matter for GAN training dynamics, so the rebuild
matches torch's defaults: Conv/Linear weights and biases draw from
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming_uniform with a=sqrt(5) reduces to
exactly this bound), and Embedding draws from N(0, 1).  The AR decoder
re-initializes every matrix with xavier_uniform
(reference: models/ar_decoder.py:88-92).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def _fan_in_from_kernel(shape: Sequence[int]) -> int:
    """fan_in for our kernel layouts: all axes except the last (output) one."""
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    return max(fan_in, 1)


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(-k, k), k = 1/sqrt(fan_in); kernel layout [..., C_in, C_out]."""
    bound = 1.0 / math.sqrt(_fan_in_from_kernel(shape))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(max(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """Linear kernel [in, out]: U(-1/sqrt(in), 1/sqrt(in))."""
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    if len(shape) > 2:
        receptive = 1
        for d in shape[:-2]:
            receptive *= d
        fan_in = shape[-2] * receptive
        fan_out = shape[-1] * receptive
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def embedding_init(key, shape, dtype=jnp.float32):
    """torch nn.Embedding default: N(0, 1)."""
    return jax.random.normal(key, shape, dtype)

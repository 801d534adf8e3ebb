"""Functional HiFi-GAN generator with Pallas-fused MRF blocks (inference path).

Same math as models.hifigan.HiFiGANGenerator (the training module): conv_pre
and the tap-matmul ConvTranspose stages run as XLA ops; each MRF runs as one
Pallas kernel (ops/pallas/mrf_kernel.py).  Weights are read from the SAME
flax param tree, with the fold planning done once per (params, config).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import GeneratorConfig
from ..ops.conv import folded_conv_transpose1d, leaky_relu
from ..ops.conv import conv1d
from ..ops.pallas.mrf_kernel import LANES, fused_mrf, plan_mrf

LRELU_SLOPE = 0.1


class FusedGenerator:
    """Callable generator built from flax params.

    Usage:
      gen = FusedGenerator(cfg, params)   # params = {'params': {...}}
      wav = gen(mel)                       # mel [B, n_mels, T]
    """

    def __init__(
        self,
        cfg: GeneratorConfig,
        params,
        dtype=jnp.bfloat16,
        interpret: Optional[bool] = None,
    ):
        self.cfg = cfg
        self.dtype = dtype
        p = params["params"]
        self.interpret = (
            interpret
            if interpret is not None
            else jax.default_backend() != "tpu"
        )
        self.conv_pre_w = jnp.asarray(p["conv_pre"]["kernel"], dtype)
        self.conv_pre_b = jnp.asarray(p["conv_pre"]["bias"], dtype)
        self.conv_post_w = jnp.asarray(p["conv_post"]["kernel"], dtype)
        self.conv_post_b = jnp.asarray(p["conv_post"]["bias"], dtype)
        self.ups = []
        self.mrfs = []
        for i, (u, k) in enumerate(
            zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
        ):
            cout = cfg.upsample_initial_channel // (2 ** (i + 1))
            up = p[f"up_{i}"]
            self.ups.append(
                (
                    jnp.asarray(up["kernel"], dtype),
                    jnp.asarray(up["bias"], dtype),
                    u,
                    (k - u) // 2,
                )
            )
            if cout < LANES and LANES % cout:
                raise ValueError(
                    f"fused generator requires channels dividing {LANES}; "
                    f"stage {i} has {cout}"
                )
            taps, biases, structure, fold, margin = plan_mrf(
                cfg, cout, up_mrf_params(p, i)
            )
            self.mrfs.append(
                (
                    jnp.asarray(taps),
                    jnp.asarray(biases),
                    structure,
                    fold,
                    margin,
                )
            )

    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        x = jnp.swapaxes(mel, 1, 2).astype(self.dtype)  # [B, T, n_mels]
        x = conv1d(x, self.conv_pre_w, self.conv_pre_b, padding=3)
        for (w, b, u, pad), (taps, biases, structure, fold, margin) in zip(
            self.ups, self.mrfs
        ):
            x = leaky_relu(x, LRELU_SLOPE)
            x = folded_conv_transpose1d(x, w, b, stride=u, padding=pad)
            x = fused_mrf(
                x, taps, biases, structure, fold, margin,
                interpret=self.interpret,
            ).astype(self.dtype)
        x = leaky_relu(x, LRELU_SLOPE)
        x = conv1d(x, self.conv_post_w, self.conv_post_b, padding=3)
        wav = jnp.tanh(x.astype(jnp.float32))
        return jnp.swapaxes(wav, 1, 2)


def up_mrf_params(p: dict, stage: int) -> dict:
    return p[f"mrf_{stage}"]

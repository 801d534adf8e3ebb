"""Fused-generator (Pallas MRF) equivalence tests, interpret mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sambert_hifigan_tpu.config import GeneratorConfig
from sambert_hifigan_tpu.models.fused_generator import FusedGenerator
from sambert_hifigan_tpu.models.hifigan import HiFiGANGenerator


class TestFusedGenerator:
    def test_matches_flax_generator_small(self):
        """Small config, every stage channel-folds differently (64->fold2,
        32->fold4, 16->fold8, 8->fold16)."""
        cfg = GeneratorConfig(
            upsample_initial_channel=128,
            resblock_kernel_sizes=(3, 7),
            resblock_dilation_sizes=((1, 3), (1, 3)),
        )
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.standard_normal((1, 80, 8)), jnp.float32)
        model = HiFiGANGenerator(cfg, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), mel)
        ref = np.asarray(model.apply(params, mel))
        fg = FusedGenerator(cfg, params, dtype=jnp.float32, interpret=True)
        out = np.asarray(fg(mel))
        assert out.shape == ref.shape == (1, 1, 8 * 256)
        # kernel runs bf16 matmuls with f32 accumulation; tanh-compressed
        # outputs agree to bf16 noise
        assert np.abs(out - ref).max() < 0.02
        assert np.abs(out - ref).mean() < 1e-3

    def test_batch_2(self):
        cfg = GeneratorConfig(
            upsample_initial_channel=64,
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
        )
        rng = np.random.default_rng(1)
        mel = jnp.asarray(rng.standard_normal((2, 80, 8)), jnp.float32)
        model = HiFiGANGenerator(cfg, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(0), mel)
        ref = np.asarray(model.apply(params, mel))
        fg = FusedGenerator(cfg, params, dtype=jnp.float32, interpret=True)
        out = np.asarray(fg(mel))
        assert np.abs(out - ref).max() < 0.03
        assert np.abs(out - ref).mean() < 1e-3

    def test_jittable(self):
        cfg = GeneratorConfig(
            upsample_initial_channel=64,
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
        )
        mel = jnp.zeros((1, 80, 8))
        model = HiFiGANGenerator(cfg)
        params = model.init(jax.random.PRNGKey(0), mel)
        fg = FusedGenerator(cfg, params, dtype=jnp.float32, interpret=True)
        out = jax.jit(lambda m: fg(m))(mel)
        assert out.shape == (1, 1, 2048)

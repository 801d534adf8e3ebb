"""HiFi-GAN model tests.

Ports the shape/range/arity contracts of reference
tests/test_hifigan_generator.py, tests/test_multi_scale_discriminator.py,
tests/test_multi_period_discriminator.py, tests/test_hifigan_integration.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sambert_hifigan_tpu.config import (
    AudioConfig,
    DiscriminatorConfig,
    GeneratorConfig,
    VocoderConfig,
)
from sambert_hifigan_tpu.models.hifigan import (
    HiFiGAN,
    HiFiGANGenerator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
)

HOP = 256


@pytest.fixture(scope="module")
def gen_small():
    """Small generator for fast CPU tests (still hop-256 total upsampling)."""
    cfg = GeneratorConfig(
        n_mels=80,
        upsample_rates=(8, 8, 2, 2),
        upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=64,
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    model = HiFiGANGenerator(cfg)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 80, 13)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel)
    return model, params


class TestGenerator:
    def test_output_shape_exact(self, gen_small):
        # T_wav = Tfrm * hop exactly (reference: tests/test_hifigan_generator.py:40-99)
        model, params = gen_small
        for tfrm in (7, 13):
            mel = jnp.zeros((2, 80, tfrm))
            wav = model.apply(params, mel)
            assert wav.shape == (2, 1, tfrm * HOP)

    def test_output_range_tanh(self, gen_small):
        model, params = gen_small
        mel = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, 80, 11)) * 3, jnp.float32
        )
        wav = np.asarray(model.apply(params, mel))
        assert wav.min() >= -1.0 and wav.max() <= 1.0

    def test_no_nans(self, gen_small):
        model, params = gen_small
        mel = jnp.asarray(np.random.default_rng(2).standard_normal((1, 80, 9)), jnp.float32)
        wav = np.asarray(model.apply(params, mel))
        assert np.isfinite(wav).all()

    def test_upsample_product_validated(self):
        # prod(upsample_rates) must equal hop_length
        # (reference: tests/test_hifigan_generator.py:129-143)
        from sambert_hifigan_tpu.config import ConfigError, TTSConfig, validate_config
        import dataclasses

        cfg = TTSConfig()
        bad_gen = dataclasses.replace(
            cfg.vocoder.generator, upsample_rates=(8, 8, 2)
        )
        bad = dataclasses.replace(
            cfg, vocoder=dataclasses.replace(cfg.vocoder, generator=bad_gen)
        )
        with pytest.raises(ConfigError):
            validate_config(bad)

    def test_default_config_param_count(self):
        """Generator at default config has exactly the reference's 13,926,017
        params (BASELINE.md, measured from reference models/hifigan.py:650-702)."""
        model = HiFiGANGenerator(GeneratorConfig())
        # eval_shape: count params from the abstract init, no compile/compute
        params = jax.eval_shape(model.init, jax.random.PRNGKey(0), jnp.zeros((1, 80, 4)))
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        assert n == 13_926_017, n


class TestMSD:
    def test_three_critics_eight_fmaps(self):
        model = MultiScaleDiscriminator()
        wav = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 1, 4096)), jnp.float32
        )
        params = model.init(jax.random.PRNGKey(0), wav)
        outs, fmaps = model.apply(params, wav)
        assert len(outs) == 3
        assert len(fmaps) == 3
        for f in fmaps:
            assert len(f) == 8  # 7 convs + conv_post
        # monotone downsampling across scales
        # (reference: tests/test_multi_scale_discriminator.py:70-101)
        t0, t1, t2 = (o.shape[-1] for o in outs)
        assert t0 >= t1 >= t2

    def test_param_count_matches_reference(self):
        model = MultiScaleDiscriminator()
        params = jax.eval_shape(model.init, jax.random.PRNGKey(0), jnp.zeros((1, 1, 1024)))
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        # weight norm stores g [Cout] extra per conv vs the raw conv; torch's
        # weight_norm also stores (g, v), so totals match the reference's
        # measured 29,622,918 (BASELINE.md) plus nothing.
        assert n == 29_622_918, n


class TestMPD:
    def test_five_critics_six_fmaps_channel_ladder(self):
        model = MultiPeriodDiscriminator()
        wav = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 1, 4000)), jnp.float32
        )
        params = model.init(jax.random.PRNGKey(0), wav)
        outs, fmaps = model.apply(params, wav)
        assert len(outs) == 5 and len(fmaps) == 5
        for f in fmaps:
            assert len(f) == 6
            # channel ladder [32, 128, 512, 1024, 1024, 1]
            # (reference: tests/test_multi_period_discriminator.py:195-202)
            assert [fm.shape[1] for fm in f] == [32, 128, 512, 1024, 1024, 1]

    def test_non_divisible_length_reflect_pad(self):
        # T=4001 is not divisible by any default period except none
        # (reference: tests/test_multi_period_discriminator.py:43-58).
        # Reflect-pad behavior is width-independent: narrow critics compile fast.
        model = MultiPeriodDiscriminator(channel_div=8)
        wav = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, 1, 4001)), jnp.float32
        )
        params = model.init(jax.random.PRNGKey(0), wav)
        outs, _ = model.apply(params, wav)
        for out, p in zip(outs, (2, 3, 5, 7, 11)):
            padded = 4001 if 4001 % p == 0 else 4001 + (p - 4001 % p)
            assert out.shape[0] == 1 and out.shape[1] == 1
            assert out.shape[3] == p  # width axis keeps the period

    def test_param_count_matches_reference(self):
        model = MultiPeriodDiscriminator()
        params = jax.eval_shape(model.init, jax.random.PRNGKey(0), jnp.zeros((1, 1, 512)))
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
        assert n == 41_105_770, n


class TestHiFiGANFacade:
    def test_discriminate_eight_tuple(self):
        """Generate + discriminate arity (reference:
        tests/test_hifigan_integration.py:72-117)."""
        cfg = VocoderConfig(
            generator=GeneratorConfig(
                upsample_initial_channel=32,
                resblock_kernel_sizes=(3,),
                resblock_dilation_sizes=((1, 3),),
            ),
            # arity is width-independent; narrow critics compile in seconds
            discriminator=DiscriminatorConfig(channel_div=8),
        )
        model = HiFiGAN(cfg)
        mel = jnp.asarray(np.random.default_rng(0).standard_normal((1, 80, 8)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), mel, method=HiFiGAN.init_all)
        wav_fake = model.apply(params, mel)
        assert wav_fake.shape == (1, 1, 8 * HOP)
        wav_real = jnp.asarray(
            np.random.default_rng(1).standard_normal((1, 1, 8 * HOP)), jnp.float32
        )
        result = model.apply(params, wav_real, wav_fake, method=HiFiGAN.discriminate)
        assert len(result) == 8
        (msd_ro, msd_rf, msd_fo, msd_ff, mpd_ro, mpd_rf, mpd_fo, mpd_ff) = result
        assert len(msd_ro) == 3 and len(mpd_ro) == 5
        assert len(msd_rf) == 3 and len(mpd_ff) == 5

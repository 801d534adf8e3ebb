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

    def test_chained_matches_plain_ladder(self):
        """The chained-folded ladder (fold_max > 1) is element-exact vs the
        plain reference-shaped convs, logits AND all 8 torch-layout fmaps,
        including the odd pooled scale lengths."""
        from sambert_hifigan_tpu.models.hifigan import ScaleDiscriminator

        wav = jnp.asarray(
            np.random.default_rng(0).standard_normal((2, 1, 1026)) * 0.3,
            jnp.float32,
        )
        chained = ScaleDiscriminator(channel_div=4, fold_max=8)
        plain = ScaleDiscriminator(channel_div=4, fold_max=0)
        params = chained.init(jax.random.PRNGKey(0), wav)
        out_c, fm_c = chained.apply(params, wav)
        out_p, fm_p = plain.apply(params, wav)
        np.testing.assert_allclose(
            np.asarray(out_c), np.asarray(out_p), rtol=1e-4, atol=1e-5
        )
        for a, b in zip(fm_c, fm_p):
            assert a.shape == b.shape
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_compute_layout_losses_exact(self):
        """'compute' fmap layout (chained-folded maps, no unfold transposes)
        + msd_fmap_true_counts reproduce the torch-layout FM and LSGAN losses
        exactly — the invariance the jitted GAN step relies on."""
        from sambert_hifigan_tpu.losses.vocoder import (
            discriminator_loss,
            feature_matching_loss,
        )
        from sambert_hifigan_tpu.models.hifigan import msd_fmap_true_counts

        B, T = 2, 1026
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((B, 1, T)) * 0.3, jnp.float32)
        y = jnp.asarray(rng.standard_normal((B, 1, T)) * 0.3, jnp.float32)
        msd = MultiScaleDiscriminator(channel_div=4, fold_max=8)
        params = msd.init(jax.random.PRNGKey(0), x)
        or_t, fr_t = msd.apply(params, x, "torch")
        of_t, ff_t = msd.apply(params, y, "torch")
        or_c, fr_c = msd.apply(params, x, "compute")
        of_c, ff_c = msd.apply(params, y, "compute")
        fm_t, _ = feature_matching_loss(fr_t, ff_t)
        counts = msd_fmap_true_counts(T, B, channel_div=4, fold_max=8)
        fm_c, _ = feature_matching_loss(fr_c, ff_c, counts)
        np.testing.assert_allclose(float(fm_c), float(fm_t), rtol=1e-5)
        d_t = discriminator_loss(list(or_t), list(of_t))
        d_c = discriminator_loss(list(or_c), list(of_c))
        np.testing.assert_allclose(float(d_c), float(d_t), rtol=1e-6)

    def test_fmap_true_counts_match_shapes(self):
        """The static count helper must agree with the real torch-layout fmap
        shapes (it reimplements the ladder arithmetic)."""
        from sambert_hifigan_tpu.models.hifigan import msd_fmap_true_counts

        B, T = 2, 1026
        wav = jnp.zeros((B, 1, T))
        msd = MultiScaleDiscriminator(channel_div=4, fold_max=8)
        params = jax.eval_shape(msd.init, jax.random.PRNGKey(0), wav)
        _, fmaps = jax.eval_shape(
            lambda p, w: msd.apply(p, w, "torch"), params, wav
        )
        counts = msd_fmap_true_counts(T, B, channel_div=4, fold_max=8)
        for per_scale, per_counts in zip(fmaps, counts):
            # chained layers carry true counts; the dense tail + logits are
            # exact in compute layout (None -> plain mean)
            for fm, c in zip(per_scale[:6], per_counts[:6]):
                assert c == int(np.prod(fm.shape)), (c, fm.shape)
            assert per_counts[6] is None and per_counts[7] is None


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

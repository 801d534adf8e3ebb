"""Train-step tests: GAN step semantics per ablation mode, acoustic step,
and data-parallel execution over the 8-device virtual mesh.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sambert_hifigan_tpu.config import (
    AcousticModelConfig,
    AudioConfig,
    DecoderConfig,
    EncoderConfig,
    GeneratorConfig,
    TTSConfig,
    VocoderConfig,
)
from sambert_hifigan_tpu.models.acoustic_model import SAMBERTAcousticModel
from sambert_hifigan_tpu.models.hifigan import HiFiGAN
from sambert_hifigan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from sambert_hifigan_tpu.training.acoustic_trainer import (
    init_acoustic_state,
    make_jitted_acoustic_step,
)
from sambert_hifigan_tpu.training.vocoder_trainer import (
    init_vocoder_state,
    make_jitted_vocoder_step,
)

HOP = 256
TINY_VOC = VocoderConfig(
    generator=GeneratorConfig(
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
)
TINY_ACOUSTIC = AcousticModelConfig(
    d_model=32,
    encoder=EncoderConfig(n_layers=1, n_heads=4, d_ff=64),
    decoder=DecoderConfig(n_layers=1, n_heads=4, d_ff=64, max_len=128),
)


def _cfg(loss_mode="adv_mel_fm"):
    cfg = TTSConfig()
    return dataclasses.replace(
        cfg,
        vocoder=dataclasses.replace(TINY_VOC, loss_mode=loss_mode),
        acoustic_model=TINY_ACOUSTIC,
    )


def _gan_batch(b=2, tfrm=8, seed=0):
    rng = np.random.default_rng(seed)
    mel = jnp.asarray(rng.standard_normal((b, 80, tfrm)), jnp.float32)
    wav = jnp.asarray(
        (rng.standard_normal((b, 1, tfrm * HOP)) * 0.1), jnp.float32
    )
    return mel, wav


def _leaves_equal(a, b):
    return all(
        bool(jnp.array_equal(x, y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


class TestVocoderTrainStep:
    # adv_mel's step semantics are a strict subset of adv_mel_fm's (covered
    # by the loss-level mode tests); skipping it here saves a full GAN-graph
    # CPU compile in CI.
    @pytest.mark.parametrize("mode", ["mel_only", "adv_mel_fm"])
    def test_step_runs_and_updates(self, mode):
        cfg = _cfg(mode)
        model = HiFiGAN(cfg.vocoder)
        state = init_vocoder_state(model, cfg, jax.random.PRNGKey(0), mel_frames=8)
        d_before = jax.tree.map(lambda x: x.copy(), state.d_params)
        g_before = jax.tree.map(lambda x: x.copy(), state.g_params)
        step = make_jitted_vocoder_step(model, cfg, loss_mode=mode)
        mel, wav = _gan_batch()
        state, metrics = step(state, mel, wav)
        assert int(state.step) == 1
        # generator always updates
        assert not _leaves_equal(g_before, state.g_params)
        # discriminator only updates when the mode trains it
        # (reference: models/losses.py:1007-1026, demo_ablation_modes.py:107-119)
        if mode == "mel_only":
            assert _leaves_equal(d_before, state.d_params)
            assert float(metrics["disc_loss"]) == 0.0
            assert float(metrics["gen_adv_loss"]) == 0.0
        else:
            assert not _leaves_equal(d_before, state.d_params)
            assert float(metrics["disc_loss"]) > 0.0
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        # full metric schema in every mode
        for k in (
            "gen_loss", "gen_adv_loss", "gen_fm_loss", "gen_mel_loss",
            "gen_sc_loss", "gen_mag_loss", "gen_stft_loss", "disc_loss",
        ):
            assert k in metrics, k
        if mode == "adv_mel_fm":
            for i in range(8):
                assert f"gen_fm_loss_disc_{i}" in metrics

    def test_mel_loss_decreases_mel_only(self):
        """A few mel_only steps on a fixed batch should reduce the mel loss."""
        cfg = _cfg("mel_only")
        model = HiFiGAN(cfg.vocoder)
        state = init_vocoder_state(model, cfg, jax.random.PRNGKey(0), mel_frames=8)
        step = make_jitted_vocoder_step(model, cfg, loss_mode="mel_only")
        mel, wav = _gan_batch(seed=3)
        losses = []
        for _ in range(5):
            state, metrics = step(state, mel, wav)
            losses.append(float(metrics["gen_mel_loss"]))
        assert losses[-1] < losses[0], losses


class TestAcousticTrainStep:
    def _batch(self, b=2, tph=6, maxf=16, seed=0):
        rng = np.random.default_rng(seed)
        return {
            "ph_ids": jnp.asarray(rng.integers(4, 300, (b, tph)), jnp.int32),
            "tone_ids": jnp.asarray(rng.integers(0, 10, (b, tph)), jnp.int32),
            "boundary_ids": jnp.asarray(rng.integers(0, 5, (b, tph)), jnp.int32),
            "dur_gt": jnp.asarray(rng.integers(1, 3, (b, tph)), jnp.int32),
            "mel_gt": jnp.asarray(rng.standard_normal((b, maxf, 80)), jnp.float32),
            "pitch_gt": jnp.asarray(rng.uniform(80, 600, (b, maxf)), jnp.float32),
            "energy_gt": jnp.asarray(rng.uniform(0, 1, (b, maxf)), jnp.float32),
            "phoneme_mask": jnp.ones((b, tph), bool),
            "pitch_mask": jnp.asarray(rng.random((b, maxf)) > 0.3),
        }

    def test_step_and_loss_decreases(self):
        cfg = _cfg()
        model = SAMBERTAcousticModel(cfg.acoustic_model)
        state = init_acoustic_state(model, cfg, jax.random.PRNGKey(0), tph=6, max_frames=16)
        step = make_jitted_acoustic_step(model, cfg)
        batch = self._batch()
        losses = []
        key = jax.random.PRNGKey(1)
        for i in range(5):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            losses.append(float(metrics["total_loss"]))
        assert int(state.step) == 5
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0], losses
        assert set(metrics) >= {
            "total_loss", "mel_loss", "dur_loss", "pitch_loss", "energy_loss",
            "grad_norm",
        }


class TestRemat:
    def test_remat_is_math_identical(self):
        """jax.checkpoint layer remat must not change the training step's
        numbers (it only trades backward-pass memory for recompute)."""
        import dataclasses as dc

        from sambert_hifigan_tpu.config import (
            AcousticModelConfig as AMC,
            DecoderConfig as DC,
            EncoderConfig as EC,
        )

        def mk(remat):
            return dc.replace(
                _cfg(),
                acoustic_model=AMC(
                    d_model=32,
                    encoder=EC(n_layers=1, n_heads=4, d_ff=64, remat=remat),
                    decoder=DC(n_layers=1, n_heads=4, d_ff=64, max_len=128,
                               remat=remat),
                ),
            )

        batch = TestAcousticTrainStep()._batch()
        losses = []
        for cfg in (mk(False), mk(True)):
            model = SAMBERTAcousticModel(cfg.acoustic_model)
            state = init_acoustic_state(
                model, cfg, jax.random.PRNGKey(0), tph=6, max_frames=16
            )
            step = make_jitted_acoustic_step(model, cfg)
            state, m = step(state, batch, jax.random.PRNGKey(1))
            losses.append(float(m["total_loss"]))
        assert losses[0] == pytest.approx(losses[1], rel=1e-5)


class TestDataParallel:
    def test_vocoder_step_on_8_device_mesh(self):
        mesh = create_mesh(data=8, model=1)
        cfg = _cfg("adv_mel_fm")
        model = HiFiGAN(cfg.vocoder)
        state = init_vocoder_state(model, cfg, jax.random.PRNGKey(0), mel_frames=8)
        state = replicate(state, mesh)
        step = make_jitted_vocoder_step(model, cfg, mesh=mesh)
        mel, wav = _gan_batch(b=8)
        mel, wav = shard_batch((mel, wav), mesh)
        state, metrics = step(state, mel, wav)
        assert int(state.step) == 1
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k

    def test_acoustic_step_on_8_device_mesh(self):
        mesh = create_mesh(data=8, model=1)
        cfg = _cfg()
        model = SAMBERTAcousticModel(cfg.acoustic_model)
        state = init_acoustic_state(model, cfg, jax.random.PRNGKey(0), tph=6, max_frames=16)
        state = replicate(state, mesh)
        step = make_jitted_acoustic_step(model, cfg, mesh=mesh)
        batch = TestAcousticTrainStep()._batch(b=8)
        batch = shard_batch(batch, mesh)
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["total_loss"]))

    def test_dp_grads_match_single_device(self):
        """Data-parallel training with replicated params must produce the same
        metrics as single-device on the same global batch (XLA all-reduce ==
        serial sum, up to fp reassociation)."""
        cfg = _cfg()
        model = SAMBERTAcousticModel(cfg.acoustic_model)
        state1 = init_acoustic_state(model, cfg, jax.random.PRNGKey(0), tph=6, max_frames=16)
        batch = TestAcousticTrainStep()._batch(b=8)
        rngk = jax.random.PRNGKey(5)

        step1 = make_jitted_acoustic_step(model, cfg)
        _, m1 = step1(jax.tree.map(lambda x: x.copy(), state1), batch, rngk)

        mesh = create_mesh(data=8, model=1)
        state8 = replicate(init_acoustic_state(model, cfg, jax.random.PRNGKey(0), tph=6, max_frames=16), mesh)
        step8 = make_jitted_acoustic_step(model, cfg, mesh=mesh)
        _, m8 = step8(state8, shard_batch(batch, mesh), rngk)

        np.testing.assert_allclose(
            float(m1["total_loss"]), float(m8["total_loss"]), rtol=2e-4
        )
        np.testing.assert_allclose(
            float(m1["grad_norm"]), float(m8["grad_norm"]), rtol=2e-3
        )

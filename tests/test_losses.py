"""Loss tests.

Ports the contracts of reference tests/test_losses.py and
tests/test_vocoder_loss_ablation.py: masked-vs-unmasked inequality, duration
closed form, mel-recon identity, 8-discriminator fan-out, per-mode metric
bookkeeping (zeros for inactive terms), missing-input errors, gradient flow.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sambert_hifigan_tpu.config import AudioConfig, LossWeights
from sambert_hifigan_tpu.losses.acoustic import (
    acoustic_loss,
    duration_loss,
    energy_loss,
    mel_l1_loss,
    pitch_loss,
)
from sambert_hifigan_tpu.losses.vocoder import (
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
    mel_reconstruction_loss,
    multi_resolution_stft_loss,
    should_train_discriminator,
    vocoder_discriminator_loss,
    vocoder_generator_loss,
)

AUDIO = AudioConfig()


def _rand(seed, *shape):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


class TestAcousticLoss:
    def test_duration_closed_form(self):
        # L_dur = MSE(log_dur_pred, log(dur_gt + 1))
        # (reference: tests/test_losses.py:117-132)
        log_dur_pred = _rand(0, 2, 20)
        dur_gt = jnp.asarray(
            np.random.default_rng(1).integers(1, 10, (2, 20)), jnp.int32
        )
        expected = np.mean(
            (np.asarray(log_dur_pred) - np.log(np.asarray(dur_gt) + 1.0)) ** 2
        )
        got = float(duration_loss(log_dur_pred, dur_gt))
        assert abs(got - expected) < 1e-5

    def test_mask_changes_value(self):
        # (reference: tests/test_losses.py:67-115)
        pred, gt = _rand(0, 2, 50), _rand(1, 2, 50)
        mask = jnp.asarray(np.random.default_rng(2).random((2, 50)) > 0.4)
        unmasked = float(pitch_loss(pred, gt))
        masked = float(pitch_loss(pred, gt, mask))
        assert abs(unmasked - masked) > 1e-8

    def test_mel_mask_denominator(self):
        pred, gt = _rand(0, 2, 10, 80), _rand(1, 2, 10, 80)
        mask = jnp.ones((2, 10), bool).at[:, 5:].set(False)
        masked = float(mel_l1_loss(pred, gt, mask))
        manual = float(
            jnp.sum(jnp.abs(pred - gt)[:, :5, :]) / (2 * 5 * 80)
        )
        assert abs(masked - manual) < 1e-5

    def test_zero_duration_robust(self):
        # (reference: tests/test_losses.py:361-375)
        log_dur_pred = _rand(0, 2, 8)
        dur_gt = jnp.zeros((2, 8), jnp.int32)
        val = float(duration_loss(log_dur_pred, dur_gt))
        assert np.isfinite(val)

    def test_full_loss_schema_and_grad(self):
        # (reference: tests/test_losses.py:324-359)
        mel_pred, mel_gt = _rand(0, 2, 30, 80), _rand(1, 2, 30, 80)
        ldp = _rand(2, 2, 12)
        dur = jnp.asarray(np.random.default_rng(3).integers(1, 5, (2, 12)), jnp.int32)
        pp, pg = _rand(4, 2, 30), _rand(5, 2, 30)
        ep, eg = _rand(6, 2, 30), _rand(7, 2, 30)

        def loss_fn(mp):
            total, d = acoustic_loss(mp, mel_gt, ldp, dur, pp, pg, ep, eg)
            return total, d

        (total, d), g = jax.value_and_grad(loss_fn, has_aux=True)(mel_pred)
        assert set(d) == {"total_loss", "mel_loss", "dur_loss", "pitch_loss", "energy_loss"}
        assert float(jnp.abs(g).sum()) > 0
        # weighted sum identity
        w = LossWeights()
        recon = (
            w.mel * d["mel_loss"] + w.dur * d["dur_loss"]
            + w.pitch * d["pitch_loss"] + w.energy * d["energy_loss"]
        )
        assert abs(float(total - recon)) < 1e-5


def _fake_disc_outputs(seed, n=8):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.standard_normal((2, 1, 50)), jnp.float32) for _ in range(n)]


def _fake_fmaps(seed, n_disc=8, n_layers=5):
    rng = np.random.default_rng(seed)
    return [
        [jnp.asarray(rng.standard_normal((2, 16, 30)), jnp.float32) for _ in range(n_layers)]
        for _ in range(n_disc)
    ]


class TestVocoderLossComponents:
    def test_disc_loss_perfect_discriminator_is_zero(self):
        real = [jnp.ones((2, 1, 10))] * 8
        fake = [jnp.zeros((2, 1, 10))] * 8
        assert float(discriminator_loss(real, fake)) == 0.0

    def test_gen_adv_loss_fooled_is_zero(self):
        fake = [jnp.ones((2, 1, 10))] * 8
        assert float(generator_adversarial_loss(fake)) == 0.0

    def test_fm_identical_is_zero(self):
        fmaps = _fake_fmaps(0)
        total, per_disc = feature_matching_loss(fmaps, fmaps)
        assert float(total) == 0.0
        assert len(per_disc) == 8

    def test_mel_recon_identical_waveforms(self):
        # < 1e-5 for identical inputs (reference: tests/test_losses.py:645-657)
        wav = _rand(0, 2, 1, 4096)
        assert float(mel_reconstruction_loss(wav, wav, AUDIO)) < 1e-5

    def test_mel_recon_different_waveforms_positive(self):
        a, b = _rand(0, 2, 1, 4096), _rand(1, 2, 1, 4096)
        assert float(mel_reconstruction_loss(a, b, AUDIO)) > 0.0

    def test_stft_loss_zero_for_identical(self):
        wav = _rand(0, 2, 1, 8192)
        sc, mag = multi_resolution_stft_loss(wav, wav)
        assert float(sc) == 0.0 and float(mag) == 0.0

    def test_disc_loss_dict(self):
        loss, d = vocoder_discriminator_loss(_fake_disc_outputs(0), _fake_disc_outputs(1))
        assert set(d) == {"disc_loss"}
        assert float(loss) > 0


class TestAblationModes:
    """Per-mode invariants (reference: tests/test_vocoder_loss_ablation.py)."""

    def test_mel_only(self):
        wav_r, wav_f = _rand(0, 2, 1, 4096), _rand(1, 2, 1, 4096)
        loss, m = vocoder_generator_loss(wav_r, wav_f, AUDIO, loss_mode="mel_only")
        assert float(m["gen_adv_loss"]) == 0.0
        assert float(m["gen_fm_loss"]) == 0.0
        assert float(m["gen_stft_loss"]) == 0.0
        assert abs(float(loss) - 45.0 * float(m["gen_mel_loss"])) < 1e-3
        assert not should_train_discriminator("mel_only")

    def test_adv_mel(self):
        wav_r, wav_f = _rand(0, 2, 1, 4096), _rand(1, 2, 1, 4096)
        loss, m = vocoder_generator_loss(
            wav_r, wav_f, AUDIO, loss_mode="adv_mel",
            disc_fake_outputs=_fake_disc_outputs(2),
        )
        assert float(m["gen_fm_loss"]) == 0.0
        assert float(m["gen_adv_loss"]) > 0.0
        assert float(m["gen_stft_loss"]) > 0.0
        assert should_train_discriminator("adv_mel")

    def test_adv_mel_fm_all_terms_and_per_disc_keys(self):
        wav_r, wav_f = _rand(0, 2, 1, 4096), _rand(1, 2, 1, 4096)
        loss, m = vocoder_generator_loss(
            wav_r, wav_f, AUDIO, loss_mode="adv_mel_fm",
            disc_fake_outputs=_fake_disc_outputs(2),
            real_feature_maps=_fake_fmaps(3),
            fake_feature_maps=_fake_fmaps(4),
        )
        for k in ("gen_adv_loss", "gen_fm_loss", "gen_mel_loss", "gen_stft_loss"):
            assert float(m[k]) > 0.0, k
        # per-discriminator FM keys gen_fm_loss_disc_0..7
        # (reference: tests/test_losses.py:539-543)
        for i in range(8):
            assert f"gen_fm_loss_disc_{i}" in m
        w = LossWeights()
        recon = (
            m["gen_adv_loss"] + w.feature_matching * m["gen_fm_loss"]
            + w.vocoder_mel * m["gen_mel_loss"] + w.stft * m["gen_stft_loss"]
        )
        assert abs(float(loss - recon)) < 1e-3

    def test_missing_inputs_raise(self):
        # (reference: tests/test_vocoder_loss_ablation.py:194-213)
        wav_r, wav_f = _rand(0, 2, 1, 4096), _rand(1, 2, 1, 4096)
        with pytest.raises(ValueError):
            vocoder_generator_loss(wav_r, wav_f, AUDIO, loss_mode="adv_mel")
        with pytest.raises(ValueError):
            vocoder_generator_loss(
                wav_r, wav_f, AUDIO, loss_mode="adv_mel_fm",
                disc_fake_outputs=_fake_disc_outputs(0),
            )
        with pytest.raises(ValueError):
            vocoder_generator_loss(wav_r, wav_f, AUDIO, loss_mode="bogus")

    def test_backward_every_mode(self):
        # grads flow to wav_fake in every mode
        # (reference: tests/test_vocoder_loss_ablation.py:246-285)
        wav_r = _rand(0, 2, 1, 4096)

        for mode in ("mel_only", "adv_mel", "adv_mel_fm"):
            def loss_fn(wf):
                kw = {}
                if mode != "mel_only":
                    kw["disc_fake_outputs"] = _fake_disc_outputs(2)
                if mode == "adv_mel_fm":
                    kw["real_feature_maps"] = _fake_fmaps(3)
                    kw["fake_feature_maps"] = _fake_fmaps(4)
                loss, _ = vocoder_generator_loss(
                    wav_r, wf, AUDIO, loss_mode=mode, **kw
                )
                return loss

            g = jax.grad(loss_fn)(_rand(1, 2, 1, 4096))
            assert float(jnp.abs(g).sum()) > 0, mode

    def test_fm_real_features_stop_gradient(self):
        # real fmaps are detached (reference: models/losses.py:608)
        real = _fake_fmaps(0)

        def loss_fn(r0):
            real_mod = [[r0] + list(real[0][1:])] + [list(f) for f in real[1:]]
            total, _ = feature_matching_loss(real_mod, _fake_fmaps(1))
            return total

        g = jax.grad(loss_fn)(real[0][0])
        assert float(jnp.abs(g).sum()) == 0.0

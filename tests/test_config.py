"""Config system tests: YAML loading matches defaults, validation catches
inconsistencies, mel fingerprinting."""

import dataclasses

import pytest

from sambert_hifigan_tpu.config import (
    AudioConfig,
    ConfigError,
    TTSConfig,
    default_config,
    load_config,
    mel_config_fingerprint,
    validate_config,
    validate_mel_consistency,
)


class TestYamlLoading:
    def test_repo_yaml_matches_defaults(self):
        """configs/*.yaml must load to exactly the default (reference) values."""
        loaded = load_config("configs/config.yaml", "configs/model_config.yaml")
        assert loaded == default_config()

    def test_defaults_are_reference_values(self):
        cfg = default_config()
        # (reference: configs/config.yaml:3-14)
        assert cfg.audio.sample_rate == 22050
        assert cfg.audio.hop_length == 256
        assert cfg.audio.n_mels == 80
        # (reference: configs/model_config.yaml:15-19, 40-45)
        assert cfg.acoustic_model.encoder.n_layers == 6
        assert cfg.acoustic_model.decoder.n_heads == 8
        assert cfg.vocoder.generator.upsample_rates == (8, 8, 2, 2)
        assert cfg.vocoder.discriminator.mpd_periods == (2, 3, 5, 7, 11)
        assert cfg.vocoder.loss_mode == "adv_mel_fm"
        # (reference: configs/config.yaml:17-33, demo_ablation_modes.py:71-78)
        assert cfg.training.acoustic.learning_rate == 1e-4
        assert cfg.training.vocoder.beta1 == 0.8
        assert cfg.training.vocoder.gradient_clip is None
        # vocoder loss weights (reference: models/losses.py:369-376)
        assert cfg.loss_weights.feature_matching == 2.0
        assert cfg.loss_weights.vocoder_mel == 45.0


class TestValidation:
    def test_upsample_hop_mismatch(self):
        cfg = default_config()
        bad = dataclasses.replace(
            cfg, audio=dataclasses.replace(cfg.audio, hop_length=128)
        )
        with pytest.raises(ConfigError):
            validate_config(bad)

    def test_fmax_above_nyquist(self):
        with pytest.raises(ConfigError):
            validate_config(
                dataclasses.replace(
                    default_config(),
                    audio=dataclasses.replace(default_config().audio, fmax=20000),
                )
            )

    def test_bad_loss_mode(self):
        cfg = default_config()
        bad = dataclasses.replace(
            cfg, vocoder=dataclasses.replace(cfg.vocoder, loss_mode="nope")
        )
        with pytest.raises(ConfigError):
            validate_config(bad)


class TestMelFingerprint:
    def test_identical_configs_consistent(self):
        validate_mel_consistency(AudioConfig(), AudioConfig())

    def test_drifted_config_raises(self):
        with pytest.raises(ConfigError, match="hop_length"):
            validate_mel_consistency(AudioConfig(), AudioConfig(hop_length=200))

    def test_fingerprint_covers_all_mel_params(self):
        base = mel_config_fingerprint(AudioConfig())
        for field, val in [
            ("sample_rate", 16000), ("n_fft", 2048), ("hop_length", 200),
            ("win_length", 800), ("n_mels", 40), ("fmin", 20.0),
            ("fmax", 7600.0), ("mel_scale", "htk"), ("norm", None),
            ("log_base", "e"),
        ]:
            fp = mel_config_fingerprint(
                dataclasses.replace(AudioConfig(), **{field: val})
            )
            assert fp != base, field

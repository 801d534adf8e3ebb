"""Evaluation metric tests: identity zeros, monotonicity, DCT correctness."""

import numpy as np
import pytest

from sambert_hifigan_tpu.config import AudioConfig
from sambert_hifigan_tpu.utils.eval_metrics import (
    _mfcc_from_log_mel,
    mcd,
    mel_mae,
    mel_mae_from_mels,
)

AUDIO = AudioConfig()


def _tone(freq, n=11025, amp=0.5, seed=None):
    t = np.arange(n) / AUDIO.sample_rate
    x = amp * np.sin(2 * np.pi * freq * t)
    if seed is not None:
        x = x + 0.01 * np.random.default_rng(seed).standard_normal(n)
    return x.astype(np.float32)


class TestMelMAE:
    def test_identity_is_zero(self):
        wav = _tone(220.0, seed=0)
        assert mel_mae(wav, wav, AUDIO) == 0.0

    def test_monotone_in_perturbation(self):
        wav = _tone(220.0, seed=0)
        small = wav + 0.001 * _tone(330.0)
        big = wav + 0.1 * _tone(330.0)
        assert mel_mae(wav, small, AUDIO) < mel_mae(wav, big, AUDIO)

    def test_length_mismatch_trims(self):
        wav = _tone(220.0)
        assert mel_mae(wav, wav[:8000], AUDIO) == 0.0

    def test_from_mels(self):
        a = np.random.default_rng(0).standard_normal((80, 40)).astype(np.float32)
        assert mel_mae_from_mels(a, a) == 0.0
        assert mel_mae_from_mels(a, a + 1.0) == pytest.approx(1.0, abs=1e-5)


class TestMCD:
    def test_identity_is_zero(self):
        wav = _tone(220.0, seed=0)
        assert mcd(wav, wav, AUDIO) == 0.0

    def test_different_tones_positive(self):
        a, b = _tone(220.0, seed=0), _tone(440.0, seed=1)
        val = mcd(a, b, AUDIO)
        assert val > 1.0  # clearly different spectra

    def test_dct_matches_scipy(self):
        from scipy.fft import dct

        log_mel = np.random.default_rng(0).standard_normal((80, 10))
        ours = _mfcc_from_log_mel(log_mel, n_mfcc=13)
        want = dct(log_mel, type=2, axis=0, norm="ortho")[:13]
        np.testing.assert_allclose(ours, want, atol=1e-10)

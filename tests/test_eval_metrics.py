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


class TestMelMaeDtw:
    def test_identity_is_zero(self):
        from sambert_hifigan_tpu.utils.eval_metrics import mel_mae_dtw

        wav = _tone(220.0, seed=0)
        assert mel_mae_dtw(wav, wav, AUDIO) == 0.0

    def test_time_warp_scores_below_frame_wise(self):
        """A time-stretched copy has large frame-wise MAE (pure timing
        drift) but the DTW path recovers most of the spectral match."""
        from sambert_hifigan_tpu.utils.eval_metrics import mel_mae, mel_mae_dtw

        wav = _tone(220.0, seed=0)
        warped = np.concatenate([wav[:5000], wav[:5000], wav[5000:]])
        assert mel_mae_dtw(wav, warped, AUDIO) < mel_mae(wav, warped, AUDIO)

    def test_matches_bruteforce_dp_on_small_input(self):
        """The vectorized min-plus scan must equal the plain O(ta*tb)
        3-way-min DP (path cost, up to tie-breaks with equal cost)."""
        from sambert_hifigan_tpu.ops.mel import log_mel_spectrogram
        from sambert_hifigan_tpu.utils.eval_metrics import mel_mae_dtw

        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        a = (0.2 * rng.standard_normal(AUDIO.hop_length * 6)).astype(np.float32)
        b = (0.2 * rng.standard_normal(AUDIO.hop_length * 8)).astype(np.float32)
        ma = np.asarray(log_mel_spectrogram(jnp.asarray(a), AUDIO)).T
        mb = np.asarray(log_mel_spectrogram(jnp.asarray(b), AUDIO)).T
        ta, tb = ma.shape[0], mb.shape[0]
        cost = np.abs(ma[:, None, :] - mb[None, :, :]).mean(-1)
        acc = np.full((ta + 1, tb + 1), np.inf)
        acc[0, 0] = 0.0
        for i in range(1, ta + 1):
            for j in range(1, tb + 1):
                acc[i, j] = cost[i - 1, j - 1] + min(
                    acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1]
                )
        # optimal TOTAL path cost must match; recover ours from the mean by
        # backtracking the same function (path mean * steps is path cost,
        # and any optimal path has the same total cost)
        got = mel_mae_dtw(a, b, AUDIO)
        # brute-force minimal mean over the two extreme path lengths
        lo, hi = max(ta, tb), ta + tb - 1
        assert acc[ta, tb] / hi - 1e-6 <= got <= acc[ta, tb] / lo + 1e-6


class TestStftLogmagMae:
    def test_identity_is_zero(self):
        from sambert_hifigan_tpu.utils.eval_metrics import stft_logmag_mae

        wav = _tone(220.0, seed=0)
        assert stft_logmag_mae(wav, wav) == 0.0

    def test_sees_harmonic_smoothing_mel_cannot(self):
        """A waveform whose upper harmonics are attenuated (the oversmoothing
        failure mode of L1-only vocoders) must move the fine-STFT metric
        proportionally MORE than the 80-bin mel metric (adjacent harmonics of
        a low F0 share mel bins but occupy distinct FFT bins)."""
        from sambert_hifigan_tpu.utils.eval_metrics import (
            mel_mae,
            stft_logmag_mae,
        )

        n = 11025
        t = np.arange(n) / AUDIO.sample_rate
        full = sum(
            (0.5 / k) * np.sin(2 * np.pi * 110.0 * k * t) for k in range(1, 30)
        ).astype(np.float32)
        smooth = sum(
            (0.5 / k) * (1.0 if k <= 5 else 0.3) * np.sin(2 * np.pi * 110.0 * k * t)
            for k in range(1, 30)
        ).astype(np.float32)
        rel_stft = stft_logmag_mae(full, smooth) / (stft_logmag_mae(full, 0 * full) + 1e-9)
        rel_mel = mel_mae(full, smooth, AUDIO) / (mel_mae(full, 0 * full, AUDIO) + 1e-9)
        assert stft_logmag_mae(full, smooth) > 0.0
        assert rel_stft > rel_mel


class TestF0Metrics:
    def test_identity_perfect(self):
        from sambert_hifigan_tpu.utils.eval_metrics import f0_metrics

        wav = _tone(220.0, n=AUDIO.sample_rate, amp=0.5)
        m = f0_metrics(wav, wav, AUDIO)
        assert m["f0_rmse_hz"] == 0.0
        assert m["voicing_f1"] == pytest.approx(1.0)

    def test_detuned_tone_measured(self):
        """230 Hz vs 220 Hz pure tones: F0-RMSE should land near 10 Hz."""
        from sambert_hifigan_tpu.utils.eval_metrics import f0_metrics

        a = _tone(220.0, n=AUDIO.sample_rate, amp=0.5)
        b = _tone(230.0, n=AUDIO.sample_rate, amp=0.5)
        m = f0_metrics(a, b, AUDIO)
        assert 5.0 < m["f0_rmse_hz"] < 15.0

    def test_voicing_f1_drops_for_noise(self):
        """Unvoiced (noise) against a voiced tone: F1 well below identity."""
        from sambert_hifigan_tpu.utils.eval_metrics import f0_metrics

        tone = _tone(220.0, n=AUDIO.sample_rate, amp=0.5)
        noise = (
            0.5 * np.random.default_rng(0).standard_normal(AUDIO.sample_rate)
        ).astype(np.float32)
        m = f0_metrics(tone, noise, AUDIO)
        assert m["voicing_f1"] < 0.7


class TestF0MetricsDtw:
    def test_identity_perfect(self):
        from sambert_hifigan_tpu.utils.eval_metrics import f0_metrics_dtw

        wav = _tone(220.0, n=AUDIO.sample_rate, amp=0.5)
        m = f0_metrics_dtw(wav, wav, AUDIO)
        assert m["f0_rmse_hz"] == 0.0
        assert m["voicing_f1"] == pytest.approx(1.0)

    def test_alignment_invariance(self):
        """Same pitch CONTOUR with different segment DURATIONS (the full-TTS
        case: predicted durations differ from the recording) must keep DTW
        F0-RMSE near zero, where a frame-wise comparison would pair a 220 Hz
        frame of one signal with a 330 Hz frame of the other."""
        from sambert_hifigan_tpu.utils.eval_metrics import f0_metrics_dtw

        sr = AUDIO.sample_rate

        def seg(f, secs):
            t = np.arange(int(sr * secs), dtype=np.float32) / sr
            return 0.5 * np.sin(2 * np.pi * f * t)

        a = np.concatenate([seg(220.0, 0.6), seg(330.0, 0.4)]).astype(np.float32)
        b = np.concatenate([seg(220.0, 0.4), seg(330.0, 0.6)]).astype(np.float32)
        m = f0_metrics_dtw(a, b, AUDIO)
        assert m["f0_rmse_hz"] < 10.0, m
        assert m["voicing_f1"] > 0.9

    def test_detuned_tone_measured(self):
        from sambert_hifigan_tpu.utils.eval_metrics import f0_metrics_dtw

        a = _tone(220.0, n=AUDIO.sample_rate, amp=0.5)
        b = _tone(230.0, n=AUDIO.sample_rate, amp=0.5)
        m = f0_metrics_dtw(a, b, AUDIO)
        assert 5.0 < m["f0_rmse_hz"] < 15.0

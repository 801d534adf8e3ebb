"""Mel extraction tests.

Ports the contracts of reference tests/test_audio_processing.py (shape
[n_mels, T], log range, config plumbing) and adds parity checks for the STFT
against core torch.stft (the backend torchaudio's MelSpectrogram uses,
reference: data/audio_processing.py:99-113).  The slaney filterbank is checked
against an independently written scalar-loop construction of the published
Slaney formulas, since torchaudio/librosa are not installed in this image.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sambert_hifigan_tpu.config import AudioConfig
from sambert_hifigan_tpu.ops.mel import (
    extract_mel,
    log_mel_spectrogram,
    mel_filterbank,
    resample,
)
from sambert_hifigan_tpu.ops.stft import hann_window, num_stft_frames, stft_magnitude

torch = pytest.importorskip("torch")

AUDIO = AudioConfig()


def _test_wave(n=22050, sr=22050, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    wave = (
        0.5 * np.sin(2 * np.pi * 220.0 * t)
        + 0.3 * np.sin(2 * np.pi * 880.0 * t)
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)
    return wave


def _slaney_fb_loop(n_freqs, f_min, f_max, n_mels, sample_rate):
    """Independent scalar-loop construction of the Slaney filterbank, written
    directly from the published Slaney Auditory Toolbox formulas."""

    def hz2mel(f):
        if f < 1000.0:
            return 3.0 * f / 200.0
        return 15.0 + 27.0 * np.log(f / 1000.0) / np.log(6.4)

    def mel2hz(m):
        if m < 15.0:
            return 200.0 * m / 3.0
        return 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0))

    mels = np.linspace(hz2mel(f_min), hz2mel(f_max), n_mels + 2)
    f_pts = np.array([mel2hz(m) for m in mels])
    freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    fb = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, ctr, hi = f_pts[m], f_pts[m + 1], f_pts[m + 2]
        for k, f in enumerate(freqs):
            if lo <= f <= ctr and ctr > lo:
                fb[k, m] = (f - lo) / (ctr - lo)
            elif ctr < f <= hi and hi > ctr:
                fb[k, m] = (hi - f) / (hi - ctr)
        fb[:, m] *= 2.0 / (hi - lo)  # slaney norm
    return fb


class TestHannWindow:
    def test_matches_torch(self):
        ours = np.asarray(hann_window(1024))
        theirs = torch.hann_window(1024).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


class TestMelFilterbank:
    def test_matches_independent_slaney_construction(self):
        fb_ours = np.asarray(mel_filterbank(AUDIO))
        fb_loop = _slaney_fb_loop(
            AUDIO.n_fft // 2 + 1, AUDIO.fmin, AUDIO.fmax, AUDIO.n_mels, AUDIO.sample_rate
        )
        np.testing.assert_allclose(fb_ours, fb_loop, atol=1e-5)

    def test_linear_spacing_below_1khz(self):
        # Slaney scale is linear below 1 kHz: filter centers are evenly spaced.
        audio = AudioConfig(fmin=0.0, fmax=1000.0, n_mels=10)
        fb = np.asarray(mel_filterbank(audio))
        freqs = np.linspace(0, audio.sample_rate / 2, audio.n_fft // 2 + 1)
        centers = freqs[np.argmax(fb, axis=0)]
        gaps = np.diff(centers)
        assert np.all(np.abs(gaps - gaps.mean()) < freqs[1]), gaps

    def test_htk_scale_differs(self):
        fb_slaney = np.asarray(mel_filterbank(AUDIO))
        fb_htk = np.asarray(mel_filterbank(AudioConfig(mel_scale="htk", norm=None)))
        assert not np.allclose(fb_slaney, fb_htk)


class TestSTFT:
    def test_magnitude_matches_torch(self):
        wave = _test_wave()
        ours = np.asarray(
            stft_magnitude(
                jnp.asarray(wave), AUDIO.n_fft, AUDIO.hop_length, AUDIO.win_length,
                power=2.0,
            )
        )
        theirs = (
            torch.stft(
                torch.from_numpy(wave),
                n_fft=AUDIO.n_fft,
                hop_length=AUDIO.hop_length,
                win_length=AUDIO.win_length,
                window=torch.hann_window(AUDIO.win_length),
                center=True,
                pad_mode="reflect",
                return_complex=True,
            )
            .abs()
            .pow(2.0)
            .numpy()
        )
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-3)

    def test_short_window_padded_like_torch(self):
        # win_length < n_fft: torch center-pads the window with zeros.
        wave = _test_wave(12000)
        n_fft, hop, win = 2048, 240, 1200
        ours = np.asarray(
            stft_magnitude(jnp.asarray(wave), n_fft, hop, win, power=1.0)
        )
        theirs = (
            torch.stft(
                torch.from_numpy(wave),
                n_fft=n_fft,
                hop_length=hop,
                win_length=win,
                window=torch.hann_window(win),
                center=True,
                pad_mode="reflect",
                return_complex=True,
            )
            .abs()
            .numpy()
        )
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)

    def test_frame_count_contract(self):
        # T = time // hop + 1 (reference: data/audio_processing.py:49-52)
        for n in (22050, 10000, 4096):
            assert num_stft_frames(n, AUDIO.n_fft, AUDIO.hop_length) == n // AUDIO.hop_length + 1

    def test_batched(self):
        waves = np.stack([_test_wave(8192, seed=i) for i in range(3)])
        out = stft_magnitude(jnp.asarray(waves), 1024, 256, 1024, power=2.0)
        assert out.shape == (3, 513, 8192 // 256 + 1)


class TestLogMel:
    def test_full_pipeline_vs_torch_reference(self):
        """End-to-end: torch.stft power spectrum x loop-form slaney fb, log10."""
        wave = _test_wave()
        ours = np.asarray(log_mel_spectrogram(jnp.asarray(wave), AUDIO))
        spec = (
            torch.stft(
                torch.from_numpy(wave),
                n_fft=AUDIO.n_fft,
                hop_length=AUDIO.hop_length,
                win_length=AUDIO.win_length,
                window=torch.hann_window(AUDIO.win_length),
                center=True,
                pad_mode="reflect",
                return_complex=True,
            )
            .abs()
            .pow(2.0)
            .numpy()
        )
        fb = _slaney_fb_loop(
            AUDIO.n_fft // 2 + 1, AUDIO.fmin, AUDIO.fmax, AUDIO.n_mels, AUDIO.sample_rate
        )
        theirs = np.log10(fb.T @ spec + 1e-10)
        assert ours.shape == theirs.shape
        mae = np.mean(np.abs(ours - theirs))
        # BASELINE.md target: mel-MAE < 1e-3 on CPU goldens
        assert mae < 1e-3, f"mel MAE {mae}"

    def test_shape_contract(self):
        wave = _test_wave(22050)
        mel = extract_mel(wave, 22050, AUDIO)
        assert mel.shape == (AUDIO.n_mels, 22050 // AUDIO.hop_length + 1)

    def test_stereo_downmix(self):
        wave = _test_wave()
        stereo = np.stack([wave, wave * 0.5])
        mel_stereo = np.asarray(extract_mel(stereo, 22050, AUDIO))
        mono = stereo.mean(axis=0)
        mel_mono = np.asarray(extract_mel(mono, 22050, AUDIO))
        np.testing.assert_allclose(mel_stereo, mel_mono, atol=1e-5)

    def test_log_range_reasonable(self):
        wave = _test_wave()
        mel = np.asarray(extract_mel(wave, 22050, AUDIO))
        assert mel.min() >= -10.0  # log10(1e-10) floor
        assert np.isfinite(mel).all()

    def test_natural_log_base(self):
        audio = AudioConfig(log_base="e")
        wave = _test_wave(8192)
        ours = np.asarray(log_mel_spectrogram(jnp.asarray(wave), audio))
        base10 = np.asarray(log_mel_spectrogram(jnp.asarray(wave), AUDIO))
        np.testing.assert_allclose(ours, base10 * np.log(10.0), rtol=1e-4, atol=1e-4)


class TestResample:
    def test_preserves_tone_frequency(self):
        sr_in, sr_out, f0 = 16000, 22050, 440.0
        t = np.arange(16000) / sr_in
        wave = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        out = np.asarray(resample(jnp.asarray(wave)[None], sr_in, sr_out))[0]
        assert out.shape[0] == int(np.ceil(22050 * 16000 / 16000))
        # Correlate against the analytic target tone (ignore filter edges).
        t2 = np.arange(out.shape[0]) / sr_out
        target = np.sin(2 * np.pi * f0 * t2)
        mid = slice(1000, -1000)
        corr = np.corrcoef(out[mid], target[mid])[0, 1]
        assert corr > 0.999, corr

    def test_identity_when_same_rate(self):
        wave = _test_wave(4096)
        out = np.asarray(resample(jnp.asarray(wave)[None], 22050, 22050))[0]
        np.testing.assert_array_equal(out, wave)


class TestExtractMelFromFile:
    def test_roundtrip(self, tmp_path):
        from sambert_hifigan_tpu.data.audio import save_wav
        from sambert_hifigan_tpu.ops.mel import extract_mel_from_file

        wave = _test_wave(8192)
        p = tmp_path / "x.wav"
        save_wav(p, wave, 22050)
        mel, sr = extract_mel_from_file(p, AUDIO)
        assert sr == 22050
        assert mel.shape == (AUDIO.n_mels, 8192 // AUDIO.hop_length + 1)
        direct = extract_mel(wave, 22050, AUDIO)
        # 16-bit PCM quantization of the wav bounds the mel difference
        assert float(np.abs(np.asarray(mel) - np.asarray(direct)).mean()) < 1e-2

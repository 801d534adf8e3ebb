#!/usr/bin/env python
"""Generate the committed mel goldens in tests/data/.

torchaudio is not installable in this environment (and librosa isn't either),
so the goldens are produced by the closest available INDEPENDENT path:

  * the spectrogram comes from torch.stft (center=True, pad_mode='reflect',
    hann window, onesided, power 2) — the exact backend
    torchaudio.transforms.Spectrogram drives (torchaudio spectrogram ==
    torch.stft + abs()**power), and third-party code with no relation to
    this repo's JAX STFT;
  * the slaney filterbank is computed here in float64 with the CLASSIC
    per-filter triangle construction (explicit rising/falling edges per mel
    band), a different formulation from ops/mel.py's vectorized slopes
    (torchaudio's _create_triangular_filterbank style).

Both goldens match torchaudio.transforms.MelSpectrogram(power=2,
mel_scale='slaney', norm='slaney') semantics (reference:
data/audio_processing.py:99-133).

Run:  python tests/data/gen_mel_goldens.py
"""

import os

import numpy as np
import torch

SR, N_FFT, HOP, WIN, N_MELS, FMIN, FMAX = 22050, 1024, 256, 1024, 80, 0.0, 8000.0
HERE = os.path.dirname(os.path.abspath(__file__))


def hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    # Slaney 1998 Auditory Toolbox: linear below 1 kHz, log above.
    out = np.where(
        f < 1000.0,
        3.0 * f / 200.0,
        15.0 + 27.0 * np.log(f / 1000.0) / np.log(6.4),
    )
    return out


def mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    return np.where(
        m < 15.0,
        200.0 * m / 3.0,
        1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0)),
    )


def loop_form_fbank():
    """Classic per-band triangle construction, float64."""
    n_freqs = N_FFT // 2 + 1
    freqs = np.linspace(0.0, SR / 2.0, n_freqs)
    mel_pts = np.linspace(hz_to_mel_slaney(FMIN), hz_to_mel_slaney(FMAX), N_MELS + 2)
    hz_pts = mel_to_hz_slaney(mel_pts)
    fb = np.zeros((n_freqs, N_MELS), dtype=np.float64)
    for m in range(N_MELS):
        left, center, right = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        for k, f in enumerate(freqs):
            if left < f < center:
                fb[k, m] = (f - left) / (center - left)
            elif f == center:
                fb[k, m] = 1.0
            elif center < f < right:
                fb[k, m] = (right - f) / (right - center)
        # slaney area normalization
        fb[:, m] *= 2.0 / (right - left)
    return fb


def torch_power_spectrogram(wav):
    x = torch.from_numpy(wav.astype(np.float64))
    spec = torch.stft(
        x,
        n_fft=N_FFT,
        hop_length=HOP,
        win_length=WIN,
        window=torch.hann_window(WIN, periodic=True, dtype=torch.float64),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return spec.abs().pow(2.0).numpy()  # [n_freqs, T]


def test_signal():
    """1 s deterministic chirp + tone + noise floor (covers low/high bands)."""
    rng = np.random.default_rng(1234)
    t = np.arange(SR) / SR
    chirp = np.sin(2 * np.pi * (100 * t + (4000 - 100) / 2.0 * t * t))
    tone = 0.3 * np.sin(2 * np.pi * 440 * t)
    noise = 0.01 * rng.standard_normal(SR)
    return (0.6 * chirp + tone + noise).astype(np.float64)


def main():
    fb = loop_form_fbank()
    wav = test_signal()
    spec = torch_power_spectrogram(wav)
    mel = fb.T @ spec  # [n_mels, T]
    log_mel = np.log10(mel + 1e-10)
    np.save(os.path.join(HERE, "golden_mel_fbank.npy"), fb)
    np.save(os.path.join(HERE, "golden_mel_wav.npy"), wav.astype(np.float32))
    np.save(os.path.join(HERE, "golden_power_spec.npy"), spec.astype(np.float32))
    np.save(os.path.join(HERE, "golden_log_mel.npy"), log_mel.astype(np.float32))
    print("fbank", fb.shape, "spec", spec.shape, "log_mel", log_mel.shape)


if __name__ == "__main__":
    main()

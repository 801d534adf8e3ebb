"""Ground-truth feature extraction: F0 (pitch), energy, durations.

The reference never implemented these (first-class absence I-6; only theory in
reference docs/acoustic_features_theory.md:340-420 for F0 via autocorrelation
and :530-623 for RMS energy with [0, 1] normalization + 256-bin quantization).
This module supplies them as jittable JAX ops whose frame layout is aligned
1:1 with the mel frames (center-padded, hop 256, T = time // hop + 1), so
pitch_gt / energy_gt line up with mel_gt by construction.

F0: frame-wise normalized autocorrelation (the textbook method from the
reference's own docs), searched over lags [sr/fmax_pitch, sr/fmin_pitch],
computed with an rFFT (Wiener-Khinchin) — one batched FFT on the TPU instead
of a lag loop.  Unvoiced frames (peak NCC below threshold or silent) report
f0 = 0 and voiced_mask = False, which feeds the pitch-loss mask
(reference: models/losses.py:157-207).

Energy: per-frame RMS, normalized per utterance to [0, 1] to match the
EnergyPredictor's fixed [0, 1] quantization range
(reference: models/variance_adaptor.py:462, docs/acoustic_features_theory.md:530-623).

Durations: `uniform_durations` is the lazy bootstrap (even split); real
targets come from the learned CTC forced aligner in data/aligner.py
(TTSDataset.compute_alignments / scripts/preprocess.py --aligner ctc), which
rewrites the cached durations with Viterbi segmentations summing exactly to
each utterance's frame count.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AudioConfig
from ..ops.stft import frame_signal


def frame_waveform_centered(
    wav: jnp.ndarray, frame_length: int, hop: int
) -> jnp.ndarray:
    """Frames aligned with the centered STFT: reflect-pad frame_length//2 on
    both sides -> [..., T, frame_length], T = time // hop + 1."""
    pad = frame_length // 2
    x = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect")
    return frame_signal(x, frame_length, hop)


def extract_f0(
    wav: jnp.ndarray,  # [..., time]
    audio: AudioConfig,
    fmin_pitch: float = 80.0,
    fmax_pitch: float = 600.0,
    voicing_threshold: float = 0.3,
    energy_floor: float = 1e-4,
    frame_length: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Autocorrelation F0 -> (f0 [..., T] in Hz with 0 for unvoiced,
    voiced_mask [..., T] bool).  The search band matches the PitchPredictor's
    quantization range [80, 600] Hz (reference: configs/model_config.yaml:30-33).
    """
    sr = audio.sample_rate
    frame_length = frame_length or audio.win_length
    frames = frame_waveform_centered(wav, frame_length, audio.hop_length)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    # Wiener-Khinchin: autocorrelation via power spectrum.
    n_fft = 2 * frame_length
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    ac = jnp.fft.irfft(jnp.abs(spec) ** 2, n=n_fft, axis=-1)[..., :frame_length]
    r0 = ac[..., 0]
    ncc = ac / (r0[..., None] + 1e-10)

    lag_min = max(int(sr / fmax_pitch), 2)
    lag_max = min(int(sr / fmin_pitch) + 1, frame_length - 1)
    lags = jnp.arange(lag_min, lag_max + 1)
    band = ncc[..., lag_min : lag_max + 1]
    best = jnp.argmax(band, axis=-1)
    peak = jnp.take_along_axis(band, best[..., None], axis=-1)[..., 0]
    best_lag = lags[best].astype(jnp.float32)

    # Parabolic interpolation around the peak for sub-sample lag precision.
    idx = best + lag_min
    idx_m = jnp.clip(idx - 1, 0, frame_length - 1)
    idx_p = jnp.clip(idx + 1, 0, frame_length - 1)
    ym = jnp.take_along_axis(ncc, idx_m[..., None], axis=-1)[..., 0]
    y0 = jnp.take_along_axis(ncc, idx[..., None], axis=-1)[..., 0]
    yp = jnp.take_along_axis(ncc, idx_p[..., None], axis=-1)[..., 0]
    denom = ym - 2 * y0 + yp
    delta = jnp.where(jnp.abs(denom) > 1e-8, 0.5 * (ym - yp) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    refined_lag = best_lag + delta

    f0 = sr / jnp.maximum(refined_lag, 1.0)
    rms = jnp.sqrt(r0 / frame_length + 1e-12)
    voiced = (peak > voicing_threshold) & (rms > energy_floor)
    voiced &= (f0 >= fmin_pitch) & (f0 <= fmax_pitch)
    f0 = jnp.where(voiced, f0, 0.0)
    return f0, voiced


def extract_energy(
    wav: jnp.ndarray, audio: AudioConfig, normalize: bool = True
) -> jnp.ndarray:
    """Per-frame RMS normalized per utterance to [0, 1]
    -> energy [..., T], T = time // hop + 1.

    normalize=False returns the raw RMS so callers that extract on padded
    buffers can slice to the true frame count first and normalize over real
    frames only (TTSDataset does this)."""
    frames = frame_waveform_centered(wav, audio.win_length, audio.hop_length)
    rms = jnp.sqrt(jnp.mean(jnp.square(frames), axis=-1) + 1e-12)
    if not normalize:
        return rms
    peak = jnp.max(rms, axis=-1, keepdims=True)
    return rms / (peak + 1e-8)


def uniform_durations(n_phonemes: int, n_frames: int) -> np.ndarray:
    """Split n_frames over n_phonemes as evenly as possible (host-side).

    sum(result) == n_frames exactly; the first (n_frames % n_phonemes)
    phonemes get one extra frame.
    """
    base = n_frames // n_phonemes
    rem = n_frames % n_phonemes
    out = np.full(n_phonemes, base, np.int32)
    out[:rem] += 1
    return out

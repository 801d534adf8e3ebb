"""Objective audio/mel evaluation metrics.

BASELINE.md's parity criterion is mel-MAE between implementations; these
helpers compute it plus the standard mel-cepstral distortion (MCD) used to
compare TTS systems.  All metrics run through the SAME shared log-mel op as
training and the losses (the consistency invariant).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import AudioConfig
from ..ops.mel import log_mel_spectrogram


def mel_mae(
    wav_a: np.ndarray, wav_b: np.ndarray, audio: Optional[AudioConfig] = None
) -> float:
    """Mean absolute error between log-mels of two waveforms [T].

    Trims both to the shorter length (frame-aligned comparison)."""
    audio = audio or AudioConfig()
    n = min(wav_a.shape[-1], wav_b.shape[-1])
    ma = log_mel_spectrogram(jnp.asarray(wav_a[..., :n], jnp.float32), audio)
    mb = log_mel_spectrogram(jnp.asarray(wav_b[..., :n], jnp.float32), audio)
    return float(jnp.mean(jnp.abs(ma - mb)))


def mel_mae_from_mels(mel_a: np.ndarray, mel_b: np.ndarray) -> float:
    """MAE between two log-mel matrices (any matching shape)."""
    a, b = np.asarray(mel_a), np.asarray(mel_b)
    t = min(a.shape[-1], b.shape[-1])
    return float(np.mean(np.abs(a[..., :t] - b[..., :t])))


def _mfcc_from_log_mel(log_mel: np.ndarray, n_mfcc: int = 13) -> np.ndarray:
    """DCT-II (ortho) over the mel axis -> [n_mfcc, T], c0 dropped by caller."""
    n_mels, t = log_mel.shape
    k = np.arange(n_mels)
    basis = np.cos(np.pi * (k[:, None] + 0.5) * np.arange(n_mfcc)[None, :] / n_mels)
    basis *= np.sqrt(2.0 / n_mels)
    basis[:, 0] /= np.sqrt(2.0)
    return (log_mel.T @ basis).T  # [n_mfcc, T]


def mcd(
    wav_a: np.ndarray,
    wav_b: np.ndarray,
    audio: Optional[AudioConfig] = None,
    n_mfcc: int = 13,
) -> float:
    """Mel-cepstral distortion in dB (lower = closer; identical audio -> 0).

    MCD = (10 / ln 10) * sqrt(2) * mean_t ||c_a[1:] - c_b[1:]||_2
    computed on mel cepstra from the shared log-mel front end.
    """
    audio = audio or AudioConfig()
    n = min(wav_a.shape[-1], wav_b.shape[-1])
    ma = np.asarray(
        log_mel_spectrogram(jnp.asarray(wav_a[..., :n], jnp.float32), audio)
    )
    mb = np.asarray(
        log_mel_spectrogram(jnp.asarray(wav_b[..., :n], jnp.float32), audio)
    )
    # the shared op is log10; cepstra convention uses ln
    ca = _mfcc_from_log_mel(ma * np.log(10.0), n_mfcc)
    cb = _mfcc_from_log_mel(mb * np.log(10.0), n_mfcc)
    diff = ca[1:] - cb[1:]  # drop c0 (energy)
    dist = np.sqrt(np.sum(diff**2, axis=0))
    return float((10.0 / np.log(10.0)) * np.sqrt(2.0) * np.mean(dist))


def mel_mae_dtw(
    wav_a: np.ndarray,
    wav_b: np.ndarray,
    audio: Optional[AudioConfig] = None,
) -> float:
    """Alignment-invariant mel-MAE: DTW over frames, then mean |diff| along
    the optimal path.  Full TTS predicts its own durations, so a frame-wise
    comparison against the recording conflates timing drift with spectral
    error; DTW isolates the spectral part (standard practice for TTS MCD)."""
    audio = audio or AudioConfig()
    ma = np.asarray(log_mel_spectrogram(jnp.asarray(wav_a, jnp.float32), audio)).T
    mb = np.asarray(log_mel_spectrogram(jnp.asarray(wav_b, jnp.float32), audio)).T
    ta, tb = ma.shape[0], mb.shape[0]
    # frame-pair cost: mean abs diff over mel bins
    cost = np.abs(ma[:, None, :] - mb[None, :, :]).mean(-1)  # [ta, tb]
    # plain-loop DP: a few hundred frames, negligible cost
    acc = np.full((ta + 1, tb + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, ta + 1):
        for j in range(1, tb + 1):
            acc[i, j] = cost[i - 1, j - 1] + min(
                acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1]
            )
    # recover path length for the mean
    i, j, path_cost, steps = ta, tb, 0.0, 0
    while i > 0 and j > 0:
        path_cost += cost[i - 1, j - 1]
        steps += 1
        k = int(np.argmin([acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1]]))
        if k == 0:
            i, j = i - 1, j - 1
        elif k == 1:
            i -= 1
        else:
            j -= 1
    return float(path_cost / max(steps, 1))

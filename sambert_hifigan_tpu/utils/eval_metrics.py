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
from ..ops.stft import stft_magnitude


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
    return _dtw(ma, mb)[0]


def _dtw(ma: np.ndarray, mb: np.ndarray):
    """DTW between [T, n_mels] sequences.  Returns (mean path cost,
    path_a indices, path_b indices).

    Row-vectorized DP (one numpy pass per reference frame); cost rows are
    computed on the fly, so memory is O(ta*tb) for the DP table plus one
    [tb, n_mels] row — minutes-long audio stays tractable."""
    ta, tb = ma.shape[0], mb.shape[0]
    acc = np.empty((ta, tb), np.float64)
    move = np.empty((ta, tb), np.int8)  # 0=diag, 1=up (i-1), 2=left (j-1)
    cost0 = np.abs(ma[0][None, :] - mb).mean(-1)
    acc[0] = np.cumsum(cost0)
    move[0] = 2
    move[0, 0] = 0
    for i in range(1, ta):
        cost = np.abs(ma[i][None, :] - mb).mean(-1)  # [tb]
        prev = acc[i - 1]
        # candidates from diag (prev shifted) and up (prev); left handled by
        # the running scan below
        diag = np.concatenate(([np.inf], prev[:-1]))
        best = np.where(diag <= prev, diag, prev)
        mv = np.where(diag <= prev, 0, 1).astype(np.int8)
        # left (j-1) transition: row[j] = cost[j] + min(best[j], row[j-1])
        # unrolls to row[j] = Cs[j] + min_{k<=j}(best[k] - Cs[k-1]) — a
        # min-plus prefix scan, vectorized with cumsum + minimum.accumulate
        cs = np.cumsum(cost)
        g = best - np.concatenate(([0.0], cs[:-1]))
        gm = np.minimum.accumulate(g)
        acc[i] = gm + cs
        move[i] = np.where(gm < g, np.int8(2), mv)
    # backtrack for the mean over the optimal path
    i, j = ta - 1, tb - 1
    path_cost, steps = 0.0, 0
    pa, pb = [], []
    while True:
        path_cost += float(np.abs(ma[i] - mb[j]).mean())
        pa.append(i)
        pb.append(j)
        steps += 1
        if i == 0 and j == 0:
            break
        m = move[i, j]
        if m == 0 and i > 0 and j > 0:
            i, j = i - 1, j - 1
        elif m == 1 and i > 0:
            i -= 1
        elif j > 0:
            j -= 1
        else:
            i -= 1
    return (
        float(path_cost / steps),
        np.asarray(pa[::-1], np.int64),
        np.asarray(pb[::-1], np.int64),
    )


def stft_logmag_mae(
    wav_a: np.ndarray,
    wav_b: np.ndarray,
    fft_sizes: Tuple[int, ...] = (512, 1024, 2048),
    sample_rate_hops: int = 4,
) -> float:
    """Multi-resolution STFT log-magnitude MAE between two waveforms [T].

    Finer frequency resolution than the 80-bin mel (2048-point FFT resolves
    individual harmonics up to high F0), so it penalizes the harmonic
    oversmoothing that a mel-domain metric can't see.  This is the eval-side
    counterpart of the multi-resolution STFT *training* loss
    (losses/vocoder.py; reference: models/losses.py:800-860) at the same
    resolutions, making it the standard phase-blind sharpness metric for
    vocoder ablations.  Trims to the shorter waveform.
    """
    n = min(wav_a.shape[-1], wav_b.shape[-1])
    a = jnp.asarray(wav_a[..., :n], jnp.float32)
    b = jnp.asarray(wav_b[..., :n], jnp.float32)
    vals = []
    for n_fft in fft_sizes:
        hop = n_fft // sample_rate_hops
        ma = jnp.log(stft_magnitude(a, n_fft, hop, n_fft) + 1e-5)
        mb = jnp.log(stft_magnitude(b, n_fft, hop, n_fft) + 1e-5)
        vals.append(float(jnp.mean(jnp.abs(ma - mb))))
    return float(np.mean(vals))


def f0_metrics(
    wav_ref: np.ndarray,
    wav_syn: np.ndarray,
    audio: Optional[AudioConfig] = None,
) -> dict:
    """Periodicity-sensitive vocoder metrics (the dimension adversarial
    training targets: waveform phase coherence across frames, which the
    frame-local mel/STFT magnitudes cannot measure).

    Returns:
      f0_rmse_hz  — RMSE of autocorrelation F0 over frames voiced in BOTH
      voicing_f1  — F1 of the synthetic voicing decision vs the reference's

    Uses the same `extract_f0` as training-feature extraction
    (data/features.py:50), band [80, 600] Hz.
    """
    from ..data.features import extract_f0

    audio = audio or AudioConfig()
    n = min(wav_ref.shape[-1], wav_syn.shape[-1])
    f0_r, v_r = extract_f0(jnp.asarray(wav_ref[..., :n], jnp.float32), audio)
    f0_s, v_s = extract_f0(jnp.asarray(wav_syn[..., :n], jnp.float32), audio)
    return _f0_compare(
        np.asarray(f0_r), np.asarray(f0_s), np.asarray(v_r), np.asarray(v_s)
    )


def _f0_compare(
    f0_r: np.ndarray, f0_s: np.ndarray, v_r: np.ndarray, v_s: np.ndarray
) -> dict:
    """F0-RMSE over frames voiced on both sides + voicing-decision F1 —
    shared by the frame-wise (f0_metrics) and DTW-aligned (f0_metrics_dtw)
    variants so their definitions cannot drift."""
    both = v_r & v_s
    if both.any():
        rmse = float(np.sqrt(np.mean((f0_r[both] - f0_s[both]) ** 2)))
    else:
        rmse = float("nan")
    tp = float(both.sum())
    prec = tp / max(float(v_s.sum()), 1.0)
    rec = tp / max(float(v_r.sum()), 1.0)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    return {"f0_rmse_hz": rmse, "voicing_f1": float(f1)}


def f0_metrics_dtw(
    wav_ref: np.ndarray,
    wav_syn: np.ndarray,
    audio: Optional[AudioConfig] = None,
) -> dict:
    """Alignment-invariant F0 metrics for full TTS: align frames with the
    SAME mel-DTW path as mel_mae_dtw (predicted durations need not match the
    recording), then compare autocorrelation F0 over path pairs voiced on
    both sides.  Returns {"f0_rmse_hz", "voicing_f1"} like f0_metrics."""
    from ..data.features import extract_f0

    audio = audio or AudioConfig()
    ma = np.asarray(
        log_mel_spectrogram(jnp.asarray(wav_ref, jnp.float32), audio)
    ).T
    mb = np.asarray(
        log_mel_spectrogram(jnp.asarray(wav_syn, jnp.float32), audio)
    ).T
    _, pa, pb = _dtw(ma, mb)
    f0_r, v_r = extract_f0(jnp.asarray(wav_ref, jnp.float32), audio)
    f0_s, v_s = extract_f0(jnp.asarray(wav_syn, jnp.float32), audio)
    f0_r, v_r = np.asarray(f0_r), np.asarray(v_r)
    f0_s, v_s = np.asarray(f0_s), np.asarray(v_s)
    # F0 frames share the mel hop; clamp the path to the shorter F0 track
    pa = np.clip(pa, 0, len(f0_r) - 1)
    pb = np.clip(pb, 0, len(f0_s) - 1)
    return _f0_compare(f0_r[pa], f0_s[pb], v_r[pa], v_s[pb])

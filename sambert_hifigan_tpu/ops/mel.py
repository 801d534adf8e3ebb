"""Log-mel spectrogram extraction — the single shared implementation.

The reference builds the identical torchaudio MelSpectrogram transform in two
places (dataset preprocessing, reference: data/audio_processing.py:99-113; and
the vocoder mel-reconstruction loss, reference: models/losses.py:413-429) and
relies on construction-from-the-same-config for consistency.  Here there is
exactly ONE implementation, used by preprocessing, the vocoder loss, and
inference-side round-trip checks.

The filterbank math reproduces torchaudio.functional.melscale_fbanks with
mel_scale="slaney", norm="slaney" (the defaults in the reference config,
configs/config.yaml:12-13): the Slaney mel scale is linear below 1 kHz and
logarithmic above, and Slaney normalization scales each triangular filter by
2 / (f[m+2] - f[m]).

Output contract (reference: data/audio_processing.py:49-52, 121-133):
  log_mel = log10(mel_power + 1e-10), shape [n_mels, T], T = time//hop + 1.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AudioConfig
from .stft import hann_window, stft_magnitude

_MEL_LOG_EPS = 1e-10

# Slaney mel-scale constants
_F_SP = 200.0 / 3.0  # Hz per mel below the break
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP  # 15.0
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(freq: np.ndarray, mel_scale: str = "slaney") -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    mels = freq / _F_SP
    log_region = freq >= _MIN_LOG_HZ
    mels = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(freq, _MIN_LOG_HZ) / _MIN_LOG_HZ) / _LOGSTEP,
        mels,
    )
    return mels


def mel_to_hz(mels: np.ndarray, mel_scale: str = "slaney") -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    freqs = _F_SP * mels
    log_region = mels >= _MIN_LOG_MEL
    freqs = np.where(
        log_region,
        _MIN_LOG_HZ * np.exp(_LOGSTEP * (mels - _MIN_LOG_MEL)),
        freqs,
    )
    return freqs


@functools.lru_cache(maxsize=16)
def _mel_filterbank_np(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
    norm: Optional[str],
    mel_scale: str,
) -> np.ndarray:
    """Triangular mel filterbank [n_freqs, n_mels], float64 -> float32."""
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_min = hz_to_mel(f_min, mel_scale)
    m_max = hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz(m_pts, mel_scale)  # [n_mels + 2]

    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down_slopes = -slopes[:, :-2] / f_diff[:-1]  # rising edge
    up_slopes = slopes[:, 2:] / f_diff[1:]  # falling edge
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))  # [n_freqs, n_mels]

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def mel_filterbank(audio: AudioConfig) -> jnp.ndarray:
    """Mel filterbank [n_freqs, n_mels] for the given audio config."""
    n_freqs = audio.n_fft // 2 + 1
    fb = _mel_filterbank_np(
        n_freqs,
        float(audio.fmin),
        float(audio.fmax),
        audio.n_mels,
        audio.sample_rate,
        audio.norm,
        audio.mel_scale,
    )
    return jnp.asarray(fb)


def _apply_log(mel: jnp.ndarray, log_base: Any) -> jnp.ndarray:
    """log_b(mel + 1e-10) with the reference's base handling
    (reference: data/audio_processing.py:121-133)."""
    x = mel + _MEL_LOG_EPS
    if log_base == 10.0 or log_base == "10":
        return jnp.log10(x)
    if log_base == "e" or log_base == 2.718281828459045:
        return jnp.log(x)
    return jnp.log(x) / np.log(float(log_base))


def mel_power_spectrogram(waveform: jnp.ndarray, audio: AudioConfig) -> jnp.ndarray:
    """Power mel spectrogram (no log) of waveform [..., time] -> [..., n_mels, T]."""
    spec = stft_magnitude(
        waveform,
        n_fft=audio.n_fft,
        hop_length=audio.hop_length,
        win_length=audio.win_length,
        window=hann_window(audio.win_length, dtype=waveform.dtype),
        center=True,
        power=2.0,
    )  # [..., n_freqs, T]
    fb = mel_filterbank(audio).astype(waveform.dtype)  # [n_freqs, n_mels]
    # [..., n_freqs, T] x [n_freqs, n_mels] -> [..., n_mels, T]
    mel = jnp.einsum("...ft,fm->...mt", spec, fb)
    return mel


def log_mel_spectrogram(waveform: jnp.ndarray, audio: AudioConfig) -> jnp.ndarray:
    """Log-mel spectrogram of waveform [..., time] -> [..., n_mels, T].

    This is the op shared by preprocessing, the vocoder mel-reconstruction
    loss, and inference (the consistency invariant, reference: README.md:175-190).
    """
    return _apply_log(mel_power_spectrogram(waveform, audio), audio.log_base)


def extract_mel(
    waveform,
    sample_rate: Optional[int] = None,
    audio: Optional[AudioConfig] = None,
) -> jnp.ndarray:
    """User-facing mel extraction mirroring the reference API
    (reference: data/audio_processing.py:31-139).

    Accepts [time] or [channels, time]; resamples to audio.sample_rate if
    needed, downmixes to mono, returns log-mel [n_mels, T].
    """
    if audio is None:
        audio = AudioConfig()
    x = jnp.asarray(waveform, dtype=jnp.float32)
    if x.ndim == 1:
        x = x[None, :]
    if sample_rate is not None and sample_rate != audio.sample_rate:
        x = resample(x, sample_rate, audio.sample_rate)
    if x.shape[0] > 1:
        x = jnp.mean(x, axis=0, keepdims=True)
    return log_mel_spectrogram(x[0], audio)


def extract_mel_from_file(
    audio_path, audio: Optional[AudioConfig] = None
):
    """Load an audio file and extract its log-mel
    (reference: data/audio_processing.py:142-164).

    Returns (log_mel [n_mels, T], original sample_rate).
    """
    from ..data.audio import load_wav

    waveform, sample_rate = load_wav(audio_path)
    return extract_mel(waveform, sample_rate, audio), sample_rate


# ---------------------------------------------------------------------------
# Resampling (sinc interpolation, matching torchaudio.transforms.Resample
# defaults: lowpass_filter_width=6, rolloff=0.99, sinc_interp_hann)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _resample_kernel_np(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
                        rolloff: float = 0.99):
    gcd = np.gcd(orig_freq, new_freq)
    orig = orig_freq // gcd
    new = new_freq // gcd
    base_freq = min(orig, new) * rolloff
    width = int(np.ceil(lowpass_filter_width * orig / base_freq))
    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    scale = base_freq / orig
    with np.errstate(invalid="ignore", divide="ignore"):
        sinc = np.where(t == 0, 1.0, np.sin(t * np.pi) / (t * np.pi))
    kernels = sinc * window * scale
    return kernels.astype(np.float32), width, orig, new


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """Resample x [channels, time] from orig_freq to new_freq."""
    if orig_freq == new_freq:
        return x
    kernels, width, orig, new = _resample_kernel_np(orig_freq, new_freq)
    num_wavs, length = x.shape
    target_length = int(np.ceil(new * length / orig))
    x_pad = jnp.pad(x, ((0, 0), (width, width + orig)))
    k = jnp.asarray(kernels)[:, None, :]  # [new, 1, kernel]
    y = jax.lax.conv_general_dilated(
        x_pad[:, None, :],  # [C, 1, T]
        k,
        window_strides=(orig,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [C, new, T//orig]
    y = y.transpose(0, 2, 1).reshape(num_wavs, -1)
    return y[:, :target_length]

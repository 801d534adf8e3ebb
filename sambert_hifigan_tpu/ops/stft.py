"""STFT for TPU.

Reproduces the exact semantics of torch.stft as used by
torchaudio.transforms.MelSpectrogram (reference: data/audio_processing.py:99-113):
center=True with reflect padding of n_fft//2 on both sides, periodic Hann
window, onesided rFFT, no normalization.

Frame-count contract (reference: data/audio_processing.py:49-52 and
models/losses.py:774): T = time // hop_length + 1.

Implementation notes (TPU):
  * Framing is a gather with static strides -> XLA lowers it to cheap dynamic
    slices; the rFFT runs as an XLA FFT op; the whole pipeline fuses under jit.
  * Everything is static-shape: T_frames is derived from the (static) input
    length at trace time.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window, matching torch.hann_window(periodic=True)."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def _frame_indices(num_frames: int, frame_length: int, hop: int) -> np.ndarray:
    starts = np.arange(num_frames)[:, None] * hop
    offsets = np.arange(frame_length)[None, :]
    return starts + offsets  # [T, frame_length]


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Slice x [..., time] into overlapping frames [..., T, frame_length]."""
    time = x.shape[-1]
    num_frames = 1 + (time - frame_length) // hop
    idx = _frame_indices(num_frames, frame_length, hop)
    return x[..., idx]


def stft_complex(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
) -> jnp.ndarray:
    """Complex STFT of x [..., time] -> [..., n_freqs, T].

    Same conventions as torch.stft(center=True, pad_mode="reflect",
    onesided=True, normalized=False); used for magnitude everywhere and for
    phase-spectrum visualization (reference: plot_new.py:110-121).
    """
    if window is None:
        window = hann_window(win_length, dtype=x.dtype)
    if win_length < n_fft:
        # torch zero-pads the window symmetrically to n_fft.
        left = (n_fft - win_length) // 2
        window = jnp.pad(window, (left, n_fft - win_length - left))
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(x, n_fft, hop_length)  # [..., T, n_fft]
    frames = frames * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # [..., T, n_freqs]
    # [..., n_freqs, T] to match torch layout
    return jnp.swapaxes(spec, -1, -2)


def stft_magnitude(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    power: float = 1.0,
) -> jnp.ndarray:
    """|STFT|^power of x [..., time] -> [..., n_freqs, T].

    Matches torch.stft(center=True, pad_mode="reflect", onesided=True,
    normalized=False) followed by abs()**power.
    """
    mag = jnp.abs(stft_complex(x, n_fft, hop_length, win_length, window, center))
    if power != 1.0:
        mag = mag**power
    return mag


def num_stft_frames(time: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    """Static frame count for a given signal length."""
    if center:
        time = time + 2 * (n_fft // 2)
    return 1 + (time - n_fft) // hop_length

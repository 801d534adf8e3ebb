#!/usr/bin/env python
"""Offline audio visualization (replaces the reference's four librosa plot
scripts: plot_waveform.py, plot_waveform_mel.py, plot_new.py,
plot_all_diagrams.py) using this repo's own DSP ops — no librosa.

Usage:
  python scripts/plot_audio.py input.wav [--output out.png]
      [--panels waveform,channels,spec_mag,spec_db,phase,mel,mel_power,mel_db,f0,energy]
      [--seconds N] [--clip-percentile 99] [--vmin-db -80] [--fmax-vis 8000]

Panel parity with the reference scripts (reference: plot_new.py:146-268,
plot_all_diagrams.py:104-189):
  waveform    mono waveform used for analysis
  channels    original channels with vertical offsets (stereo view)
  spec_mag    linear |STFT| with percentile-clipped vmax
  spec_db     |STFT| in dB referenced to the max, floored at --vmin-db
  phase       wrapped STFT phase in [-pi, pi]
  mel         log-mel (the model feature, natural log)
  mel_power   linear mel power with percentile-clipped vmax
  mel_db      mel power in dB referenced to the max
  f0          extracted F0 contour over voiced frames
  energy      normalized RMS frame energy
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

ALL_PANELS = (
    "waveform,channels,spec_mag,spec_db,phase,mel,mel_power,mel_db,f0,energy"
)


def main():
    import jax.numpy as jnp

    from sambert_hifigan_tpu.config import default_config
    from sambert_hifigan_tpu.data.audio import load_wav
    from sambert_hifigan_tpu.data.features import extract_energy, extract_f0
    from sambert_hifigan_tpu.ops.mel import log_mel_spectrogram, mel_filterbank, resample
    from sambert_hifigan_tpu.ops.stft import stft_complex

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input")
    p.add_argument("--output", default=None)
    p.add_argument(
        "--panels", default="waveform,spec_db,mel,f0,energy",
        help=f"comma list from: {ALL_PANELS} (or 'all')",
    )
    p.add_argument("--seconds", type=float, default=None,
                   help="only plot the first N seconds")
    p.add_argument("--clip-percentile", type=float, default=99.0,
                   help="vmax percentile for linear spectrogram panels")
    p.add_argument("--vmin-db", type=float, default=-80.0,
                   help="floor (dB) for dB panels")
    p.add_argument("--fmax-vis", type=float, default=8000.0,
                   help="max frequency (Hz) shown on STFT panels; 0 = sr/2")
    args = p.parse_args()
    cfg = default_config()
    audio = cfg.audio

    wav, sr = load_wav(args.input)  # [C, time]
    if args.seconds is not None:
        wav = wav[:, : int(round(args.seconds * sr))]
    channels = np.asarray(wav)
    sr0 = sr
    if sr != audio.sample_rate:
        wav = np.asarray(resample(jnp.asarray(wav), sr, audio.sample_rate))
        sr = audio.sample_rate
    mono = wav.mean(axis=0) if wav.shape[0] > 1 else wav[0]
    x = jnp.asarray(mono)
    t_axis = np.arange(mono.shape[0]) / sr
    hop_t = audio.hop_length / sr
    fmax_vis = (sr / 2) if args.fmax_vis <= 0 else min(args.fmax_vis, sr / 2)

    panel_arg = ALL_PANELS if args.panels.strip() == "all" else args.panels
    panels = [s.strip() for s in panel_arg.split(",") if s.strip()]

    # Shared spectra (computed lazily once)
    spec = None

    def get_spec():
        nonlocal spec
        if spec is None:
            spec = np.asarray(
                stft_complex(x, audio.n_fft, audio.hop_length, audio.win_length)
            )
        return spec

    fig, axes = plt.subplots(
        len(panels), 1, figsize=(12, 2.6 * len(panels)), constrained_layout=True
    )
    if len(panels) == 1:
        axes = [axes]

    for ax, panel in zip(axes, panels):
        if panel == "waveform":
            ax.plot(t_axis, mono, linewidth=0.4)
            ax.set_title("Waveform (mono used for analysis)")
            ax.set_ylabel("amplitude")
        elif panel == "channels":
            # original channels with vertical offsets (reference: plot_new.py:149-164)
            t0 = np.arange(channels.shape[1]) / sr0
            offset = 2.2 * (np.percentile(np.abs(channels), 99) + 1e-9)
            for c in range(channels.shape[0]):
                ax.plot(t0, channels[c] + c * offset, linewidth=0.4, label=f"ch{c}")
            if channels.shape[0] > 1:
                ax.legend(loc="upper right", frameon=False)
            ax.set_title(f"Waveform ({channels.shape[0]} channel(s), offsets)")
            ax.set_ylabel("amplitude")
        elif panel == "spec_mag":
            mag = np.abs(get_spec())
            vmax = np.percentile(mag, args.clip_percentile)
            im = ax.imshow(
                mag, origin="lower", aspect="auto", vmin=0.0, vmax=vmax,
                extent=[0, mag.shape[1] * hop_t, 0, sr / 2 / 1000], cmap="magma",
            )
            ax.set_ylim(0, fmax_vis / 1000)
            ax.set_title(
                f"STFT magnitude (linear, clipped @P{args.clip_percentile:g})"
            )
            ax.set_ylabel("kHz")
            fig.colorbar(im, ax=ax, format="%.2f")
        elif panel == "spec_db":
            mag = np.abs(get_spec())
            db = 20 * np.log10(mag / (mag.max() + 1e-10) + 1e-10)
            im = ax.imshow(
                db, origin="lower", aspect="auto", vmin=args.vmin_db, vmax=0.0,
                extent=[0, db.shape[1] * hop_t, 0, sr / 2 / 1000], cmap="magma",
            )
            ax.set_ylim(0, fmax_vis / 1000)
            ax.set_title(f"STFT magnitude (dB re max, vmin={args.vmin_db:g})")
            ax.set_ylabel("kHz")
            fig.colorbar(im, ax=ax, format="%+2.0f dB")
        elif panel == "phase":
            ph = np.angle(get_spec())
            im = ax.imshow(
                ph, origin="lower", aspect="auto", vmin=-np.pi, vmax=np.pi,
                extent=[0, ph.shape[1] * hop_t, 0, sr / 2 / 1000], cmap="twilight",
            )
            ax.set_ylim(0, fmax_vis / 1000)
            ax.set_title("STFT phase (wrapped) — discarded by mel features")
            ax.set_ylabel("kHz")
            fig.colorbar(im, ax=ax, format="%.2f")
        elif panel == "mel":
            mel = np.asarray(log_mel_spectrogram(x, audio))
            im = ax.imshow(
                mel, origin="lower", aspect="auto",
                extent=[0, mel.shape[1] * hop_t, 0, audio.n_mels], cmap="magma",
            )
            ax.set_title(f"Log-mel spectrogram ({audio.n_mels} bins) — model feature")
            ax.set_ylabel("mel bin")
            fig.colorbar(im, ax=ax, format="%.1f")
        elif panel == "mel_power":
            mag2 = np.abs(get_spec()) ** 2
            fb = np.asarray(mel_filterbank(audio))  # [n_freqs, n_mels]
            mp = fb.T @ mag2
            vmax = np.percentile(mp, args.clip_percentile)
            im = ax.imshow(
                mp, origin="lower", aspect="auto", vmin=0.0, vmax=vmax,
                extent=[0, mp.shape[1] * hop_t, 0, audio.n_mels], cmap="magma",
            )
            ax.set_title(
                f"Mel spectrogram (power, clipped @P{args.clip_percentile:g})"
            )
            ax.set_ylabel("mel bin")
            fig.colorbar(im, ax=ax, format="%.2f")
        elif panel == "mel_db":
            mag2 = np.abs(get_spec()) ** 2
            fb = np.asarray(mel_filterbank(audio))
            mp = fb.T @ mag2
            db = 10 * np.log10(mp / (mp.max() + 1e-12) + 1e-12)
            im = ax.imshow(
                db, origin="lower", aspect="auto", vmin=args.vmin_db, vmax=0.0,
                extent=[0, db.shape[1] * hop_t, 0, audio.n_mels], cmap="magma",
            )
            ax.set_title(f"Mel spectrogram (dB re max, vmin={args.vmin_db:g})")
            ax.set_ylabel("mel bin")
            fig.colorbar(im, ax=ax, format="%+2.0f dB")
        elif panel == "f0":
            f0, voiced = extract_f0(x, audio)
            f0, voiced = np.asarray(f0), np.asarray(voiced)
            frames_t = np.arange(f0.shape[0]) * hop_t
            ax.plot(frames_t[voiced], f0[voiced], ".", markersize=2)
            ax.set_title("F0 (voiced frames)")
            ax.set_ylabel("Hz")
            ax.set_ylim(0, 650)
        elif panel == "energy":
            e = np.asarray(extract_energy(x, audio))
            ax.plot(np.arange(e.shape[0]) * hop_t, e)
            ax.set_title("Frame energy (normalized RMS)")
            ax.set_ylabel("energy")
        else:
            raise SystemExit(f"unknown panel: {panel}")
        ax.set_xlabel("time (s)")

    frame_ms = 1000.0 * audio.hop_length / sr
    fig.suptitle(
        f"sr={sr} Hz | dur={mono.shape[0] / sr:.2f}s | hop={audio.hop_length} "
        f"({frame_ms:.2f} ms/frame) | n_fft={audio.n_fft} | n_mels={audio.n_mels}"
    )
    out = args.output or str(Path(args.input).with_suffix(".png"))
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

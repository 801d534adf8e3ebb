#!/usr/bin/env python
"""Offline audio visualization (replaces the reference's four librosa plot
scripts: plot_waveform.py, plot_waveform_mel.py, plot_new.py,
plot_all_diagrams.py) using this repo's own DSP ops — no librosa.

Usage:
  python scripts/plot_audio.py input.wav [--output out.png]
      [--panels waveform,spec_db,mel,mel_db,f0,energy]

Renders the requested panels into one figure: waveform, linear-STFT magnitude
in dB, log-mel, mel in dB, extracted F0 contour, frame energy.
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


def main():
    import jax.numpy as jnp

    from sambert_hifigan_tpu.config import default_config
    from sambert_hifigan_tpu.data.audio import load_wav
    from sambert_hifigan_tpu.data.features import extract_energy, extract_f0
    from sambert_hifigan_tpu.ops.mel import log_mel_spectrogram, resample
    from sambert_hifigan_tpu.ops.stft import stft_magnitude

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input")
    p.add_argument("--output", default=None)
    p.add_argument(
        "--panels", default="waveform,spec_db,mel,f0,energy",
        help="comma list: waveform,spec_db,mel,mel_db,f0,energy",
    )
    args = p.parse_args()
    cfg = default_config()
    audio = cfg.audio

    wav, sr = load_wav(args.input)
    if sr != audio.sample_rate:
        wav = np.asarray(resample(jnp.asarray(wav), sr, audio.sample_rate))
        sr = audio.sample_rate
    mono = wav.mean(axis=0) if wav.shape[0] > 1 else wav[0]
    x = jnp.asarray(mono)
    t_axis = np.arange(mono.shape[0]) / sr
    hop_t = audio.hop_length / sr

    panels = [s.strip() for s in args.panels.split(",") if s.strip()]
    fig, axes = plt.subplots(
        len(panels), 1, figsize=(12, 2.6 * len(panels)), constrained_layout=True
    )
    if len(panels) == 1:
        axes = [axes]

    for ax, panel in zip(axes, panels):
        if panel == "waveform":
            ax.plot(t_axis, mono, linewidth=0.4)
            ax.set_title("Waveform")
            ax.set_ylabel("amplitude")
        elif panel == "spec_db":
            mag = np.asarray(
                stft_magnitude(x, audio.n_fft, audio.hop_length, audio.win_length)
            )
            db = 20 * np.log10(mag + 1e-10)
            ax.imshow(
                db, origin="lower", aspect="auto",
                extent=[0, db.shape[1] * hop_t, 0, sr / 2 / 1000], cmap="magma",
            )
            ax.set_title("STFT magnitude (dB)")
            ax.set_ylabel("kHz")
        elif panel in ("mel", "mel_db"):
            mel = np.asarray(log_mel_spectrogram(x, audio))
            data = 10 * mel if panel == "mel_db" else mel  # log10 -> dB/10
            ax.imshow(
                data, origin="lower", aspect="auto",
                extent=[0, mel.shape[1] * hop_t, 0, audio.n_mels], cmap="magma",
            )
            ax.set_title(f"Log-mel spectrogram ({audio.n_mels} bins)")
            ax.set_ylabel("mel bin")
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

    out = args.output or str(Path(args.input).with_suffix(".png"))
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

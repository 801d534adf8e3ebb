#!/usr/bin/env python
"""Objective comparison of two audio files (or two saved mels).

Usage:
  python scripts/evaluate.py ref.wav synth.wav        # mel-MAE + MCD
  python scripts/evaluate.py ref_mel.npy synth_mel.npy

Metrics use the framework's shared log-mel op (the BASELINE.md parity
criterion is mel-MAE < 1e-3 for equivalent implementations).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    from sambert_hifigan_tpu.config import default_config
    from sambert_hifigan_tpu.data.audio import load_mel, load_wav
    from sambert_hifigan_tpu.ops.mel import resample
    from sambert_hifigan_tpu.utils.eval_metrics import (
        mcd,
        mel_mae,
        mel_mae_dtw,
        mel_mae_from_mels,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("reference")
    p.add_argument("candidate")
    args = p.parse_args()
    cfg = default_config()

    if args.reference.endswith(".npy"):
        a = load_mel(args.reference)
        b = load_mel(args.candidate)
        print(f"mel-MAE: {mel_mae_from_mels(a, b):.6f}")
        return

    import jax.numpy as jnp

    def load(path):
        wav, sr = load_wav(path)
        if sr != cfg.audio.sample_rate:
            wav = np.asarray(resample(jnp.asarray(wav), sr, cfg.audio.sample_rate))
        return wav.mean(axis=0) if wav.shape[0] > 1 else wav[0]

    a, b = load(args.reference), load(args.candidate)
    print(f"mel-MAE:     {mel_mae(a, b, cfg.audio):.6f}")
    print(f"dtw-mel-MAE: {mel_mae_dtw(a, b, cfg.audio):.6f}")
    print(f"MCD:         {mcd(a, b, cfg.audio):.3f} dB")


if __name__ == "__main__":
    main()

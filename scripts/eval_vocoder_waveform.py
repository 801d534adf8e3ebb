#!/usr/bin/env python
"""Waveform-domain vocoder comparison from already-synthesized wavs.

Usage:
  python scripts/eval_vocoder_waveform.py \
      --gt-dir data/demo_v2_eval/wavs \
      --syn-dir mel_only=/tmp/eval_v2_melonly \
      --syn-dir adv_mel_fm=/tmp/eval_v2_adv15k [--suffix _copy]

Matches `utt_XXXX.wav` ground truth against `utt_XXXX{suffix}.wav` in each
synth dir and reports, per system: mel-MAE, MCD, fine-resolution STFT
log-mag MAE, F0-RMSE, and voicing F1.

Rationale (why these metrics): mel-L1 is the `mel_only` ablation's literal
training objective, so it cannot adjudicate whether adversarial training
helps — the L1-trained model wins its own objective by construction.  The
standard vocoder-ablation evidence (HiFi-GAN tbl. 1-2 uses MOS for the same
reason) is phase/periodicity-sensitive metrics: fine-FFT STFT error (harmonic
sharpness) and F0/voicing consistency (periodicity).  CPU-only: runs from
wav files, no checkpoints needed (SAMBERT_FORCE_CPU=1 recommended).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import os as _os

_os.environ.setdefault("SAMBERT_FORCE_CPU", "1")

import jax

if _os.getenv("SAMBERT_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from sambert_hifigan_tpu.config import default_config
    from sambert_hifigan_tpu.data.audio import load_wav
    from sambert_hifigan_tpu.utils.eval_metrics import (
        f0_metrics,
        mcd,
        mel_mae,
        stft_logmag_mae,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--gt-dir", type=str, required=True)
    p.add_argument(
        "--syn-dir",
        action="append",
        required=True,
        help="label=dir; repeatable, one per system under comparison",
    )
    p.add_argument("--suffix", type=str, default="_copy")
    p.add_argument("--n", type=int, default=None, help="cap utterance count")
    args = p.parse_args()

    cfg = default_config()
    gt_dir = Path(args.gt_dir)
    systems = []
    for spec in args.syn_dir:
        label, _, d = spec.partition("=")
        systems.append((label, Path(d)))

    # Only utterances present in EVERY system (matched comparison).
    gts = sorted(gt_dir.glob("utt_*.wav"))
    utts = [
        g.stem
        for g in gts
        if all((d / f"{g.stem}{args.suffix}.wav").exists() for _, d in systems)
    ]
    if args.n:
        utts = utts[: args.n]
    if not utts:
        raise SystemExit(
            f"no matched utterances: {len(gts)} utt_*.wav under {gt_dir}, "
            f"but none have '<stem>{args.suffix}.wav' in every --syn-dir "
            f"(wrong --suffix or directory?)"
        )
    print(f"{len(utts)} matched utterances: {utts[0]} .. {utts[-1]}")

    header = f"{'system':>12} {'mel-MAE':>8} {'MCD dB':>8} {'stft-MAE':>9} {'F0-RMSE':>8} {'voic-F1':>8}"
    print(header)
    for label, d in systems:
        mm, mc, sm, fr, vf = [], [], [], [], []
        for u in utts:
            gt, _ = load_wav(gt_dir / f"{u}.wav")
            syn, _ = load_wav(d / f"{u}{args.suffix}.wav")
            gt, syn = gt[0], syn[0]
            mm.append(mel_mae(gt, syn, cfg.audio))
            mc.append(mcd(gt, syn, cfg.audio))
            sm.append(stft_logmag_mae(gt, syn))
            f0m = f0_metrics(gt, syn, cfg.audio)
            if np.isfinite(f0m["f0_rmse_hz"]):
                fr.append(f0m["f0_rmse_hz"])
            vf.append(f0m["voicing_f1"])
        # fr can be empty when no utterance has jointly-voiced frames;
        # print a marker instead of numpy's nan-with-RuntimeWarning
        f0_col = f"{np.mean(fr):8.2f}" if fr else f"{'n/a':>8}"
        print(
            f"{label:>12} {np.mean(mm):8.4f} {np.mean(mc):8.3f} "
            f"{np.mean(sm):9.4f} {f0_col} {np.mean(vf):8.4f}"
        )


if __name__ == "__main__":
    main()

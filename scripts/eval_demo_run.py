#!/usr/bin/env python
"""Evaluate trained demo checkpoints: copy-synthesis and full TTS metrics.

Usage:
  python scripts/eval_demo_run.py --metadata data/demo/metadata.csv \
      --acoustic-checkpoint checkpoints/acoustic_demo \
      --vocoder-checkpoint checkpoints/vocoder_demo \
      [--n 4] [--output-dir /tmp/demo_eval]

Reports, per utterance and averaged:
  * copy-synthesis mel-MAE / MCD — ground-truth mel -> HiFi-GAN -> wav ->
    mel round trip (vocoder quality in isolation; length-preserving).
  * full-TTS mel-MAE / MCD — text -> wav with BOTH trained models, compared
    against the ground-truth recording cropped to the shorter mel (predicted
    durations need not match the recording exactly).

This closes the "demonstrated training run" criterion: the reference ships no
trainer at all (reference: .kiro/specs/tts-sam-bert-hifigan/tasks.md:315-402),
so these numbers document that the TPU-native trainers converge end to end.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

import os as _os

if _os.getenv("SAMBERT_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

from sambert_hifigan_tpu.utils.jax_cache import enable as _enable_jax_cache

_enable_jax_cache()  # persistent XLA compile cache (SAMBERT_JAX_CACHE=0 disables)

import jax.numpy as jnp
import numpy as np


def main():
    from sambert_hifigan_tpu.config import default_config
    from sambert_hifigan_tpu.data.audio import load_wav, save_wav
    from sambert_hifigan_tpu.data.dataset import TTSDataset
    from sambert_hifigan_tpu.pipeline import TTSPipeline
    from sambert_hifigan_tpu.training.acoustic_trainer import (
        acoustic_params_from_tree,
    )
    from sambert_hifigan_tpu.training.checkpoint import CheckpointManager
    from sambert_hifigan_tpu.training.vocoder_trainer import (
        generator_params_from_tree,
    )
    from sambert_hifigan_tpu.utils.eval_metrics import (
        f0_metrics_dtw,
        mcd,
        mel_mae,
        mel_mae_dtw,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--metadata", type=str, default="data/demo/metadata.csv")
    p.add_argument("--acoustic-checkpoint", type=str, required=True)
    p.add_argument("--vocoder-checkpoint", type=str, required=True)
    p.add_argument("--acoustic-step", type=int, default=None,
                   help="checkpoint step to restore (default: latest)")
    p.add_argument("--vocoder-step", type=int, default=None,
                   help="checkpoint step to restore (default: latest)")
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--output-dir", type=str, default="/tmp/demo_eval")
    args = p.parse_args()

    cfg = default_config()
    ds = TTSDataset(args.metadata, cfg)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    ac_tree, ac_step = CheckpointManager(
        args.acoustic_checkpoint, cfg.audio
    ).restore_tree(step=args.acoustic_step)
    voc_tree, voc_step = CheckpointManager(
        args.vocoder_checkpoint, cfg.audio
    ).restore_tree(step=args.vocoder_step)
    print(f"checkpoints: acoustic step {ac_step}, vocoder step {voc_step}")
    pipe = TTSPipeline(
        cfg,
        acoustic_params_from_tree(ac_tree),
        generator_params_from_tree(voc_tree),
    )

    copy_mae, copy_mcd, tts_mae, tts_mcd = [], [], [], []
    tts_f0, tts_vf1 = [], []
    for utt in ds.utterances[: args.n]:
        wav_gt, _ = load_wav(ds.root / utt.wav_path)
        wav_gt = wav_gt[0]
        feats = ds.load_features(utt)

        # Copy synthesis: ground-truth mel -> vocoder -> wav.
        wav_copy = np.asarray(pipe.vocode(jnp.asarray(feats["mel"])[None])[0, 0])
        n = min(len(wav_gt), len(wav_copy))
        copy_mae.append(mel_mae(wav_gt[:n], wav_copy[:n], cfg.audio))
        copy_mcd.append(mcd(wav_gt[:n], wav_copy[:n], cfg.audio))
        save_wav(out / f"{Path(utt.wav_path).stem}_copy.wav", wav_copy, cfg.audio.sample_rate)

        # Full TTS from the text.  DTW-aligned mel-MAE: predicted durations
        # need not match the recording frame-for-frame, and a raw frame-wise
        # MAE mostly measures that timing drift.
        wav_tts = pipe.synthesize(utt.text)
        n = min(len(wav_gt), len(wav_tts))
        tts_mae.append(mel_mae_dtw(wav_gt, wav_tts, cfg.audio))
        tts_mcd.append(mcd(wav_gt[:n], wav_tts[:n], cfg.audio))
        f0m = f0_metrics_dtw(wav_gt, wav_tts, cfg.audio)
        tts_f0.append(f0m["f0_rmse_hz"])
        tts_vf1.append(f0m["voicing_f1"])
        save_wav(out / f"{Path(utt.wav_path).stem}_tts.wav", wav_tts, cfg.audio.sample_rate)
        print(
            f"{utt.wav_path}: copy mel-MAE {copy_mae[-1]:.4f} MCD {copy_mcd[-1]:.3f} dB | "
            f"tts dtw-mel-MAE {tts_mae[-1]:.4f} MCD {tts_mcd[-1]:.3f} dB "
            f"F0-RMSE {tts_f0[-1]:.2f} Hz vF1 {tts_vf1[-1]:.3f}"
        )

    print(
        f"AVG over {len(copy_mae)}: copy mel-MAE {np.mean(copy_mae):.4f} "
        f"MCD {np.mean(copy_mcd):.3f} dB | tts dtw-mel-MAE {np.mean(tts_mae):.4f} "
        f"MCD {np.mean(tts_mcd):.3f} dB "
        f"F0-RMSE {np.nanmean(tts_f0):.2f} Hz vF1 {np.mean(tts_vf1):.3f}"
    )
    print(f"wavs in {out}")


if __name__ == "__main__":
    main()

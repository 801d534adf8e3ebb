#!/usr/bin/env python
"""Held-out teacher-forced mel L1 probe.

Runs the acoustic model's TRAINING forward (ground-truth durations,
ground-truth mel feedback, predicted pitch/energy — exactly the conditioning
`acoustic_train_step` uses, minus dropout) on a held-out metadata.csv and
reports the same masked mel L1 the trainer logs as `mel_loss`.  This
isolates generalization of the mel regression from duration-prediction
error: full-TTS metrics need DTW because predicted durations drift; this
probe doesn't.

The v4 report (docs/demo_run_v4/REPORT.md) used this probe to show quality
was data-limited (held-out ~1.0 vs train ~0.2 on a 10-minute corpus); the
v5 run re-measures it on a 2.6-hour corpus.

Usage:
  python scripts/eval_teacher_forced.py --metadata data/demo_v5_eval/metadata.csv \
      --acoustic-checkpoint checkpoints/acoustic_v5 [--params ema|raw] [--n 12]
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

import functools

import jax.numpy as jnp
import numpy as np


def main():
    from sambert_hifigan_tpu.config import default_config
    from sambert_hifigan_tpu.data.dataset import TTSDataset, collate_acoustic
    from sambert_hifigan_tpu.models.acoustic_model import SAMBERTAcousticModel
    from sambert_hifigan_tpu.training.checkpoint import CheckpointManager

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--metadata", type=str, required=True)
    p.add_argument("--acoustic-checkpoint", type=str, required=True)
    p.add_argument("--acoustic-step", type=int, default=None)
    p.add_argument("--params", choices=["ema", "raw"], default="ema",
                   help="EMA weights when the checkpoint has them (default)")
    p.add_argument("--n", type=int, default=12)
    args = p.parse_args()

    cfg = default_config()
    ds = TTSDataset(args.metadata, cfg)
    tree, step = CheckpointManager(
        args.acoustic_checkpoint, cfg.audio
    ).restore_tree(step=args.acoustic_step)
    from sambert_hifigan_tpu.training.acoustic_trainer import (
        acoustic_params_from_tree,
    )

    params = acoustic_params_from_tree(tree, prefer_ema=args.params == "ema")
    which = (
        "ema"
        if args.params == "ema" and tree.get("ema_params") is not None
        else "raw"
    )
    model = SAMBERTAcousticModel(cfg.acoustic_model)

    from sambert_hifigan_tpu.losses.acoustic import mel_l1_loss

    @functools.partial(jax.jit, static_argnums=())
    def tf_mel_l1(params, batch):
        out = model.apply(
            params,
            batch["ph_ids"], batch["tone_ids"], batch["boundary_ids"],
            batch["mel_gt"], batch["dur_gt"],
            batch["pitch_gt"], batch["energy_gt"], batch["phoneme_mask"],
            deterministic=True,
        )
        # the trainer's exact mel term (masked mean over valid frames x mels)
        return mel_l1_loss(
            out.mel_pred.astype(jnp.float32), batch["mel_gt"], out.frame_mask
        )

    vals = []
    for utt in ds.utterances[: args.n]:
        feats = ds.load_features(utt)
        batch = collate_acoustic(
            [feats], cfg.runtime.phoneme_buckets, cfg.runtime.frame_buckets
        )
        v = float(tf_mel_l1(params, batch))
        vals.append(v)
        print(f"{utt.wav_path}: tf mel L1 {v:.4f}")
    print(
        f"[eval_teacher_forced] step {step} ({which} params), n={len(vals)}: "
        f"mean tf mel L1 {np.mean(vals):.4f}"
    )


if __name__ == "__main__":
    main()

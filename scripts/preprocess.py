#!/usr/bin/env python
"""Precompute features (log-mel, F0, energy, durations) for a dataset.

Usage:
  python scripts/preprocess.py --metadata data/train/metadata.csv [--cache-dir DIR]

Features are cached as .npz next to the data (the same cache TTSDataset uses
lazily); running this up front moves extraction off the training critical path.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

# This image force-registers the TPU backend from sitecustomize before
# env vars can apply; SAMBERT_FORCE_CPU=1 reclaims a CPU run.
import os as _os

if _os.getenv("SAMBERT_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

from sambert_hifigan_tpu.utils.jax_cache import enable as _enable_jax_cache

_enable_jax_cache()  # persistent XLA compile cache (SAMBERT_JAX_CACHE=0 disables)


def main():
    from sambert_hifigan_tpu.config import default_config, load_config
    from sambert_hifigan_tpu.data.dataset import TTSDataset

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--metadata", type=str, required=True)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--cache-dir", type=str, default=None)
    p.add_argument("--aligner", choices=["uniform", "ctc"], default="ctc",
                   help="duration targets: 'ctc' trains the corpus CTC "
                        "aligner and Viterbi-aligns every utterance "
                        "(data/aligner.py); 'uniform' keeps the even-split "
                        "bootstrap")
    p.add_argument("--aligner-steps", type=int, default=400)
    args = p.parse_args()

    cfg = load_config(args.config) if args.config else default_config()
    ds = TTSDataset(args.metadata, cfg, cache_dir=args.cache_dir)
    t0 = time.perf_counter()
    for i, utt in enumerate(ds.utterances):
        feats = ds.load_features(utt)
        print(
            f"[{i + 1}/{len(ds)}] {utt.wav_path}: "
            f"{feats['mel'].shape[0]} frames, "
            f"{int(feats['voiced'].sum())} voiced"
        )
    print(f"extracted in {time.perf_counter() - t0:.1f}s; cache at {ds.cache_dir}")
    if args.aligner == "ctc":
        t0 = time.perf_counter()
        losses = ds.compute_alignments(steps=args.aligner_steps)
        print(
            f"aligned {len(ds)} utterances in {time.perf_counter() - t0:.1f}s "
            f"(CTC loss {losses[0]:.3f} -> {losses[-1]:.3f})"
        )


if __name__ == "__main__":
    main()

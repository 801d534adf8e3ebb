#!/usr/bin/env python
"""Copy-synthesize a corpus with one vocoder checkpoint: mel -> wav.

Usage:
  python scripts/copy_synth.py --metadata data/demo_v2_eval/metadata.csv \
      --vocoder-checkpoint checkpoints/vocoder_v2_adv --vocoder-step 5000 \
      --output-dir /tmp/copy_adv5k [--n 12]

Vocoder-in-isolation synthesis (no acoustic model, no AR decode): feeds each
utterance's ground-truth mel through the HiFi-GAN generator.  Pair with
scripts/eval_vocoder_waveform.py to score checkpoints along a training
trajectory cheaply.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

from sambert_hifigan_tpu.utils.jax_cache import enable as _enable_jax_cache

_enable_jax_cache()

import jax.numpy as jnp
import numpy as np


def main():
    from sambert_hifigan_tpu.config import default_config
    from sambert_hifigan_tpu.data.audio import save_wav
    from sambert_hifigan_tpu.data.dataset import TTSDataset
    from sambert_hifigan_tpu.pipeline import TTSPipeline
    from sambert_hifigan_tpu.training.checkpoint import CheckpointManager
    from sambert_hifigan_tpu.training.vocoder_trainer import (
        generator_params_from_tree,
    )

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--metadata", type=str, required=True)
    p.add_argument("--vocoder-checkpoint", type=str, required=True)
    p.add_argument("--vocoder-step", type=int, default=None)
    p.add_argument("--output-dir", type=str, required=True)
    p.add_argument("--n", type=int, default=None)
    p.add_argument("--params", choices=["auto", "raw"], default="auto",
                   help="auto = prefer the checkpoint's EMA parameter copy "
                        "when it carries one; raw = always use the raw "
                        "trained parameters (for EMA-vs-raw A/B evals)")
    args = p.parse_args()

    cfg = default_config()
    ds = TTSDataset(args.metadata, cfg)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    mgr = CheckpointManager(args.vocoder_checkpoint, cfg.audio)
    tree, voc_step = mgr.restore_tree(step=args.vocoder_step)
    prefer_ema = args.params == "auto"
    use_ema = prefer_ema and tree.get("g_ema_params") is not None
    gen_params = generator_params_from_tree(tree, prefer_ema=prefer_ema)
    print(f"vocoder checkpoint step {voc_step} (params: {'ema' if use_ema else 'raw'})")
    # acoustic params unused for vocode(); pass generator params to satisfy
    # the constructor without restoring an acoustic checkpoint
    pipe = TTSPipeline(cfg, None, gen_params)

    utts = ds.utterances[: args.n] if args.n else ds.utterances
    for utt in utts:
        feats = ds.load_features(utt)
        wav = np.asarray(pipe.vocode(jnp.asarray(feats["mel"])[None])[0, 0])
        save_wav(out / f"{Path(utt.wav_path).stem}_copy.wav", wav, cfg.audio.sample_rate)
        print(f"{utt.wav_path} -> {len(wav)} samples")
    print(f"wavs in {out}")


if __name__ == "__main__":
    main()

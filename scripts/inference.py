#!/usr/bin/env python
"""Text -> WAV inference CLI (the reference's unimplemented task 29/30,
reference: .kiro/specs/tts-sam-bert-hifigan/tasks.md:353-377).

Usage:
  python scripts/inference.py --text "你好世界" --output out.wav \
      [--acoustic-checkpoint DIR] [--vocoder-checkpoint DIR] \
      [--duration-scale 1.0] [--pitch-shift 0.0] [--energy-scale 1.0] \
      [--stream] [--chunk-frames 32]

Without checkpoints, runs with random weights (pipeline smoke test).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

# This image force-registers the TPU backend from sitecustomize before
# env vars can apply; SAMBERT_FORCE_CPU=1 reclaims a CPU run (set
# XLA_FLAGS=--xla_force_host_platform_device_count=N for a virtual mesh).
import os as _os

if _os.getenv("SAMBERT_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

from sambert_hifigan_tpu.utils.jax_cache import enable as _enable_jax_cache

_enable_jax_cache()  # persistent XLA compile cache (SAMBERT_JAX_CACHE=0 disables)
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--text", type=str, required=True)
    p.add_argument("--output", type=str, default="outputs/out.wav")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--model-config", type=str, default=None)
    p.add_argument("--acoustic-checkpoint", type=str, default=None)
    p.add_argument("--vocoder-checkpoint", type=str, default=None)
    p.add_argument("--duration-scale", type=float, default=1.0)
    p.add_argument("--pitch-shift", type=float, default=0.0)
    p.add_argument("--energy-scale", type=float, default=1.0)
    p.add_argument("--stream", action="store_true")
    p.add_argument("--chunk-frames", type=int, default=32)
    p.add_argument("--benchmark", action="store_true",
                   help="synthesize twice and report warm (post-compile) RTF")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    from sambert_hifigan_tpu.config import default_config, load_config
    from sambert_hifigan_tpu.data.audio import save_wav
    from sambert_hifigan_tpu.models.acoustic_model import SAMBERTAcousticModel
    from sambert_hifigan_tpu.models.hifigan import HiFiGAN
    from sambert_hifigan_tpu.pipeline import (
        TTSPipeline,
        build_pipeline_from_random_init,
    )
    from sambert_hifigan_tpu.training.acoustic_trainer import (
        acoustic_inference_params,
        acoustic_params_from_tree,
        init_acoustic_state,
    )
    from sambert_hifigan_tpu.training.checkpoint import CheckpointManager
    from sambert_hifigan_tpu.training.vocoder_trainer import (
        generator_inference_params,
        generator_params_from_tree,
        init_vocoder_state,
    )

    args = parse_args()
    cfg = (
        load_config(args.config, args.model_config)
        if args.config
        else default_config()
    )

    if args.acoustic_checkpoint or args.vocoder_checkpoint:
        # Optimizer-agnostic restore (restore_tree): checkpoints trained
        # with any LR-schedule/EMA/accumulation knobs load without
        # reconstructing their optimizer; EMA params are preferred when
        # the checkpoint carries them.
        if args.acoustic_checkpoint:
            tree, step = CheckpointManager(
                args.acoustic_checkpoint, cfg.audio
            ).restore_tree()
            ac_params = acoustic_params_from_tree(tree)
            print(f"[inference] acoustic checkpoint step {step}")
        else:
            ac_model = SAMBERTAcousticModel(cfg.acoustic_model)
            ac_state = init_acoustic_state(ac_model, cfg, jax.random.PRNGKey(args.seed))
            ac_params = acoustic_inference_params(ac_state)
        if args.vocoder_checkpoint:
            tree, step = CheckpointManager(
                args.vocoder_checkpoint, cfg.audio
            ).restore_tree()
            gen_params = generator_params_from_tree(tree)
            print(f"[inference] vocoder checkpoint step {step}")
        else:
            voc_model = HiFiGAN(cfg.vocoder)
            voc_state = init_vocoder_state(voc_model, cfg, jax.random.PRNGKey(args.seed))
            gen_params = generator_inference_params(voc_state)
        pipe = TTSPipeline(cfg, ac_params, gen_params)
    else:
        print("[inference] no checkpoints given - using random weights")
        pipe = build_pipeline_from_random_init(cfg, seed=args.seed)

    controls = dict(
        duration_scale=args.duration_scale,
        pitch_shift=args.pitch_shift,
        energy_scale=args.energy_scale,
    )
    t0 = time.perf_counter()
    if args.stream:
        chunks = []
        for i, chunk in enumerate(pipe.stream(args.text, args.chunk_frames, **controls)):
            chunks.append(chunk)
            print(f"[inference] chunk {i}: {chunk.shape[0]} samples "
                  f"(+{time.perf_counter() - t0:.2f}s)")
        wav = np.concatenate(chunks)
    else:
        wav = pipe.synthesize(args.text, **controls)
    wall = time.perf_counter() - t0
    dur = wav.shape[0] / cfg.audio.sample_rate
    print(f"[inference] {dur:.2f}s audio in {wall:.2f}s (RTF {wall / dur:.3f}, "
          "incl. compile)")
    if args.benchmark and not args.stream:
        t0 = time.perf_counter()
        wav = pipe.synthesize(args.text, **controls)
        warm = time.perf_counter() - t0
        print(f"[inference] warm run: {warm * 1e3:.0f} ms "
              f"(RTF {warm / dur:.4f})")
    save_wav(args.output, wav, cfg.audio.sample_rate)
    print(f"[inference] wrote {args.output}")


if __name__ == "__main__":
    main()

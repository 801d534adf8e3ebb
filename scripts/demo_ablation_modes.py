#!/usr/bin/env python
"""Single GAN training step under each ablation loss mode
(the reference's de-facto trainer demo, reference: demo_ablation_modes.py).

Usage:
  python scripts/demo_ablation_modes.py [--mode mel_only|adv_mel|adv_mel_fm|all]
         [--batch-size 2] [--segment-frames 8]

Runs one jitted train step on synthetic audio and prints the full metrics
dict per mode, demonstrating the per-mode bookkeeping (zero-valued inactive
terms, frozen discriminators in mel_only).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

import os as _os

if _os.getenv("SAMBERT_FORCE_CPU"):  # sitecustomize pre-registers the TPU
    jax.config.update("jax_platforms", "cpu")

from sambert_hifigan_tpu.utils.jax_cache import enable as _enable_jax_cache

_enable_jax_cache()  # persistent XLA compile cache (SAMBERT_JAX_CACHE=0 disables)
import jax.numpy as jnp
import numpy as np


def run_mode(mode: str, batch: int, frames: int, seed: int = 0):
    from sambert_hifigan_tpu.config import TTSConfig
    from sambert_hifigan_tpu.models.hifigan import HiFiGAN
    from sambert_hifigan_tpu.training.vocoder_trainer import (
        init_vocoder_state,
        make_jitted_vocoder_step,
    )

    cfg = TTSConfig()
    model = HiFiGAN(cfg.vocoder)
    print(f"\n=== loss_mode = {mode} ===")
    state = init_vocoder_state(
        model, cfg, jax.random.PRNGKey(seed), mel_frames=frames, batch=1
    )
    step = make_jitted_vocoder_step(model, cfg, loss_mode=mode)
    rng = np.random.default_rng(seed)
    mel = jnp.asarray(rng.standard_normal((batch, 80, frames)), jnp.float32)
    wav = jnp.asarray(
        rng.standard_normal((batch, 1, frames * cfg.audio.hop_length)) * 0.1,
        jnp.float32,
    )
    d_before = jax.tree.leaves(state.d_params)[0].copy()
    state, metrics = step(state, mel, wav)
    host = {k: float(v) for k, v in sorted(metrics.items())}
    for k, v in host.items():
        print(f"  {k}: {v:.6f}")
    d_after = jax.tree.leaves(state.d_params)[0]
    d_trained = not bool(jnp.array_equal(d_before, d_after))
    print(f"  discriminators trained: {d_trained}")
    return host


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="all",
                   choices=["mel_only", "adv_mel", "adv_mel_fm", "all"])
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--segment-frames", type=int, default=8)
    args = p.parse_args()
    modes = (
        ["mel_only", "adv_mel", "adv_mel_fm"] if args.mode == "all" else [args.mode]
    )
    for mode in modes:
        run_mode(mode, args.batch_size, args.segment_frames)


if __name__ == "__main__":
    main()

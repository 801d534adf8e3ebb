#!/usr/bin/env python
"""Convert a reference-format PyTorch checkpoint into this framework's
checkpoint layout (migration path for users of the reference repo).

The reference never implemented checkpointing (SURVEY.md section 5.4), so
"reference format" means a torch `state_dict()` of its model classes
(reference: models/acoustic_model.py:24-313, models/hifigan.py:618-800),
optionally nested under a 'state_dict'/'model'/'generator' key as torch
training scripts commonly save them.

Usage:
  python scripts/convert_torch_checkpoint.py --model acoustic \
      --input sambert.pt --output checkpoints/acoustic
  python scripts/convert_torch_checkpoint.py --model hifigan \
      --input hifigan.pt --output checkpoints/vocoder
  python scripts/convert_torch_checkpoint.py --model generator \
      --input generator_only.pt --output checkpoints/vocoder

The output directory is a CheckpointManager checkpoint at step 0 (fresh
optimizer state around the transplanted params), directly loadable by
scripts/inference.py --acoustic-checkpoint/--vocoder-checkpoint and the
trainers' --resume.
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


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", choices=["acoustic", "hifigan", "generator"],
                   required=True)
    p.add_argument("--input", type=str, required=True,
                   help="torch checkpoint (.pt/.pth) with a reference-format "
                        "state_dict")
    p.add_argument("--output", type=str, required=True,
                   help="output checkpoint directory")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--model-config", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def load_state_dict(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict):
        for key in ("state_dict", "model", "generator"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    from sambert_hifigan_tpu.interop import state_dict_to_numpy

    return state_dict_to_numpy(obj)


def main():
    from sambert_hifigan_tpu import interop
    from sambert_hifigan_tpu.config import default_config, load_config
    from sambert_hifigan_tpu.models.acoustic_model import SAMBERTAcousticModel
    from sambert_hifigan_tpu.models.hifigan import HiFiGAN
    from sambert_hifigan_tpu.training.acoustic_trainer import init_acoustic_state
    from sambert_hifigan_tpu.training.checkpoint import CheckpointManager
    from sambert_hifigan_tpu.training.vocoder_trainer import init_vocoder_state

    args = parse_args()
    cfg = (
        load_config(args.config, args.model_config)
        if args.config
        else default_config()
    )
    sd = load_state_dict(args.input)
    rng = jax.random.PRNGKey(args.seed)

    probe = {"acoustic": "phoneme_embedding.ph_emb.weight",
             "hifigan": "generator.conv_pre.weight",
             "generator": "conv_pre.weight"}[args.model]
    if probe not in sd:
        sample = sorted(sd)[:5]
        sys.exit(
            f"error: checkpoint does not look like a reference-format "
            f"'{args.model}' state_dict (missing key {probe!r}; found keys "
            f"like {sample}). Pass the matching --model."
        )

    if args.model == "acoustic":
        model = SAMBERTAcousticModel(cfg.acoustic_model)
        state = init_acoustic_state(model, cfg, rng)
        params = {
            "params": interop.acoustic_params_from_torch(
                sd,
                n_encoder_layers=cfg.acoustic_model.encoder.n_layers,
                n_decoder_layers=cfg.acoustic_model.decoder.n_layers,
            )
        }
        params = jax.tree.map(lambda ref, new: new.astype(ref.dtype),
                              state.params, params)
        state = state.replace(params=params)
    else:
        model = HiFiGAN(cfg.vocoder)
        state = init_vocoder_state(model, cfg, rng)
        if args.model == "hifigan":
            g = {"params": {"generator": interop.generator_params_from_torch(
                sd, "generator.")}}
            d = {"params": {
                "msd": interop.msd_params_from_torch(sd, "msd."),
                "mpd": interop.mpd_params_from_torch(
                    sd, "mpd.",
                    periods=cfg.vocoder.discriminator.mpd_periods),
            }}
            g = jax.tree.map(lambda ref, new: new.astype(ref.dtype),
                             state.g_params, g)
            d = jax.tree.map(lambda ref, new: new.astype(ref.dtype),
                             state.d_params, d)
            state = state.replace(g_params=g, d_params=d)
        else:  # bare generator state_dict; discriminators stay random-init
            g = {"params": {"generator": interop.generator_params_from_torch(sd)}}
            g = jax.tree.map(lambda ref, new: new.astype(ref.dtype),
                             state.g_params, g)
            state = state.replace(g_params=g)

    manager = CheckpointManager(args.output, cfg.audio)
    manager.save(0, state)
    n = sum(x.size for x in jax.tree.leaves(state.params
            if args.model == "acoustic" else state.g_params))
    print(f"[convert] wrote {args.model} checkpoint (step 0, {n:,} generator/"
          f"model params) to {args.output}")


if __name__ == "__main__":
    main()

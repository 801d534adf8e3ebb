#!/usr/bin/env python
"""Train the HiFi-GAN vocoder (the reference's unimplemented task 24,
reference: .kiro/specs/tts-sam-bert-hifigan/tasks.md:315-322).

Usage:
  python scripts/train_vocoder.py --metadata data/train/metadata.csv \
      [--loss-mode adv_mel_fm] [--steps 100000] [--batch-size 16] \
      [--segment-frames 32] [--checkpoint-dir checkpoints/vocoder] [--resume]
  python scripts/train_vocoder.py --synthetic 20        # smoke run, no data

Data-parallel over all visible devices; checkpoints carry the mel fingerprint.
"""

from __future__ import annotations

import argparse
import itertools
import sys
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
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--metadata", type=str, default=None)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--model-config", type=str, default=None)
    p.add_argument("--loss-mode", type=str, default=None,
                   choices=["mel_only", "adv_mel", "adv_mel_fm"])
    p.add_argument("--steps", type=int, default=100000)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--segment-frames", type=int, default=32)
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--log-dir", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="size of the 'model' mesh axis (shape-rule tensor "
                        "parallelism; devices/model must divide evenly)")
    p.add_argument("--d-lr", type=float, default=None,
                   help="discriminator learning rate override (GAN hygiene)")
    p.add_argument("--d-update-every", type=int, default=None,
                   help="update D every k-th step (GAN hygiene; default 1)")
    p.add_argument("--lr-schedule", type=str, default=None,
                   choices=["constant", "exponential", "warmup_cosine"],
                   help="learning-rate schedule for BOTH sides "
                        "(training/optim.py; exponential = the official "
                        "HiFi-GAN recipe)")
    p.add_argument("--lr-decay-gamma", type=float, default=None,
                   help="exponential schedule: multiply lr by this every "
                        "--lr-decay-steps steps (default 0.999)")
    p.add_argument("--warmup-steps", type=int, default=None,
                   help="linear LR warmup steps (any schedule)")
    p.add_argument("--lr-total-steps", type=int, default=None,
                   help="warmup_cosine: step count at which the cosine "
                        "reaches its floor (set this to --steps for a "
                        "full-run decay; default 200000)")
    p.add_argument("--lr-decay-steps", type=int, default=None,
                   help="exponential schedule: decay interval in steps "
                        "(HiFi-GAN decays per epoch; default 1000)")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="EMA decay for the generator parameters (0 = off; "
                        "inference/eval prefer the EMA copy when present)")
    p.add_argument("--accumulate-steps", type=int, default=None,
                   help="average k micro-batch gradients into one optimizer "
                        "update (effective batch k x batch-size)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="run N steps on synthetic data (smoke test)")
    p.add_argument("--prefetch", choices=["auto", "on", "off"], default="auto",
                   help="background batch prefetch thread; 'auto' (default) "
                        "enables it only on multi-core hosts (measured: the "
                        "serial loop wins on 1 core; docs/performance.md)")
    p.add_argument("--no-prefetch", dest="prefetch", action="store_const",
                   const="off", help="alias for --prefetch off")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tensorboard", action="store_true",
                   help="mirror scalars into TensorBoard event files")
    p.add_argument("--save-precision", choices=["f32", "bf16"], default="f32",
                   help="bf16 downcasts discriminator params + both optimizer "
                        "states on save (~half the ~900 MB GAN checkpoint); "
                        "generator/EMA masters stay f32 "
                        "(training/checkpoint.py)")
    p.add_argument("--sync-save", action="store_true",
                   help="block training during checkpoint writes (default: "
                        "interval saves snapshot on-device and write on a "
                        "background thread, so the multi-minute tunnel fetch "
                        "overlaps training)")
    return p.parse_args()


def synthetic_pairs(batch, frames, hop, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        mel = rng.standard_normal((batch, 80, frames)).astype(np.float32)
        wav = (rng.standard_normal((batch, 1, frames * hop)) * 0.1).astype(np.float32)
        yield mel, wav


def main():
    from sambert_hifigan_tpu.config import load_config, default_config
    from sambert_hifigan_tpu.data.dataset import (
        TTSDataset,
        vocoder_batches_from_dataset,
    )
    from sambert_hifigan_tpu.data.prefetch import Prefetcher, want_prefetch
    from sambert_hifigan_tpu.models.hifigan import HiFiGAN
    from sambert_hifigan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from sambert_hifigan_tpu.training.checkpoint import CheckpointManager
    from sambert_hifigan_tpu.training.signals import (
        GracefulShutdown,
        TrainingDiverged,
        check_finite_metrics,
    )
    from sambert_hifigan_tpu.training.metrics import MetricsWriter
    from sambert_hifigan_tpu.training.vocoder_trainer import (
        init_vocoder_state,
        make_jitted_vocoder_step,
    )

    args = parse_args()
    cfg = (
        load_config(args.config, args.model_config)
        if args.config
        else default_config()
    )
    loss_mode = args.loss_mode or cfg.vocoder.loss_mode
    import dataclasses as _dc

    voc_tr = cfg.training.vocoder
    for field, val in (
        ("learning_rate_discriminator", args.d_lr),
        ("d_update_every", args.d_update_every),
        ("lr_schedule", args.lr_schedule),
        ("lr_decay_gamma", args.lr_decay_gamma),
        ("lr_decay_steps", args.lr_decay_steps),
        ("warmup_steps", args.warmup_steps),
        ("lr_total_steps", args.lr_total_steps),
        ("ema_decay", args.ema_decay),
        ("accumulate_steps", args.accumulate_steps),
    ):
        if val is not None:
            voc_tr = _dc.replace(voc_tr, **{field: val})
    if voc_tr is not cfg.training.vocoder:
        cfg = _dc.replace(
            cfg, training=_dc.replace(cfg.training, vocoder=voc_tr)
        )
    batch_size = args.batch_size or cfg.training.vocoder.batch_size
    hop = cfg.audio.hop_length

    mesh = create_mesh(model=args.model_parallel)
    n_dev = int(mesh.shape["data"])
    if batch_size % n_dev:
        batch_size = max(n_dev, batch_size - batch_size % n_dev)
        print(f"[train_vocoder] batch rounded to {batch_size} for {n_dev} devices")

    model = HiFiGAN(cfg.vocoder)
    state = init_vocoder_state(
        model, cfg, jax.random.PRNGKey(args.seed), mel_frames=args.segment_frames
    )
    ckpt_dir = args.checkpoint_dir or f"{cfg.paths.checkpoint_dir}/vocoder"
    ckpt = CheckpointManager(ckpt_dir, cfg.audio)
    start_step = 0
    if args.resume and ckpt.latest_step() is not None:
        state, start_step = ckpt.restore(state)
        print(f"[train_vocoder] resumed from step {start_step}")
    if args.model_parallel > 1:
        from sambert_hifigan_tpu.parallel.sharding_rules import shard_tree

        state = shard_tree(state, mesh)
        step_fn = make_jitted_vocoder_step(model, cfg, loss_mode=loss_mode)
    else:
        state = replicate(state, mesh)
        step_fn = make_jitted_vocoder_step(model, cfg, mesh=mesh, loss_mode=loss_mode)

    if args.synthetic:
        batches = synthetic_pairs(batch_size, args.segment_frames, hop, args.seed)
        total_steps = args.synthetic
    else:
        if not args.metadata:
            raise SystemExit("--metadata or --synthetic required")
        ds = TTSDataset(args.metadata, cfg)
        def epochs():
            for epoch in itertools.count():
                yield from vocoder_batches_from_dataset(
                    ds, batch_size, args.segment_frames, seed=args.seed + epoch
                )
        batches = epochs()
        total_steps = args.steps

    writer = MetricsWriter(
        args.log_dir or cfg.paths.log_dir, "vocoder", tensorboard=args.tensorboard
    )
    log_interval = cfg.training.vocoder.log_interval
    save_interval = cfg.training.vocoder.save_interval
    # Collate + host->device transfer, optionally on a background thread
    # (data/prefetch.py:want_prefetch documents the 1-core measurement that
    # makes the serial loop the default here; the step dispatches async).
    put = lambda b: shard_batch((jnp.asarray(b[0]), jnp.asarray(b[1])), mesh)  # noqa: E731
    if want_prefetch(args.prefetch):
        batches = Prefetcher(batches, transfer=put)
    else:
        batches = map(put, batches)
    # SIGTERM/SIGINT (pod preemption, Ctrl-C) -> finish the step, save,
    # exit resumable; non-finite logged metrics -> emergency save + abort
    # (training/signals.py — the reference has no failure handling at all).
    shutdown = GracefulShutdown()
    last_step = start_step
    try:
        for i in range(start_step, total_steps):
            if shutdown.requested:
                break
            mel, wav = next(batches)
            state, metrics = step_fn(state, mel, wav)
            last_step = i + 1
            if (i + 1) % log_interval == 0 or i == start_step:
                host = writer.write(i + 1, metrics)
                check_finite_metrics(host, i + 1)
                print(writer.summary_line(i + 1, host,
                                          ["gen_loss", "gen_mel_loss", "disc_loss"]))
            if (i + 1) % save_interval == 0:
                ckpt.save(i + 1, state, precision=args.save_precision,
                          background=not args.sync_save)
    except TrainingDiverged as e:
        err = ckpt.drain()  # a failed interval save must not mask divergence
        if err:
            print(f"[train_vocoder] warning: background save failed earlier: {err}")
        if ckpt.latest_step() != last_step:
            ckpt.save(last_step, state, precision=args.save_precision)
        writer.close()
        raise SystemExit(
            f"[train_vocoder] DIVERGED: {e}; state saved at step {last_step} "
            f"in {ckpt_dir} for forensics"
        )
    finally:
        if isinstance(batches, Prefetcher):
            batches.close()
    err = ckpt.drain()
    if err:
        print(f"[train_vocoder] warning: background save failed earlier: {err}")
    if shutdown.requested:
        if ckpt.latest_step() != last_step:
            ckpt.save(last_step, state, precision=args.save_precision)
        writer.close()
        print(f"[train_vocoder] interrupted at step {last_step}; "
              f"resumable checkpoint in {ckpt_dir} (--resume)")
        return
    if ckpt.latest_step() != total_steps:  # interval save may already cover it
        ckpt.save(total_steps, state, precision=args.save_precision)
    writer.close()  # flush buffered TensorBoard events (the tail of the run)
    print(f"[train_vocoder] done at step {total_steps}; checkpoints in {ckpt_dir}")


if __name__ == "__main__":
    main()

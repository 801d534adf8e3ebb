#!/usr/bin/env python
"""Train the SAM-BERT acoustic model (the reference's unimplemented task 25,
reference: .kiro/specs/tts-sam-bert-hifigan/tasks.md:324-331).

Usage:
  python scripts/train_acoustic.py --metadata data/train/metadata.csv \
      [--steps 200000] [--batch-size 16] [--checkpoint-dir checkpoints/acoustic] [--resume]
  python scripts/train_acoustic.py --synthetic 20       # smoke run, no data
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
    p.add_argument("--steps", type=int, default=200000)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--log-dir", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="size of the 'model' mesh axis (shape-rule tensor "
                        "parallelism; devices/model must divide evenly)")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--prefetch", choices=["auto", "on", "off"], default="auto",
                   help="background batch prefetch thread; 'auto' (default) "
                        "enables it only on multi-core hosts — measured on a "
                        "1-core host the serial loop is FASTER (JAX async "
                        "dispatch already overlaps host work; a second thread "
                        "just contends for the core; docs/performance.md)")
    p.add_argument("--no-prefetch", dest="prefetch", action="store_const",
                   const="off", help="alias for --prefetch off")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-precision", choices=["f32", "bf16"], default="f32",
                   help="bf16 downcasts the optimizer state on save "
                        "(master params/EMA stay f32; training/checkpoint.py)")
    p.add_argument("--sync-save", action="store_true",
                   help="block training during checkpoint writes (default: "
                        "interval saves snapshot on-device and write on a "
                        "background thread)")
    p.add_argument("--tensorboard", action="store_true",
                   help="mirror scalars into TensorBoard event files")
    p.add_argument("--scheduled-sampling", type=float, default=None,
                   help="per-frame probability of feeding the decoder its own "
                        "pass-1 prediction instead of ground truth (two-pass "
                        "scheduled sampling; default 0 = pure teacher forcing)")
    p.add_argument("--lr-schedule", type=str, default=None,
                   choices=["constant", "exponential", "warmup_cosine"],
                   help="learning-rate schedule (training/optim.py)")
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
                        "(default 1000)")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="EMA decay for the model parameters (0 = off; "
                        "inference/eval prefer the EMA copy when present)")
    p.add_argument("--accumulate-steps", type=int, default=None,
                   help="average k micro-batch gradients into one optimizer "
                        "update (effective batch k x batch-size)")
    return p.parse_args()


def stage_overrides(tr, args):
    """Apply the shared optimizer-knob CLI overrides to a TrainStageConfig."""
    import dataclasses as _dc

    for field, val in (
        ("lr_schedule", args.lr_schedule),
        ("lr_decay_gamma", args.lr_decay_gamma),
        ("lr_decay_steps", args.lr_decay_steps),
        ("warmup_steps", args.warmup_steps),
        ("lr_total_steps", args.lr_total_steps),
        ("ema_decay", args.ema_decay),
        ("accumulate_steps", args.accumulate_steps),
    ):
        if val is not None:
            tr = _dc.replace(tr, **{field: val})
    return tr


def main():
    from sambert_hifigan_tpu.config import load_config, default_config
    from sambert_hifigan_tpu.data.dataset import TTSDataset, synthetic_batch
    from sambert_hifigan_tpu.data.prefetch import Prefetcher, want_prefetch
    from sambert_hifigan_tpu.models.acoustic_model import SAMBERTAcousticModel
    from sambert_hifigan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from sambert_hifigan_tpu.training.acoustic_trainer import (
        init_acoustic_state,
        make_jitted_acoustic_step,
    )
    from sambert_hifigan_tpu.training.checkpoint import CheckpointManager
    from sambert_hifigan_tpu.training.metrics import MetricsWriter
    from sambert_hifigan_tpu.training.signals import (
        GracefulShutdown,
        TrainingDiverged,
        check_finite_metrics,
    )

    args = parse_args()
    cfg = (
        load_config(args.config, args.model_config)
        if args.config
        else default_config()
    )
    import dataclasses as _dc

    ac_tr = stage_overrides(cfg.training.acoustic, args)
    if args.scheduled_sampling is not None:
        ac_tr = _dc.replace(ac_tr, scheduled_sampling=args.scheduled_sampling)
    if ac_tr is not cfg.training.acoustic:
        cfg = _dc.replace(cfg, training=_dc.replace(cfg.training, acoustic=ac_tr))
    batch_size = args.batch_size or cfg.training.acoustic.batch_size
    mesh = create_mesh(model=args.model_parallel)
    n_dev = int(mesh.shape["data"])
    if batch_size % n_dev:
        batch_size = max(n_dev, batch_size - batch_size % n_dev)
        print(f"[train_acoustic] batch rounded to {batch_size} for {n_dev} devices")

    model = SAMBERTAcousticModel(cfg.acoustic_model)
    state = init_acoustic_state(model, cfg, jax.random.PRNGKey(args.seed))
    ckpt_dir = args.checkpoint_dir or f"{cfg.paths.checkpoint_dir}/acoustic"
    ckpt = CheckpointManager(ckpt_dir, cfg.audio)
    start_step = 0
    if args.resume and ckpt.latest_step() is not None:
        state, start_step = ckpt.restore(state)
        print(f"[train_acoustic] resumed from step {start_step}")
    if args.model_parallel > 1:
        from sambert_hifigan_tpu.parallel.sharding_rules import shard_tree

        state = shard_tree(state, mesh)
        step_fn = make_jitted_acoustic_step(model, cfg)  # shardings inferred
    else:
        state = replicate(state, mesh)
        step_fn = make_jitted_acoustic_step(model, cfg, mesh=mesh)

    if args.synthetic:
        def gen():
            for i in itertools.count():
                yield synthetic_batch(cfg, batch_size, tph=16, tfrm=64, seed=args.seed + i)
        batches = gen()
        total_steps = args.synthetic
    else:
        if not args.metadata:
            raise SystemExit("--metadata or --synthetic required")
        ds = TTSDataset(args.metadata, cfg)
        def epochs():
            for epoch in itertools.count():
                yield from ds.batches(batch_size, seed=args.seed + epoch)
        batches = epochs()
        total_steps = args.steps

    writer = MetricsWriter(
        args.log_dir or cfg.paths.log_dir, "acoustic", tensorboard=args.tensorboard
    )
    rng = jax.random.PRNGKey(args.seed + 1)
    log_interval = cfg.training.acoustic.log_interval
    save_interval = cfg.training.acoustic.save_interval
    # Collate + host->device transfer, optionally on a background thread
    # (data/prefetch.py:want_prefetch documents the 1-core measurement that
    # makes the serial loop the default here; the step dispatches async).
    put = lambda b: shard_batch(  # noqa: E731
        {k: jnp.asarray(v) for k, v in b.items() if k != "frame_lengths"}, mesh
    )
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
            batch = next(batches)
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub)
            last_step = i + 1
            if (i + 1) % log_interval == 0 or i == start_step:
                host = writer.write(i + 1, metrics)
                check_finite_metrics(host, i + 1)
                print(writer.summary_line(i + 1, host,
                                          ["total_loss", "mel_loss", "dur_loss"]))
            if (i + 1) % save_interval == 0:
                ckpt.save(i + 1, state, precision=args.save_precision,
                          background=not args.sync_save)
    except TrainingDiverged as e:
        err = ckpt.drain()  # a failed interval save must not mask divergence
        if err:
            print(f"[train_acoustic] warning: background save failed earlier: {err}")
        if ckpt.latest_step() != last_step:
            ckpt.save(last_step, state, precision=args.save_precision)
        writer.close()
        raise SystemExit(
            f"[train_acoustic] DIVERGED: {e}; state saved at step {last_step} "
            f"in {ckpt_dir} for forensics"
        )
    finally:
        if isinstance(batches, Prefetcher):
            batches.close()
    err = ckpt.drain()
    if err:
        print(f"[train_acoustic] warning: background save failed earlier: {err}")
    if shutdown.requested:
        if ckpt.latest_step() != last_step:
            ckpt.save(last_step, state, precision=args.save_precision)
        writer.close()
        print(f"[train_acoustic] interrupted at step {last_step}; "
              f"resumable checkpoint in {ckpt_dir} (--resume)")
        return
    if ckpt.latest_step() != total_steps:  # interval save may already cover it
        ckpt.save(total_steps, state, precision=args.save_precision)
    writer.close()  # flush buffered TensorBoard events (the tail of the run)
    print(f"[train_acoustic] done at step {total_steps}; checkpoints in {ckpt_dir}")


if __name__ == "__main__":
    main()

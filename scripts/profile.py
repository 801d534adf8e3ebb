#!/usr/bin/env python
"""Capture a device profile (XPlane trace) of any hot surface.

The reference's only introspection is print-based shape logging
(reference: models/frontend.py:17, docs via SURVEY 5.1); on TPU the
equivalent observability tool is a real profiler trace: per-op device
timelines, HLO names, memory transfers — viewable in TensorBoard's
profile plugin or Perfetto (xplane.pb inside the output dir).

Surfaces:
  e2e        text -> wav synthesize (default)
  decode     acoustic text -> mel (AR decode path)
  vocoder    mel -> wav generator
  train-acoustic / train-vocoder   one jitted train step (synthetic batch)

Usage:
  python scripts/profile.py --surface e2e --output /tmp/profile
  python scripts/profile.py --surface train-vocoder --reps 3
  tensorboard --logdir /tmp/profile   # then the Profile tab

Each surface is compiled and warmed BEFORE the trace starts, so the
capture shows steady-state device execution, not compilation.
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

_enable_jax_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--surface",
        choices=["e2e", "decode", "vocoder", "train-acoustic", "train-vocoder"],
        default="e2e",
    )
    p.add_argument("--output", type=str, default="outputs/profile")
    p.add_argument("--reps", type=int, default=5,
                   help="iterations captured inside the trace")
    p.add_argument("--text", type=str, default="今天天气真好我们一起去公园散步吧")
    p.add_argument("--max-frames", type=int, default=512)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true",
                   help="shrink model configs (CI smoke: exercises the "
                        "capture path without full-size compiles)")
    p.add_argument("--perfetto", action="store_true",
                   help="also write a Perfetto trace.json.gz (machine-"
                        "parseable op timeline, loadable at ui.perfetto.dev)")
    p.add_argument("--top-ops", type=int, default=0, metavar="N",
                   help="with --perfetto: print the N device ops with the "
                        "largest total duration (quick hotspot listing "
                        "without leaving the terminal)")
    return p.parse_args()


def build_surface(args):
    """Returns (fn, sync) where fn() dispatches one iteration and
    sync(out) blocks on its result."""
    from sambert_hifigan_tpu.config import TTSConfig

    cfg = TTSConfig()
    if args.tiny:
        import dataclasses as _dc

        from sambert_hifigan_tpu.config import (
            AcousticModelConfig,
            DecoderConfig,
            DiscriminatorConfig,
            EncoderConfig,
            GeneratorConfig,
            VocoderConfig,
        )

        cfg = _dc.replace(
            cfg,
            acoustic_model=AcousticModelConfig(
                d_model=32,
                encoder=EncoderConfig(n_layers=1, n_heads=4, d_ff=64),
                decoder=DecoderConfig(n_layers=1, n_heads=4, d_ff=64, max_len=128),
            ),
            vocoder=VocoderConfig(
                generator=GeneratorConfig(
                    upsample_initial_channel=32,
                    resblock_kernel_sizes=(3,),
                    resblock_dilation_sizes=((1, 3),),
                ),
                discriminator=DiscriminatorConfig(channel_div=16),
            ),
        )

    if args.surface in ("e2e", "decode", "vocoder"):
        from sambert_hifigan_tpu.pipeline import build_pipeline_from_random_init

        pipe = build_pipeline_from_random_init(
            cfg, seed=args.seed, dtype=jnp.bfloat16
        )
        if args.surface == "e2e":
            fn = lambda: pipe.vocode(  # noqa: E731
                pipe.text_to_mel([args.text], max_frames=args.max_frames).mel_pred
            )
        elif args.surface == "decode":
            fn = lambda: pipe.text_to_mel(  # noqa: E731
                [args.text], max_frames=args.max_frames
            ).mel_pred
        else:
            mel = pipe.text_to_mel([args.text], max_frames=args.max_frames).mel_pred
            fn = lambda: pipe.vocode(mel)  # noqa: E731
        return fn, lambda out: float(jnp.sum(out.astype(jnp.float32)))

    if args.surface == "train-acoustic":
        from sambert_hifigan_tpu.data.dataset import synthetic_batch
        from sambert_hifigan_tpu.models.acoustic_model import SAMBERTAcousticModel
        from sambert_hifigan_tpu.training.acoustic_trainer import (
            init_acoustic_state,
            make_jitted_acoustic_step,
        )

        model = SAMBERTAcousticModel(cfg.acoustic_model)
        state = init_acoustic_state(
            model, cfg, jax.random.PRNGKey(args.seed), tph=48, max_frames=384,
            batch=1,
        )
        batch = {
            k: jnp.asarray(v)
            for k, v in synthetic_batch(cfg, args.batch, 48, 384).items()
        }
        step = make_jitted_acoustic_step(model, cfg)
        holder = {"state": state}

        def fn():
            holder["state"], m = step(holder["state"], batch, jax.random.PRNGKey(1))
            return m

        return fn, lambda m: float(list(m.values())[0])

    # train-vocoder
    from sambert_hifigan_tpu.models.hifigan import HiFiGAN
    from sambert_hifigan_tpu.training.vocoder_trainer import (
        init_vocoder_state,
        make_jitted_vocoder_step,
    )

    model = HiFiGAN(cfg.vocoder)
    state = init_vocoder_state(
        model, cfg, jax.random.PRNGKey(args.seed), mel_frames=32, batch=1
    )
    rng = np.random.default_rng(args.seed)
    mel = jnp.asarray(
        rng.standard_normal((args.batch, cfg.audio.n_mels, 32)), jnp.float32
    )
    wav = jnp.asarray(
        rng.standard_normal((args.batch, 1, 32 * cfg.audio.hop_length)) * 0.1,
        jnp.float32,
    )
    step = make_jitted_vocoder_step(model, cfg, loss_mode="adv_mel_fm")
    holder = {"state": state}

    def fn():
        holder["state"], m = step(holder["state"], mel, wav)
        return m

    return fn, lambda m: float(list(m.values())[0])


def main():
    args = parse_args()
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    print(f"devices: {jax.devices()}", file=sys.stderr)
    fn, sync = build_surface(args)

    # compile + warm OUTSIDE the trace
    sync(fn())
    sync(fn())

    jax.profiler.start_trace(str(out_dir), create_perfetto_trace=args.perfetto)
    try:
        out = None
        for _ in range(args.reps):
            out = fn()
        sync(out)
    finally:
        jax.profiler.stop_trace()

    produced = sorted(
        str(p.relative_to(out_dir))
        for pat in ("*.pb", "*.json.gz")
        for p in out_dir.rglob(pat)
    )
    print(f"trace written to {out_dir} ({args.reps} reps of {args.surface})")
    for name in produced[:6]:
        print(f"  {name}")
    print("view: tensorboard --logdir", out_dir)
    if args.top_ops:
        print_top_ops(out_dir, args.top_ops)


def print_top_ops(out_dir: Path, n: int):
    """Aggregate the Perfetto trace's complete events by name and print the
    top-N by total duration — enough to rank hotspots without a UI."""
    import gzip
    import json
    from collections import defaultdict

    traces = sorted(out_dir.rglob("*.json.gz"))
    if not traces:
        print("no perfetto trace found (pass --perfetto)", file=sys.stderr)
        return
    with gzip.open(traces[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    total = defaultdict(float)
    count = defaultdict(int)
    for ev in events:
        if ev.get("ph") == "X" and "dur" in ev:
            total[ev["name"]] += ev["dur"]
            count[ev["name"]] += 1
    ranked = sorted(total.items(), key=lambda kv: -kv[1])[:n]
    width = max((len(k) for k, _ in ranked), default=10)
    print(f"\ntop {len(ranked)} ops by total device time:")
    for name, us in ranked:
        print(f"  {name:<{width}}  {us / 1e3:9.3f} ms  x{count[name]}")


if __name__ == "__main__":
    main()

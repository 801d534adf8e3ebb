"""Acoustic train-step MFU vs model width — the measurement behind the TP story.

docs/performance.md explains the reference-size acoustic step's 9% MFU as a
width problem: at d_model = 256 the core matmuls ([B*T, 256] @ [256, 256-1024])
fill 2 sublane tiles of the 256x256 MXU and the step drowns in per-op pipeline
latency.  docs/architecture.md's tensor-parallel section claims the SAME train
step code reaches MXU-friendly efficiency as d_model grows toward the sizes
where the 'model' mesh axis starts to matter.  This script turns both claims
into numbers: it runs the UNMODIFIED jitted acoustic train step (bf16 recipe,
B=16, Tph=48, Tfrm=384 — bench.py's reference-shape surface) at d_model
256 / 512 / 1024 and reports steps/s + MFU from XLA's own FLOP count.

The reference has no analogue (no trainer at all: its tasks.md:315-402 is
unchecked); this is a TPU-design validation surface, not a parity one.

Usage (real chip):  python scripts/bench_scaling.py [--dims 256,512,1024]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from sambert_hifigan_tpu.utils.jax_cache import enable as _enable_jax_cache

_enable_jax_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def scaled_cfg(d_model: int):
    """Reference config with the transformer width scaled; depth, heads-per-64
    channels, and the 4x FFN ratio follow the usual transformer scaling so the
    MXU sees progressively fuller tiles (head_dim stays 64 for d >= 512)."""
    from sambert_hifigan_tpu.config import TTSConfig

    base = TTSConfig()
    am = base.acoustic_model
    if d_model == am.d_model:
        return base  # exact reference shapes for the 256 row
    heads = max(4, d_model // 64)
    am = dataclasses.replace(
        am,
        d_model=d_model,
        encoder=dataclasses.replace(
            am.encoder, n_heads=heads, d_ff=4 * d_model
        ),
        decoder=dataclasses.replace(
            am.decoder, n_heads=heads, d_ff=4 * d_model
        ),
    )
    return dataclasses.replace(base, acoustic_model=am)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="256,512,1024")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--batches", default=None,
                    help="comma list of batch sizes to sweep at FIXED width "
                         "(e.g. --dims 256 --batches 16,32,64,128): the "
                         "occupancy lever at reference width — if the step "
                         "is latency-bound at B=16, wider batches buy nearly "
                         "free utterances/s (VERDICT r03 item 2)")
    ap.add_argument("--tph", type=int, default=48)
    ap.add_argument("--tfrm", type=int, default=384)
    args = ap.parse_args()

    from bench import compiled_flops, measure_rtt, measure_step_rate, peak_flops
    from sambert_hifigan_tpu.data.dataset import synthetic_batch
    from sambert_hifigan_tpu.models.acoustic_model import SAMBERTAcousticModel
    from sambert_hifigan_tpu.training.acoustic_trainer import (
        init_acoustic_state,
        make_jitted_acoustic_step,
    )

    log(f"devices: {jax.devices()}")
    rtt = measure_rtt()
    peak = peak_flops()
    log(f"host<->device rtt: {rtt * 1e3:.1f} ms")

    batches = (
        [int(x) for x in args.batches.split(",")]
        if args.batches
        else [args.batch]
    )
    rows = []
    for d in (int(x) for x in args.dims.split(",")):
        cfg = scaled_cfg(d)
        model = SAMBERTAcousticModel(cfg.acoustic_model)
        state0 = init_acoustic_state(
            model, cfg, jax.random.PRNGKey(0),
            tph=args.tph, max_frames=args.tfrm, batch=1,
        )
        n_params = sum(x.size for x in jax.tree.leaves(state0.params))
        step = make_jitted_acoustic_step(model, cfg)
        for b in batches:
            state = jax.tree.map(jnp.array, state0)
            batch = {
                k: jnp.asarray(v)
                for k, v in synthetic_batch(cfg, b, args.tph, args.tfrm).items()
            }
            flops = compiled_flops(step, state, batch, jax.random.PRNGKey(1))

            t0 = time.perf_counter()
            best = measure_step_rate(
                step, state, (batch, jax.random.PRNGKey(1)), rtt
            )
            log(f"d={d} B={b}: measured in {time.perf_counter() - t0:.1f}s "
                f"(incl. compile), params {n_params / 1e6:.1f}M")

            row = {
                "d_model": d,
                "batch": b,
                "params_m": round(n_params / 1e6, 1),
                "ms_per_step": round(best * 1e3, 2),
                "steps_per_s": round(1.0 / best, 2),
                "utterances_per_s": round(b / best, 0),
            }
            if flops:
                row["gflop_per_step"] = round(flops / 1e9, 1)
                row["tflops"] = round(flops / best / 1e12, 1)
                if peak:
                    row["mfu"] = round(flops / best / peak, 3)
            rows.append(row)
            log(f"d={d} B={b}: {row}")

    metric = (
        "acoustic_train_mfu_vs_batch" if args.batches
        else "acoustic_train_mfu_vs_width"
    )
    print(json.dumps({"metric": metric, "rows": rows}))


if __name__ == "__main__":
    main()

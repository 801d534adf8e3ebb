#!/usr/bin/env python
"""Device-time split of text->mel: encoder+VA (XLA) vs AR decode (Pallas).

Settles the last tracked decode lever (VERDICT r04 item 7): whether fusing
the encoder + variance adaptor into the decode kernel's warm-up could buy
~2.4 ms.  Answer: no — that 2.4 ms was host dispatch, not device compute.
Run on the TPU:

    python scripts/bench_encode_split.py            # wall-clock split
    python scripts/bench_encode_split.py --trace enc  # device-lane truth

Measured (v5e, B=1, 64 phonemes, 512 frames, round 5):
  * encode (embed+encoder+VA) device-lane time: 0.111 ms/call
  * full text->mel device time:                 12.1  ms/call
  * wall: full 14.84 ms vs decode-only 14.66 ms (Δ = 0.18 ms, same order)
so the fusion upside is bounded at ~0.9 % of text->mel.  Full writeup in
docs/performance.md ("closed — the lever never existed").
"""
import argparse
import glob
import gzip
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import jax
import jax.numpy as jnp
import numpy as np

from sambert_hifigan_tpu.utils.jax_cache import enable

enable()
from sambert_hifigan_tpu.config import TTSConfig
from sambert_hifigan_tpu.models.acoustic_model import (
    SAMBERTAcousticModel,
    acoustic_inference,
)
from sambert_hifigan_tpu.models.ar_decoder import PNCAARDecoder, ar_decode


def build(tph=64, tfrm=512):
    cfg = TTSConfig()
    c = cfg.acoustic_model
    model = SAMBERTAcousticModel(c, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ph = jnp.asarray(rng.integers(4, 100, (1, tph)), jnp.int32)
    tone = jnp.asarray(rng.integers(0, 5, (1, tph)), jnp.int32)
    bnd = jnp.asarray(rng.integers(0, 4, (1, tph)), jnp.int32)
    mask = jnp.ones((1, tph), bool)
    mel_gt = jnp.zeros((1, tfrm, c.n_mels), jnp.bfloat16)
    dur_gt = jnp.full((1, tph), 8, jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), ph, tone, bnd, mel_gt, dur_gt, None, None, mask, True
    )

    enc = jax.jit(
        lambda p: model.apply(
            p, ph, tone, bnd, tfrm, None, None, None, mask, True, 1.0, 0.0, 1.0,
            method=SAMBERTAcousticModel.encode,
        ).hvar
    )
    hvar = jax.block_until_ready(enc(params))
    dec_model = PNCAARDecoder(c.d_model, c.n_mels, c.decoder, dtype=jnp.bfloat16)
    dparams = {"params": params["params"]["ar_decoder"]}
    dec = jax.jit(lambda: ar_decode(dec_model, dparams, hvar, tfrm))
    full = jax.jit(
        lambda p: acoustic_inference(model, p, ph, tone, bnd, tfrm, mask, tfrm).mel_pred
    )
    return {"enc": lambda: enc(params), "dec": dec, "full": lambda: full(params)}


def wall(f, reps=5, inner=10):
    jax.block_until_ready(f())
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = f()
        jax.block_until_ready(out)
        best.append((time.perf_counter() - t0) / inner)
    return min(best) * 1e3


def device_lane_ms(trace_dir, inner=10):
    tj = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(tj, "rt") as fh:
        ev = json.load(fh)["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = {p for p, n in pids.items() if "TPU" in n or "/device" in n}
    per_lane = {}
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev:
            k = (e["pid"], e.get("tid"))
            per_lane[k] = per_lane.get(k, 0.0) + e.get("dur", 0)
    # lanes replicate the same executable events; report the max lane
    return max(per_lane.values()) / 1e3 / inner if per_lane else 0.0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", choices=["enc", "dec", "full"], default=None,
                    help="capture a device trace of one surface and report "
                    "its device-lane ms/call (the ground truth)")
    args = ap.parse_args()
    fns = build()
    if args.trace:
        f = fns[args.trace]
        jax.block_until_ready(f())
        out_dir = f"/tmp/bench_split_trace_{args.trace}"
        with jax.profiler.trace(out_dir):
            for _ in range(10):
                out = f()
            jax.block_until_ready(out)
        print(f"{args.trace}: {device_lane_ms(out_dir):.3f} ms/call (device lane)")
    else:
        for name in ("full", "dec", "enc"):
            print(f"{name}: {wall(fns[name]):.2f} ms (wall, amortized)")

#!/usr/bin/env python
"""Benchmark the three AR-decode engines on the current backend.

Usage:  python scripts/bench_decode_modes.py

Modes: auto = bf16 Pallas mega-kernel, 0 = XLA scan fallback.  Amortized
min-of-reps timing with one value fetch per 10 runs (tunnel-safe).
(An int8-weight kernel was a third mode through round 4; it measured equal
to bf16 and was removed — docs/performance.md "What we measured and ruled
out".)
"""
import os, sys, time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
import jax, jax.numpy as jnp, numpy as np
from sambert_hifigan_tpu.utils.jax_cache import enable; enable()
from sambert_hifigan_tpu.config import TTSConfig
from sambert_hifigan_tpu.models.ar_decoder import PNCAARDecoder, ar_decode

cfg = TTSConfig().acoustic_model
model = PNCAARDecoder(cfg.d_model, cfg.n_mels, cfg.decoder, dtype=jnp.bfloat16)
T = 512
hvar = jax.random.normal(jax.random.PRNGKey(0), (1, T, cfg.d_model), jnp.bfloat16)
params = model.init(jax.random.PRNGKey(1), hvar, jnp.zeros((1, T, cfg.n_mels), jnp.bfloat16))

def run_mode(mode):
    os.environ["SAMBERT_PALLAS_DECODE"] = mode
    f = jax.jit(lambda p, h: ar_decode(model, p, h, T))
    v = float(jnp.sum(f(params, hvar).astype(jnp.float32)))  # warm + value
    # amortized k-run timing with one value fetch at the end (bench.py style)
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(params, hvar)
        float(jnp.sum(out.astype(jnp.float32)))
        reps.append((time.perf_counter() - t0) / 10)
    t = min(reps)
    print(f"mode={mode}: {t*1e3:.2f} ms / {T} frames ({T/t/1e3:.1f}k frames/s), checksum {v:.2f}")

run_mode("auto")   # bf16 mega-kernel
run_mode("0")      # XLA scan fallback

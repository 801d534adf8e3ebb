"""Benchmark harness — run on real TPU hardware by the driver.

Measures end-to-end text -> waveform real-time factor (RTF) of the full
reference-size pipeline (15.7M-param SAM-BERT with scan/KV-cache AR decoding +
13.9M-param HiFi-GAN), bf16 compute, single chip.

Timing methodology: on this image the TPU is reached through a tunnel whose
host<->device roundtrip is ~30 ms and whose `block_until_ready` does not
actually block.  So each measurement dispatches K iterations back-to-back
(same stream => in-order device execution), syncs ONCE by fetching a scalar
reduction of the last output, and reports (total - rtt) / K.  The scalar
fetch is the only host transfer.

Prints ONE JSON line:
  {"metric": "e2e_text_to_wav_rtf", "value": <rtf>, "unit": "rtf",
   "vs_baseline": <0.1 / rtf>}

Baseline: the reference publishes no numbers (BASELINE.md); its design doc
lists "< 0.1 RTF" as the aspirational target
(reference: .kiro/specs/tts-sam-bert-hifigan/design.md:1158), so
vs_baseline = 0.1 / measured_rtf (> 1 is faster than the reference's target;
this repo's own target is < 0.05 RTF, i.e. vs_baseline > 2).

Extra diagnostics (vocoder samples/sec, decode frames/sec) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np

from sambert_hifigan_tpu.utils.jax_cache import enable as _enable_jax_cache

_enable_jax_cache()  # persistent XLA compile cache (SAMBERT_JAX_CACHE=0 disables)


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def measure_rtt(n=5):
    x = jnp.ones((8, 8), jnp.float32)
    f = jax.jit(lambda a: jnp.sum(a))
    float(f(x))  # warm
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(f(x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def timed_amortized(fn, reduce_fn, rtt, k=16, reps=5):
    """fn() dispatches one iteration and returns its output array(s);
    reduce_fn(out) -> scalar jax array fetched to sync.  Returns the MIN
    per-iteration seconds over `reps` measurements — the tunnel's RTT jitter
    and queue hiccups only ever ADD time, so min is the estimator of the
    device's actual rate."""
    out = fn()
    float(reduce_fn(out))  # warm + sync
    results = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        float(reduce_fn(out))
        total = time.perf_counter() - t0
        results.append(max(total - rtt, 1e-9) / k)
    return float(np.min(results))


def main():
    from sambert_hifigan_tpu.config import TTSConfig
    from sambert_hifigan_tpu.pipeline import build_pipeline_from_random_init

    cfg = TTSConfig()
    log(f"devices: {jax.devices()}")
    dtype = jnp.bfloat16
    pipe = build_pipeline_from_random_init(cfg, seed=0, dtype=dtype)

    sr = cfg.audio.sample_rate
    hop = cfg.audio.hop_length
    rtt = measure_rtt()
    log(f"host<->device rtt: {rtt * 1e3:.1f} ms")

    text = "今天天气真好我们一起去公园散步吧朋友们"
    max_frames = 512  # the decode loop runs the full bucket
    audio_seconds = max_frames * hop / sr

    def synth():
        out = pipe.text_to_mel([text], max_frames=max_frames)
        return pipe.vocode(out.mel_pred)

    t0 = time.perf_counter()
    wav = synth()
    float(jnp.sum(wav.astype(jnp.float32)))
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")
    log(f"audio generated per run: {audio_seconds:.2f}s ({max_frames} frames)")

    e2e = timed_amortized(
        synth, lambda w: jnp.sum(w.astype(jnp.float32)), rtt, k=10
    )
    rtf = e2e / audio_seconds
    log(f"e2e: {e2e * 1e3:.1f} ms/run -> RTF {rtf:.5f}")

    # Vocoder-only throughput
    mel = pipe.text_to_mel([text], max_frames=max_frames).mel_pred
    voc_t = timed_amortized(
        lambda: pipe.vocode(mel), lambda w: jnp.sum(w.astype(jnp.float32)), rtt, k=10
    )
    log(f"vocoder: {voc_t * 1e3:.2f} ms/run -> "
        f"{max_frames * hop / voc_t / 1e6:.1f} Msamples/s")

    # Acoustic (AR decode) throughput
    ac_t = timed_amortized(
        lambda: pipe.text_to_mel([text], max_frames=max_frames).mel_pred,
        lambda m: jnp.sum(m.astype(jnp.float32)),
        rtt,
        k=10,
    )
    log(f"acoustic text->mel: {ac_t * 1e3:.1f} ms/run "
        f"({max_frames / ac_t:.0f} frames/s)")

    # Batched decode (batch rows riding the mega-kernel's sublane tile)
    bsz = 4
    ac_b = timed_amortized(
        lambda: pipe.text_to_mel([text] * bsz, max_frames=max_frames).mel_pred,
        lambda m: jnp.sum(m.astype(jnp.float32)),
        rtt,
        k=10,
    )
    log(f"acoustic text->mel B={bsz}: {ac_b * 1e3:.1f} ms/run "
        f"({bsz * max_frames / ac_b:.0f} frames/s aggregate, "
        f"{ac_b / ac_t:.2f}x the B=1 latency for {bsz}x the work)")

    print(
        json.dumps(
            {
                "metric": "e2e_text_to_wav_rtf",
                "value": round(rtf, 5),
                "unit": "rtf",
                # vs the reference design-doc target (< 0.1 RTF)
                "vs_baseline": round(0.1 / rtf, 2),
                # vs this repo's own stricter target (< 0.05 RTF, BASELINE.md)
                "vs_repo_target": round(0.05 / rtf, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

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


_PEAK_BF16_FLOPS = {
    # device_kind substring (lowercase) -> peak bf16 FLOP/s per chip
    "v4": 275e12,
    "v5 lite": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6": 918e12,
    "trillium": 918e12,
}


def peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in _PEAK_BF16_FLOPS.items():
        if sub in kind:
            return peak
    return None


def compiled_flops(jitted, *args) -> float | None:
    """XLA's own FLOP count for the compiled executable (counts what actually
    runs, including both GAN towers and the backward pass)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost["flops"])
    except Exception as e:  # noqa: BLE001 - diagnostics only
        log(f"cost_analysis unavailable: {e}")
        return None


def measure_step_rate(step, state, args, rtt, reps=3, k=8) -> float:
    """Min-of-reps amortized seconds/step for a donated-state train step:
    warms/compiles once, then times k back-to-back dispatches per rep with
    ONE scalar sync, threading the donated state through every call.
    Shared by bench_training and scripts/bench_scaling.py so the timing
    methodology cannot drift between the two surfaces."""
    state, m = step(state, *args)
    sync = lambda mm: float(list(mm.values())[0])  # noqa: E731
    sync(m)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            state, m = step(state, *args)
        sync(m)
        dt = max(time.perf_counter() - t0 - rtt, 1e-9) / k
        best = dt if best is None else min(best, dt)
    return best


def bench_training(rtt: float) -> dict:
    """Train-step surfaces (VERDICT r02 item 4): reference-shape batches on
    the real chip, steps/s + MFU from XLA-counted FLOPs vs the chip's bf16
    peak.  bf16 mixed precision is the default recipe
    (TrainStageConfig.mixed_precision)."""
    from sambert_hifigan_tpu.config import TTSConfig
    from sambert_hifigan_tpu.data.dataset import synthetic_batch
    from sambert_hifigan_tpu.models.acoustic_model import SAMBERTAcousticModel
    from sambert_hifigan_tpu.models.hifigan import HiFiGAN
    from sambert_hifigan_tpu.training.acoustic_trainer import (
        init_acoustic_state,
        make_jitted_acoustic_step,
    )
    from sambert_hifigan_tpu.training.vocoder_trainer import (
        init_vocoder_state,
        make_jitted_vocoder_step,
    )

    cfg = TTSConfig()
    peak = peak_flops()
    results = {}

    def run(label, step, state, args, flops):
        best = measure_step_rate(step, state, args, rtt)
        sps = 1.0 / best
        results[f"train_{label}_steps_per_s"] = round(sps, 2)
        msg = f"train {label}: {best * 1e3:.2f} ms/step ({sps:.2f} steps/s)"
        if flops:
            msg += f", {flops / 1e9:.1f} GFLOP/step -> {flops / best / 1e12:.1f} TFLOP/s"
            if peak:
                mfu = flops / best / peak
                results[f"train_{label}_mfu"] = round(mfu, 3)
                msg += f" = {mfu * 100:.1f}% MFU"
        log(msg)

    # ---- acoustic train step: B=16 (reference: configs/config.yaml batch 16),
    # 48 phonemes x 384 frames (a typical 4.5 s utterance bucket)
    b, tph, tfrm = 16, 48, 384
    ac_model = SAMBERTAcousticModel(cfg.acoustic_model)
    ac_state = init_acoustic_state(
        ac_model, cfg, jax.random.PRNGKey(0), tph=tph, max_frames=tfrm, batch=1
    )
    ac_batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, b, tph, tfrm).items()}
    ac_step = make_jitted_acoustic_step(ac_model, cfg)
    ac_flops = compiled_flops(ac_step, ac_state, ac_batch, jax.random.PRNGKey(1))
    run("acoustic", ac_step, ac_state, (ac_batch, jax.random.PRNGKey(1)), ac_flops)

    # ---- vocoder GAN step: B=16 x 32-frame crops (the standard HiFi-GAN
    # recipe, data/dataset.py:296-319), adv_mel_fm = full loss stack
    seg = 32
    voc_model = HiFiGAN(cfg.vocoder)
    voc_state = init_vocoder_state(
        voc_model, cfg, jax.random.PRNGKey(2), mel_frames=seg, batch=1
    )
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((b, cfg.audio.n_mels, seg)), jnp.float32)
    wav = jnp.asarray(
        rng.standard_normal((b, 1, seg * cfg.audio.hop_length)) * 0.1, jnp.float32
    )
    voc_step = make_jitted_vocoder_step(voc_model, cfg, loss_mode="adv_mel_fm")
    voc_flops = compiled_flops(voc_step, voc_state, mel, wav)
    run("vocoder", voc_step, voc_state, (mel, wav), voc_flops)
    return results


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

    # Wide-batch decode: B=16 rides a [16, 256] row tile in ONE kernel launch
    # at T=256 (~3 s utterances; B=16 at T=512 exceeds the VMEM cache budget
    # and auto-routes to the XLA scan).  The comparison that matters: one
    # B=16 launch vs two sequential B=8 launches — the win is sharing the
    # per-step weight stream across all 16 rows instead of streaming twice.
    mf = 256
    b16_t = timed_amortized(
        lambda: pipe.text_to_mel([text] * 16, max_frames=mf).mel_pred,
        lambda m: jnp.sum(m.astype(jnp.float32)), rtt, k=8,
    )
    b8_t = timed_amortized(
        lambda: pipe.text_to_mel([text] * 8, max_frames=mf).mel_pred,
        lambda m: jnp.sum(m.astype(jnp.float32)), rtt, k=8,
    )
    b16_fps = 16 * mf / b16_t
    b16_vs_2xb8 = (2 * b8_t) / b16_t
    log(f"decode B=16 (T={mf}): {b16_t * 1e3:.1f} ms -> {b16_fps:.0f} frames/s "
        f"aggregate; 2x sequential B=8 = {2 * b8_t * 1e3:.1f} ms "
        f"({b16_vs_2xb8:.2f}x win)")

    # Streaming time-to-first-chunk (pipeline.stream: chunked AR decode +
    # windowed vocode) — the interactive-serving headline.  Measured warm,
    # wall-clock including the ONE host sync the first chunk makes (the
    # combined (first_wav, total_frames) fetch; everything before it
    # dispatches asynchronously); on this image that sync rides a
    # ~25-30 ms-RTT tunnel, so the raw number is an upper bound vs an
    # attached host.
    chunk_frames, context_frames = 32, 16
    for _ in pipe.stream(text, chunk_frames, context_frames):
        pass  # warm: compiles every stream graph (encode/chunk-decode/vocode)
    ttfb = None
    for _ in range(5):
        t0 = time.perf_counter()
        it = pipe.stream(text, chunk_frames, context_frames)
        next(it)
        dt = time.perf_counter() - t0
        it.close()
        ttfb = dt if ttfb is None else min(ttfb, dt)
    first_audio_ms = chunk_frames * hop / sr * 1e3
    log(f"stream TTFB (chunk={chunk_frames}, ctx={context_frames}): "
        f"{ttfb * 1e3:.1f} ms to the first {first_audio_ms:.0f} ms of audio "
        f"(includes 1 host sync x {rtt * 1e3:.0f} ms tunnel RTT)")

    train_metrics = bench_training(rtt)

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
                # wide-batch serving decode (one kernel launch, shared
                # weight stream) vs two sequential half-batch launches
                "decode_b16_frames_per_s": round(b16_fps, 0),
                "decode_b16_vs_2x_b8": round(b16_vs_2xb8, 2),
                # warm time-to-first-chunk of pipeline.stream (32-frame
                # chunks = 372 ms of audio per chunk; raw wall incl. tunnel)
                "stream_ttfb_ms": round(ttfb * 1e3, 1),
                # train-step surfaces (bs16, reference shapes, bf16 recipe)
                **train_metrics,
            }
        )
    )


if __name__ == "__main__":
    main()

"""End-to-end text -> waveform inference pipeline.

The reference specs (but never builds) inference.py and a streaming demo with
an overlap-add buffer (first-class absence I-5; reference:
.kiro/specs/tts-sam-bert-hifigan/design.md:799-824, tasks.md:353-369).

Pipeline = FrontEnd (host Python) -> jitted acoustic inference (encoder +
variance adaptor + scan/KV-cache AR decoder) -> jitted HiFi-GAN vocoder.
The acoustic model emits mel [B, T, n_mels] and the vocoder consumes
[B, n_mels, T]; that transpose happens exactly once, here (the reference left
this seam ambiguous between its two halves — SURVEY.md section 1 note).

Static-shape discipline: text is padded to a phoneme bucket and decoding runs
to a frame bucket; each (Tph_bucket, Tfrm_bucket) pair compiles once and is
cached for the life of the pipeline.

Streaming: `stream()` yields fixed-size waveform chunks.  Mel is vocoded in
overlapping windows (HiFi-GAN's conv stack has a finite receptive field, so
`context_frames` of margin on each side make interior samples exact); the
discarded-margin windows are cross-fade-free by construction — chunks are
bit-identical to slices of the full vocoding for sufficient context.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import warnings

from .config import TTSConfig
from .models.acoustic_model import SAMBERTAcousticModel, acoustic_inference
from .models.ar_decoder import (
    PNCAARDecoder,
    ar_decode_chunk,
    extract_decode_params,
    init_packed_carry,
    make_packed_step,
    precompute_memory_packed,
)
from .models.hifigan import HiFiGANGenerator
from .parallel.mesh import DATA_AXIS, replicate
from .text.frontend import FrontEnd, pick_bucket


class TTSPipeline:
    """Text -> wav serving pipeline.

    Pass `mesh` (a ('data', 'model') jax.sharding.Mesh) to serve batches
    data-parallel across chips: parameters are replicated, batched inputs are
    sharded over the 'data' axis, and XLA partitions every jitted stage
    (batches are transparently padded to a multiple of the data-axis size).
    The reference has no serving story at all; single-device behavior is
    bit-identical with mesh=None."""

    def __init__(
        self,
        cfg: TTSConfig,
        acoustic_params,
        generator_params,
        dtype=jnp.float32,
        mesh=None,
    ):
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            acoustic_params = replicate(acoustic_params, mesh)
            generator_params = replicate(generator_params, mesh)
        self.acoustic = SAMBERTAcousticModel(cfg.acoustic_model, dtype=dtype)
        self.generator = HiFiGANGenerator(cfg.vocoder.generator, dtype=dtype)
        self.acoustic_params = acoustic_params
        self.generator_params = generator_params
        self.frontend = FrontEnd(
            cfg.acoustic_model.frontend.vocab_size,
            cfg.acoustic_model.frontend.tone_size,
            cfg.acoustic_model.frontend.boundary_size,
        )
        self.hop = cfg.audio.hop_length
        self._infer_cache: Dict[Tuple[int, int], object] = {}
        self._vocode_cache: Dict[int, object] = {}
        self._encode_cache: Dict[Tuple[int, int], object] = {}
        self._stream_cache: Dict[Tuple[int, int], object] = {}
        self._fused_generator = None

    # ---- jitted stages -------------------------------------------------------

    def _acoustic_fn(self, tph: int, max_frames: int):
        key = (tph, max_frames)
        if key not in self._infer_cache:

            @functools.partial(jax.jit, static_argnames=())
            def fn(params, ph, tone, bound, pmask, dur_scale, pitch_shift, energy_scale):
                return acoustic_inference(
                    self.acoustic,
                    params,
                    ph,
                    tone,
                    bound,
                    max_frames=max_frames,
                    phoneme_mask=pmask,
                    duration_scale=dur_scale,
                    pitch_shift=pitch_shift,
                    energy_scale=energy_scale,
                )

            self._infer_cache[key] = fn
        return self._infer_cache[key]

    def _encode_fn(self, tph: int, max_frames: int):
        """Encoder + variance adaptor only (everything before the AR decoder)
        — the streaming path runs this first, then decodes in chunks."""
        key = (tph, max_frames)
        if key not in self._encode_cache:

            @jax.jit
            def fn(params, ph, tone, bound, pmask, dur_scale, pitch_shift, energy_scale):
                return self.acoustic.apply(
                    params, ph, tone, bound, max_frames,
                    None, None, None, pmask, True,
                    dur_scale, pitch_shift, energy_scale,
                    method=SAMBERTAcousticModel.encode,
                )

            self._encode_cache[key] = fn
        return self._encode_cache[key]

    def _stream_decode_fns(self, max_frames: int, chunk: int):
        """(prepare, decode_chunk) jitted pair for chunked AR decoding.

        prepare packs the decoder weights + cross-attention memory once per
        utterance; decode_chunk advances the scan by `chunk` frames.  Chaining
        chunks is carry-exact (models/ar_decoder.py:ar_decode_chunk), so the
        streamed mel is bit-identical to the one-shot decode."""
        key = (max_frames, chunk)
        if key not in self._stream_cache:
            decoder = PNCAARDecoder(
                self.cfg.acoustic_model.d_model,
                self.cfg.acoustic_model.n_mels,
                self.cfg.acoustic_model.decoder,
                dtype=self.acoustic.dtype,
            )
            unroll = max(1, int(decoder.config.chunk_size))

            @jax.jit
            def prepare(params, hvar):
                dparams = {"params": params["params"]["ar_decoder"]}
                dp = extract_decode_params(decoder, dparams)
                mem_k, mem_v = precompute_memory_packed(decoder, dparams, hvar)
                return dp, mem_k, mem_v

            @functools.partial(jax.jit, static_argnames=())
            def decode_chunk(dp, mem_k, mem_v, mem_mask, carry, pos0):
                step = make_packed_step(
                    dp, mem_k, mem_v, max_frames, mem_mask, self.acoustic.dtype
                )
                return ar_decode_chunk(step, carry, pos0, chunk, unroll)

            self._stream_cache[key] = (decoder, prepare, decode_chunk)
        return self._stream_cache[key]

    def _use_fused_generator(self) -> bool:
        import os

        flag = os.getenv("SAMBERT_PALLAS_MRF", "auto")
        if flag == "0":
            return False
        lanes_ok = all(
            (c >= 128 or 128 % c == 0)
            for c in (
                self.cfg.vocoder.generator.upsample_initial_channel // (2 ** (i + 1))
                for i in range(len(self.cfg.vocoder.generator.upsample_rates))
            )
        )
        if flag == "1":
            return lanes_ok
        return lanes_ok and jax.default_backend() == "tpu"

    def _vocode_fn(self, tfrm: int):
        if tfrm not in self._vocode_cache:
            if self._use_fused_generator():
                from .models.fused_generator import FusedGenerator

                if self._fused_generator is None:
                    self._fused_generator = FusedGenerator(
                        self.cfg.vocoder.generator,
                        self.generator_params,
                        dtype=self.generator.dtype,
                    )
                fused = self._fused_generator
                gen = self.generator

                @jax.jit
                def fn(params, mel):
                    # The fused Pallas MRF is the LATENCY path: it runs batch
                    # rows as sequential kernels (models/fused_generator.py),
                    # so wide batches gain nothing — and the serving
                    # max-batch x max-frames bucket additionally trips an XLA
                    # scoped-vmem overflow when the pad/stack plumbing around
                    # the custom calls is fused at [16, 4096, 256] scale.
                    # Route wide batches to the plain XLA generator, which
                    # batches properly on the MXU (shape is trace-static).
                    if mel.shape[0] <= 2:
                        return fused(mel)  # params unused; fused holds weights
                    return gen.apply(params, mel)

            else:

                @jax.jit
                def fn(params, mel):
                    return self.generator.apply(params, mel)

            self._vocode_cache[tfrm] = fn
        return self._vocode_cache[tfrm]

    def warmup(
        self,
        max_frames: Optional[int] = None,
        streaming: bool = False,
        batch_buckets: bool = False,
        chunk_frames: int = 32,
        context_frames: int = 16,
    ) -> None:
        """Pre-compile every (phoneme bucket, frame bucket) pair so first-user
        requests never pay compile latency (serving deployments call this at
        startup).  With max_frames given, only that frame bucket compiles.

        streaming=True also compiles the chunked-decode graphs: one real
        stream per phoneme bucket (encode + decode-chunk + windowed vocode at
        that text's estimated frame bucket) plus the decode-chunk graph for
        EVERY frame bucket — a cold graph would otherwise compile while the
        serving worker holds the device, stalling all traffic for its
        duration.  batch_buckets=True compiles synthesize_batch's
        runtime.batch_buckets sizes at the smallest text bucket (the batcher
        pads fused batches to these, so B is never a fresh shape)."""
        frame_buckets = (
            [max_frames] if max_frames else list(self.cfg.runtime.frame_buckets)
        )
        texts = {
            tph: "预" * max(1, tph - 2)  # fills the bucket exactly with BOS/EOS
            for tph in self.cfg.runtime.phoneme_buckets
        }
        for tph, text in texts.items():
            for tfrm in frame_buckets:
                out = self.text_to_mel([text], max_frames=tfrm)
                self.vocode(out.mel_pred)
            if streaming:
                # drain FULLY: later windows assemble one more mel chunk
                # than the first (the left context straddles a chunk seam),
                # a distinct op shape that must warm too
                for _ in self.stream(
                    text, chunk_frames=chunk_frames,
                    context_frames=context_frames,
                ):
                    pass
        if streaming:
            # decode-chunk graphs are keyed (max_frames, chunk) independent
            # of the text bucket; the streams above touched only each text's
            # estimated frame bucket, so compile the remaining buckets via a
            # direct _StreamRun (an overflow restart then pays at most a
            # small encode compile, never the decode graph)
            tph0 = min(texts)
            _, args0 = self._frontend_args(
                [texts[tph0]], 1.0, 0.0, 1.0, shard=False
            )
            for tfrm in frame_buckets:
                run = _StreamRun(
                    self, tph0, args0, tfrm, chunk_frames, context_frames
                )
                run.first_fetch()
                if tfrm > chunk_frames:  # warm the 3-part later-window shape
                    jax.block_until_ready(run.window_wav(
                        chunk_frames,
                        min(2 * chunk_frames + context_frames, tfrm),
                    ))
        if batch_buckets:
            text0 = texts[min(texts)]
            for b in self.cfg.runtime.batch_buckets:
                self.synthesize_batch([text0] * b)

    def _frontend_args(self, texts, duration_scale, pitch_shift, energy_scale,
                       shard: bool = True):
        """Bucket-padded frontend features packed as jitted-fn args.  With a
        mesh, the batch is padded to a multiple of the data-axis size
        (callers slice their outputs back to len(texts)) and batched arrays
        are sharded over 'data'; shard=False replicates instead (the B=1
        streaming path)."""
        if self.mesh is not None and shard:
            d = int(self.mesh.shape[DATA_AXIS])
            texts = list(texts) + [texts[-1]] * ((-len(texts)) % d)
        feat = self.frontend.batch_forward(texts)
        tph = pick_bucket(feat.ph_ids.shape[1], self.cfg.runtime.phoneme_buckets)
        feat = self.frontend.batch_forward(texts, pad_to=tph)
        args = (
            jnp.asarray(feat.ph_ids),
            jnp.asarray(feat.tone_ids),
            jnp.asarray(feat.boundary_ids),
            jnp.asarray(feat.phoneme_mask),
            jnp.float32(duration_scale),
            jnp.float32(pitch_shift),
            jnp.float32(energy_scale),
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def put(x):
                spec = (
                    P(DATA_AXIS, *([None] * (x.ndim - 1)))
                    if (shard and x.ndim > 0)
                    else P()
                )
                return jax.device_put(x, NamedSharding(self.mesh, spec))

            args = tuple(put(x) for x in args)
        return tph, args

    def _initial_bucket(self, tph: int, duration_scale: float) -> int:
        """The frame-budget estimate every dispatch path shares (text_to_mel,
        synthesize_batch, stream): ~12 frames per phoneme scaled by the
        duration control, clamped into the configured buckets.  One
        definition so the one-shot and streaming paths can never disagree on
        bucket policy."""
        buckets = self.cfg.runtime.frame_buckets
        est = int(tph * 12 * max(duration_scale, 1.0))
        return pick_bucket(min(est, max(buckets)), buckets)

    def _dispatch_frame_budget(self, fn_for, tph, args, duration_scale, totals_of):
        """Run a (tph, max_frames)-bucketed jitted fn under the frame-budget
        heuristic: estimate, dispatch, and if predicted durations overflow the
        bucket re-dispatch ONCE at the smallest bucket that fits (durations
        are deterministic, so the re-run lands on the same totals).  Returns
        (out, max_frames, need).  Used by text_to_mel; synthesize_batch and
        stream inline the same loop around _initial_bucket because their
        overflow handling differs (fused vocode / clean stream restart)."""
        buckets = self.cfg.runtime.frame_buckets
        max_frames = self._initial_bucket(tph, duration_scale)
        out = fn_for(tph, max_frames)(self.acoustic_params, *args)
        need = int(jax.device_get(totals_of(out)).max())
        if need > max_frames and max_frames < max(buckets):
            max_frames = pick_bucket(min(need, max(buckets)), buckets)
            out = fn_for(tph, max_frames)(self.acoustic_params, *args)
            need = int(jax.device_get(totals_of(out)).max())
        if need > max_frames:
            warnings.warn(
                f"predicted {need} frames exceed the largest frame bucket "
                f"({max_frames}); audio will be truncated - split the text "
                "or enlarge runtime.frame_buckets"
            )
        return out, max_frames, need

    # ---- public API ----------------------------------------------------------

    def text_to_mel(
        self,
        texts: List[str],
        duration_scale: float = 1.0,
        pitch_shift: float = 0.0,
        energy_scale: float = 1.0,
        max_frames: Optional[int] = None,
    ):
        tph, args = self._frontend_args(
            texts, duration_scale, pitch_shift, energy_scale
        )
        if max_frames is not None:  # caller pinned the bucket
            return self._acoustic_fn(tph, max_frames)(self.acoustic_params, *args)
        out, _, _ = self._dispatch_frame_budget(
            self._acoustic_fn, tph, args, duration_scale,
            lambda o: o.total_frames,
        )
        return out

    def vocode(self, mel_btc: jnp.ndarray) -> jnp.ndarray:
        """mel [B, T, n_mels] -> wav [B, 1, T * hop].  The single orientation
        seam: transpose to the vocoder's [B, n_mels, T]."""
        mel = jnp.swapaxes(mel_btc, 1, 2)
        if self.mesh is not None and mel.shape[0] % int(self.mesh.shape[DATA_AXIS]) == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mel = jax.device_put(
                mel, NamedSharding(self.mesh, P(DATA_AXIS, None, None))
            )
        fn = self._vocode_fn(mel.shape[-1])
        return fn(self.generator_params, mel)

    def synthesize(
        self,
        text: str,
        duration_scale: float = 1.0,
        pitch_shift: float = 0.0,
        energy_scale: float = 1.0,
    ) -> np.ndarray:
        """text -> waveform [T_wav] float32, trimmed to the true length."""
        return self.synthesize_batch(
            [text],
            duration_scale=duration_scale,
            pitch_shift=pitch_shift,
            energy_scale=energy_scale,
        )[0]

    def synthesize_batch(
        self,
        texts: List[str],
        duration_scale: float = 1.0,
        pitch_shift: float = 0.0,
        energy_scale: float = 1.0,
        max_frames: Optional[int] = None,
    ) -> List[np.ndarray]:
        """Batch text -> wav with ONE host sync on the warm path: acoustic
        inference AND vocoding dispatch back-to-back on the estimated frame
        bucket (or the caller-pinned `max_frames`), then (wav, total_frames)
        come back in one combined device_get.  Only a bucket overflow
        (predicted frames exceed the estimate) pays a second dispatch+fetch
        — durations are deterministic, so the re-run lands on the same
        totals (same estimate as _initial_bucket, fused with the vocoder
        here so the happy path costs one roundtrip instead of two).

        The batch axis is bucketed like every other axis: the request list
        is padded (repeating the last text) up to the next
        runtime.batch_buckets size, so the micro-batcher's variable fusion
        widths all land on a handful of compiled programs instead of one
        XLA compile per distinct B; outputs are sliced back to len(texts)."""
        n = len(texts)
        bb = self.cfg.runtime.batch_buckets
        if bb and n < max(bb):
            texts = list(texts) + [texts[-1]] * (pick_bucket(n, bb) - n)
        tph, args = self._frontend_args(
            texts, duration_scale, pitch_shift, energy_scale
        )
        buckets = self.cfg.runtime.frame_buckets
        if max_frames is not None:  # caller pinned the bucket: never re-run
            buckets = (max_frames,)
        max_frames = (
            max_frames
            if max_frames is not None
            else self._initial_bucket(tph, duration_scale)
        )
        for _ in range(2):  # optimistic pass + at most one overflow re-run
            out = self._acoustic_fn(tph, max_frames)(self.acoustic_params, *args)
            wav = self.vocode(out.mel_pred)
            # one combined host transfer for the whole batch (each
            # device->host fetch pays a full roundtrip; on tunneled setups
            # that dominates warm latency)
            wav_np, totals = jax.device_get((wav, out.total_frames))
            need = int(totals.max())
            if need <= max_frames or max_frames >= max(buckets):
                break
            max_frames = pick_bucket(min(need, max(buckets)), buckets)
        if need > max_frames:
            warnings.warn(
                f"predicted {need} frames exceed the largest frame bucket "
                f"({max_frames}); audio will be truncated - split the text "
                "or enlarge runtime.frame_buckets"
            )
        return [
            np.asarray(wav_np[i, 0, : min(int(totals[i]), max_frames) * self.hop])
            for i in range(n)
        ]

    # ---- streaming -----------------------------------------------------------

    def stream(
        self,
        text: str,
        chunk_frames: int = 32,
        context_frames: int = 16,
        duration_scale: float = 1.0,
        pitch_shift: float = 0.0,
        energy_scale: float = 1.0,
    ) -> Iterator[np.ndarray]:
        """True incremental synthesis: yield waveform chunks of
        chunk_frames * hop samples as soon as their mel frames exist.

        Unlike the one-shot path, the AR decode itself is chunked
        (ar_decode_chunk: carry-exact segments of the decode scan), so the
        first chunk arrives after encoder + ~(chunk + context) decode steps
        instead of after the FULL utterance decode.  Each chunk is vocoded
        from its mel window plus context_frames margin on each side (HiFi-GAN
        has a finite receptive field), so the streamed audio matches the
        one-shot synthesize() output to windowed-vocoding tolerance — exact
        where the receptive field fits the context margin; measured max
        |diff| ~2e-3 on the full bf16 model at ctx=16
        (reference design.md:799-824's streaming goal; its chunk_size knob
        never actually chunked, reference: models/ar_decoder.py:198-229).

        ONE host sync before first audio: encoder, decoder prep, the first
        decode chunks, window assembly, tail masking, and the first vocode
        all dispatch asynchronously on the estimated frame bucket (mel stays
        device-resident; windows are assembled and total-frame-masked on
        device), then (first_wav, total_frames) come back in a single
        device_get.  Only a bucket overflow restarts at the correct bucket
        (durations are deterministic, so the restart is exact).  Later
        chunks likewise cost one fetch each."""
        tph, args = self._frontend_args(
            [text], duration_scale, pitch_shift, energy_scale, shard=False
        )
        buckets = self.cfg.runtime.frame_buckets
        max_frames = self._initial_bucket(tph, duration_scale)
        run = _StreamRun(self, tph, args, max_frames, chunk_frames,
                         context_frames)
        first_wav, need = run.first_fetch()
        if need > max_frames and max_frames < max(buckets):
            # bucket overflow: the truncated encode memory would change the
            # decode, so restart cleanly at the bucket that fits
            max_frames = pick_bucket(min(need, max(buckets)), buckets)
            run = _StreamRun(self, tph, args, max_frames, chunk_frames,
                             context_frames)
            first_wav, need = run.first_fetch()
        if need > max_frames:
            warnings.warn(
                f"predicted {need} frames exceed the largest frame bucket "
                f"({max_frames}); audio will be truncated - split the text "
                "or enlarge runtime.frame_buckets"
            )
        total = min(need, max_frames)
        yield first_wav[: min(chunk_frames, total) * self.hop]
        for start in range(chunk_frames, total, chunk_frames):
            wav = run.window_wav(start, total)
            valid = min(chunk_frames, total - start) * self.hop
            yield np.asarray(jax.device_get(wav))[:valid]


class _StreamRun:
    """Device-side state of one streaming synthesis at a fixed frame bucket.

    Everything here dispatches asynchronously: decoded mel chunks stay
    device-resident, vocode windows are assembled by on-device concat/slice,
    and the tail beyond the (device-resident) total frame count is zero-masked
    on device — so the host only ever blocks on finished waveform chunks.
    The first fetch returns (first_wav, total_frames) together: one roundtrip
    to first audio instead of the three the host-buffered path paid (encode
    totals fetch, per-chunk mel fetch, wav fetch)."""

    def __init__(self, pipe: "TTSPipeline", tph: int, args, max_frames: int,
                 chunk_frames: int, context_frames: int):
        self.pipe = pipe
        self.max_frames = max_frames
        self.chunk = chunk_frames
        self.context = context_frames
        self.window = chunk_frames + 2 * context_frames
        self.hop = pipe.hop

        self.va = pipe._encode_fn(tph, max_frames)(pipe.acoustic_params, *args)
        decoder, prepare, decode_chunk = pipe._stream_decode_fns(
            max_frames, chunk_frames
        )
        self._decode_chunk = decode_chunk
        self.dp, self.mem_k, self.mem_v = prepare(pipe.acoustic_params,
                                                  self.va.hvar)
        self.mem_mask = ~self.va.frame_mask
        cfg_dec = decoder.config
        self.carry = init_packed_carry(
            cfg_dec.n_layers, 1, max_frames, cfg_dec.n_heads,
            decoder.d_model // cfg_dec.n_heads, decoder.n_mels,
            pipe.acoustic.dtype,
        )
        self.vocode = pipe._vocode_fn(self.window)
        # device-resident clamped total: masks window tails without a fetch
        self.total_dev = jnp.minimum(self.va.total_frames[0], max_frames)
        self.chunks: List[jnp.ndarray] = []  # [1, chunk, n_mels] device arrays
        self.pos = 0  # decoder position (multiple of chunk; may overshoot)
        self._zero_chunk = None

    def _ensure_decoded(self, need: int) -> None:
        """Advance the decode scan until `need` frames exist (chunk
        granularity, clamped to the bucket).  Pure dispatch — never blocks."""
        while self.pos < min(need, self.max_frames):
            self.carry, mel_c = self._decode_chunk(
                self.dp, self.mem_k, self.mem_v, self.mem_mask, self.carry,
                jnp.int32(self.pos),
            )
            self.chunks.append(mel_c)
            self.pos += self.chunk

    def _window_device(self, start: int) -> jnp.ndarray:
        """Vocode the window centered on [start, start+chunk) fully on
        device; returns the chunk's wav slice as a device array."""
        lo = max(0, start - self.context)
        c0, c1 = lo // self.chunk, (lo + self.window - 1) // self.chunk
        if self._zero_chunk is None:
            self._zero_chunk = jnp.zeros_like(self.chunks[0])
        parts = [
            self.chunks[i] if i < len(self.chunks) else self._zero_chunk
            for i in range(c0, c1 + 1)
        ]
        seg = jnp.concatenate(parts, axis=1)
        off = lo - c0 * self.chunk
        seg = seg[:, off : off + self.window]
        # frames >= total are zeros in the one-shot path (frame-mask
        # multiply); reproduce that on device so no fetch of total is needed
        idx = lo + jnp.arange(self.window)
        seg = seg * (idx < self.total_dev)[None, :, None].astype(seg.dtype)
        wav = self.vocode(self.pipe.generator_params, jnp.swapaxes(seg, 1, 2))
        s = (start - lo) * self.hop
        return wav[0, 0, s : s + self.chunk * self.hop]

    def first_fetch(self) -> Tuple[np.ndarray, int]:
        """Dispatch through the first vocoded chunk, then ONE combined
        device_get of (first_wav, total_frames)."""
        self._ensure_decoded(self.chunk + self.context)
        wav = self._window_device(0)
        wav_np, totals = jax.device_get((wav, self.va.total_frames))
        return np.asarray(wav_np), int(totals.max())

    def window_wav(self, start: int, total: int) -> jnp.ndarray:
        """Later chunks: decode as far as this window's right context, then
        vocode on device (caller fetches the returned wav slice)."""
        self._ensure_decoded(min(start + self.chunk + self.context, total))
        return self._window_device(start)


def build_pipeline_from_random_init(
    cfg: TTSConfig, seed: int = 0, dtype=jnp.float32
) -> TTSPipeline:
    """Random-weight pipeline (for benchmarks/smoke tests; checkpoints slot
    into the same constructor)."""
    acoustic = SAMBERTAcousticModel(cfg.acoustic_model, dtype=dtype)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    ph = jnp.zeros((1, 8), jnp.int32)
    mel = jnp.zeros((1, 16, cfg.audio.n_mels))
    dur = jnp.full((1, 8), 2, jnp.int32)
    acoustic_params = acoustic.init(k1, ph, ph, ph, mel, dur)
    gen = HiFiGANGenerator(cfg.vocoder.generator, dtype=dtype)
    gen_params = gen.init(k2, jnp.zeros((1, cfg.audio.n_mels, 8)))
    return TTSPipeline(cfg, acoustic_params, gen_params, dtype=dtype)

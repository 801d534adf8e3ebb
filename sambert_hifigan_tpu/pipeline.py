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

from .config import TTSConfig
from .models.acoustic_model import SAMBERTAcousticModel, acoustic_inference
from .models.hifigan import HiFiGANGenerator
from .text.frontend import FrontEnd, pick_bucket


class TTSPipeline:
    def __init__(
        self,
        cfg: TTSConfig,
        acoustic_params,
        generator_params,
        dtype=jnp.float32,
    ):
        self.cfg = cfg
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

                @jax.jit
                def fn(params, mel):  # params unused; fused holds the weights
                    return fused(mel)

            else:

                @jax.jit
                def fn(params, mel):
                    return self.generator.apply(params, mel)

            self._vocode_cache[tfrm] = fn
        return self._vocode_cache[tfrm]

    def warmup(self, max_frames: Optional[int] = None) -> None:
        """Pre-compile every (phoneme bucket, frame bucket) pair so first-user
        requests never pay compile latency (serving deployments call this at
        startup).  With max_frames given, only that frame bucket compiles."""
        frame_buckets = (
            [max_frames] if max_frames else list(self.cfg.runtime.frame_buckets)
        )
        for tph in self.cfg.runtime.phoneme_buckets:
            text = "预" * max(1, tph - 2)  # fills the bucket exactly with BOS/EOS
            for tfrm in frame_buckets:
                out = self.text_to_mel([text], max_frames=tfrm)
                self.vocode(out.mel_pred)

    # ---- public API ----------------------------------------------------------

    def text_to_mel(
        self,
        texts: List[str],
        duration_scale: float = 1.0,
        pitch_shift: float = 0.0,
        energy_scale: float = 1.0,
        max_frames: Optional[int] = None,
    ):
        feat = self.frontend.batch_forward(texts)
        tph = pick_bucket(feat.ph_ids.shape[1], self.cfg.runtime.phoneme_buckets)
        feat = self.frontend.batch_forward(texts, pad_to=tph)
        if max_frames is None:
            # worst-case frame budget estimate: scale-adjusted upper bound
            est = int(tph * 12 * max(duration_scale, 1.0))
            max_frames = pick_bucket(
                min(est, max(self.cfg.runtime.frame_buckets)),
                self.cfg.runtime.frame_buckets,
            )
        fn = self._acoustic_fn(tph, max_frames)
        out = fn(
            self.acoustic_params,
            jnp.asarray(feat.ph_ids),
            jnp.asarray(feat.tone_ids),
            jnp.asarray(feat.boundary_ids),
            jnp.asarray(feat.phoneme_mask),
            jnp.float32(duration_scale),
            jnp.float32(pitch_shift),
            jnp.float32(energy_scale),
        )
        return out

    def vocode(self, mel_btc: jnp.ndarray) -> jnp.ndarray:
        """mel [B, T, n_mels] -> wav [B, 1, T * hop].  The single orientation
        seam: transpose to the vocoder's [B, n_mels, T]."""
        mel = jnp.swapaxes(mel_btc, 1, 2)
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
        out = self.text_to_mel(
            [text], duration_scale, pitch_shift, energy_scale
        )
        wav = self.vocode(out.mel_pred)  # [1, 1, maxF * hop]
        # one combined host transfer (each device->host fetch pays a full
        # roundtrip; on tunneled setups that dominates warm latency)
        wav_np, total = jax.device_get((wav[0, 0], out.total_frames[0]))
        n_frames = min(int(total), out.mel_pred.shape[1])
        return np.asarray(wav_np[: n_frames * self.hop])

    def synthesize_batch(self, texts: List[str], **controls) -> List[np.ndarray]:
        out = self.text_to_mel(texts, **controls)
        wav = self.vocode(out.mel_pred)
        wavs = []
        for i in range(len(texts)):
            n = int(jnp.minimum(out.total_frames[i], out.mel_pred.shape[1]))
            wavs.append(np.asarray(wav[i, 0, : n * self.hop]))
        return wavs

    # ---- streaming -----------------------------------------------------------

    def stream(
        self,
        text: str,
        chunk_frames: int = 32,
        context_frames: int = 16,
        **controls,
    ) -> Iterator[np.ndarray]:
        """Yield waveform chunks of chunk_frames * hop samples (last chunk may
        be shorter).  Each chunk is vocoded from its mel window plus
        context_frames margin on each side; the margins are discarded, so with
        enough context each chunk equals the corresponding slice of the full
        vocoding (design.md:799-824's overlap-add buffer, made exact)."""
        out = self.text_to_mel([text], **controls)
        n_frames = int(jnp.minimum(out.total_frames[0], out.mel_pred.shape[1]))
        mel = out.mel_pred  # [1, maxF, n_mels]; frames >= n_frames are zeros
        window = chunk_frames + 2 * context_frames
        vocode = self._vocode_fn(window)
        for start in range(0, n_frames, chunk_frames):
            # Never extend the window left of frame 0: a zero MEL frame is not
            # the same as conv-internal zero padding (conv_pre's bias colors
            # it), so the first window aligns with the true signal edge and
            # discards less on the left.  To the right, padded mel frames ARE
            # zeros in the one-shot path too, so zero-padding there is exact.
            lo = max(0, start - context_frames)
            hi = lo + window
            pad_hi = max(0, hi - mel.shape[1])
            seg = mel[:, lo : min(hi, mel.shape[1]), :]
            if pad_hi:
                seg = jnp.pad(seg, ((0, 0), (0, pad_hi), (0, 0)))
            wav = vocode(self.generator_params, jnp.swapaxes(seg, 1, 2))
            s = (start - lo) * self.hop
            e = s + chunk_frames * self.hop
            chunk = np.asarray(wav[0, 0, s:e])
            valid = min(chunk_frames, n_frames - start) * self.hop
            yield chunk[:valid]


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

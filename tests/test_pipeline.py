"""End-to-end pipeline tests: text -> mel -> wav, prosody controls,
streaming == full synthesis."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from sambert_hifigan_tpu.config import (
    AcousticModelConfig,
    DecoderConfig,
    EncoderConfig,
    GeneratorConfig,
    RuntimeConfig,
    TTSConfig,
    VocoderConfig,
)
from sambert_hifigan_tpu.pipeline import TTSPipeline, build_pipeline_from_random_init

HOP = 256


@pytest.fixture(scope="module")
def pipeline():
    cfg = TTSConfig()
    cfg = dataclasses.replace(
        cfg,
        acoustic_model=AcousticModelConfig(
            d_model=32,
            encoder=EncoderConfig(n_layers=1, n_heads=4, d_ff=64),
            decoder=DecoderConfig(n_layers=1, n_heads=4, d_ff=64, max_len=512),
        ),
        vocoder=VocoderConfig(
            generator=GeneratorConfig(
                upsample_initial_channel=32,
                resblock_kernel_sizes=(3,),
                resblock_dilation_sizes=((1, 3),),
            )
        ),
        runtime=RuntimeConfig(
            phoneme_buckets=(16, 32), frame_buckets=(64, 128, 256)
        ),
    )
    return build_pipeline_from_random_init(cfg, seed=0)


class TestSynthesize:
    def test_text_to_wav(self, pipeline):
        wav = pipeline.synthesize("你好世界")
        assert wav.ndim == 1
        assert wav.shape[0] % HOP == 0
        assert wav.shape[0] > 0
        assert np.isfinite(wav).all()
        assert np.abs(wav).max() <= 1.0

    def test_wav_length_matches_total_frames(self, pipeline):
        out = pipeline.text_to_mel(["今天天气真好"])
        wav = pipeline.synthesize("今天天气真好")
        n = int(min(out.total_frames[0], out.mel_pred.shape[1]))
        assert wav.shape[0] == n * HOP

    def test_batch(self, pipeline):
        wavs = pipeline.synthesize_batch(["你好", "今天天气真好呀"])
        assert len(wavs) == 2
        # different text lengths -> different audio lengths (usually)
        assert all(w.shape[0] % HOP == 0 for w in wavs)

    def test_duration_scale_changes_length(self, pipeline):
        slow = pipeline.synthesize("你好世界", duration_scale=2.0)
        fast = pipeline.synthesize("你好世界", duration_scale=0.5)
        assert slow.shape[0] > fast.shape[0]

    def test_pitch_and_energy_controls_change_audio(self, pipeline):
        base = pipeline.synthesize("你好世界")
        shifted = pipeline.synthesize("你好世界", pitch_shift=100.0)
        scaled = pipeline.synthesize("你好世界", energy_scale=0.5)
        assert base.shape == shifted.shape  # duration unchanged
        assert not np.allclose(base, shifted)
        assert not np.allclose(base, scaled)

    def test_jit_cache_reused(self, pipeline):
        pipeline.synthesize("abc")
        n_before = len(pipeline._infer_cache)
        pipeline.synthesize("xyz")  # same bucket -> no new compile
        assert len(pipeline._infer_cache) == n_before


class TestStreaming:
    def test_stream_concatenation_matches_full(self, pipeline):
        text = "今天天气真好呀朋友"
        full = pipeline.synthesize(text)
        chunks = list(pipeline.stream(text, chunk_frames=16, context_frames=16))
        streamed = np.concatenate(chunks)
        assert streamed.shape == full.shape
        # with full context margins, interior samples match the one-shot path
        np.testing.assert_allclose(streamed, full, atol=5e-3)

    def test_chunk_sizes(self, pipeline):
        chunks = list(pipeline.stream("你好世界", chunk_frames=8))
        assert all(c.shape[0] == 8 * HOP for c in chunks[:-1])
        assert sum(c.shape[0] for c in chunks) % HOP == 0

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


class TestFrameBudgetOverflow:
    """Round-1 VERDICT finding: durations exceeding the estimated frame
    bucket were silently truncated.  Now the pipeline re-dispatches to a
    larger bucket, and warns when even the largest cannot fit."""

    @pytest.fixture(scope="class")
    def overflow_pipeline(self, pipeline):
        """Same tiny models, but with a 512 top bucket and a duration
        predictor pinned to exp(3.5) ~ 33 frames/phoneme, so the tph*12
        estimate (bucket 256) underestimates on longer texts."""
        import jax

        params = jax.tree.map(lambda x: x, pipeline.acoustic_params)
        lin = params["params"]["variance_adaptor"]["duration_predictor"]["linear"]
        lin["kernel"] = jnp.zeros_like(lin["kernel"])
        lin["bias"] = jnp.full_like(lin["bias"], 3.5)
        cfg = dataclasses.replace(
            pipeline.cfg,
            runtime=RuntimeConfig(
                phoneme_buckets=(16, 32), frame_buckets=(64, 128, 256, 512)
            ),
        )
        return TTSPipeline(cfg, params, pipeline.generator_params)

    def test_rebuckets_instead_of_truncating(self, overflow_pipeline):
        # 9 chars + BOS/EOS = 11 phonemes * ~33 frames ~ 365 frames:
        # est picks bucket 256, true total needs 512
        text = "今天天气真好呀朋友"
        out = overflow_pipeline.text_to_mel([text])
        total = int(out.total_frames[0])
        assert total > 256, "test premise: durations exceed the estimate"
        assert out.mel_pred.shape[1] == 512  # re-dispatched, not truncated
        wav = overflow_pipeline.synthesize(text)
        assert wav.shape[0] == total * HOP

    def test_warns_when_beyond_largest_bucket(self, overflow_pipeline):
        import warnings as _w

        text = "今天天气真好呀朋友" * 2  # ~20 phonemes * 33 ~ 660 > 512
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            out = overflow_pipeline.text_to_mel([text])
        assert any("truncated" in str(c.message) for c in caught)
        assert out.mel_pred.shape[1] == 512


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


class TestBatchBuckets:
    """The batch axis is bucketed like every other axis (round-5 serving
    finding: the micro-batcher's variable fusion widths each triggered a
    fresh XLA compile mid-traffic)."""

    def test_padded_batch_sliced_back(self, pipeline):
        texts = ["你好", "今天天气真好呀", "你好世界"]
        wavs = pipeline.synthesize_batch(texts)  # n=3 pads to bucket 4
        ref = pipeline.synthesize_batch(texts + [texts[-1]])  # explicit 4
        assert len(wavs) == 3 and len(ref) == 4
        for w, r in zip(wavs, ref):
            np.testing.assert_array_equal(w, r)

    def test_warmup_covers_stream_and_batch_graphs(self, pipeline):
        # smoke: the serving warmup path (bucket grid + streaming graphs +
        # batch buckets) compiles and runs without error on the tiny model
        pipeline.warmup(max_frames=64, streaming=True, batch_buckets=True)


class TestMeshServing:
    def test_sharded_batch_matches_single_device(self, pipeline):
        """mesh=... serves batches data-parallel; outputs must match the
        unsharded pipeline (same params) to float tolerance."""
        from sambert_hifigan_tpu.parallel.mesh import create_mesh

        mesh = create_mesh()  # 8 virtual CPU devices, data=8
        sharded = TTSPipeline(
            pipeline.cfg,
            pipeline.acoustic_params,
            pipeline.generator_params,
            mesh=mesh,
        )
        texts = ["你好世界", "天气真好", "山水"]  # 3 -> padded to 8 internally
        ref = pipeline.synthesize_batch(texts)
        got = sharded.synthesize_batch(texts)
        assert len(got) == len(texts)
        for r, g in zip(ref, got):
            assert r.shape == g.shape
            np.testing.assert_allclose(r, g, atol=2e-4)

    def test_sharded_single_text(self, pipeline):
        from sambert_hifigan_tpu.parallel.mesh import create_mesh

        sharded = TTSPipeline(
            pipeline.cfg,
            pipeline.acoustic_params,
            pipeline.generator_params,
            mesh=create_mesh(),
        )
        ref = pipeline.synthesize("今天天气真好")
        got = sharded.synthesize("今天天气真好")
        np.testing.assert_allclose(ref, got, atol=2e-4)

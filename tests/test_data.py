"""Data-layer tests: WAV IO roundtrip, F0/energy extraction physics,
dataset end-to-end with feature caching and static-bucket collation."""

import numpy as np
import pytest

import jax.numpy as jnp

from sambert_hifigan_tpu.config import AudioConfig, TTSConfig
from sambert_hifigan_tpu.data.audio import load_mel, load_wav, save_mel, save_wav
from sambert_hifigan_tpu.data.dataset import (
    TTSDataset,
    collate_acoustic,
    read_metadata,
    synthetic_batch,
    vocoder_batches_from_dataset,
)
from sambert_hifigan_tpu.data.features import (
    extract_energy,
    extract_f0,
    uniform_durations,
)

AUDIO = AudioConfig()
SR = AUDIO.sample_rate


def _tone(freq, n=SR, sr=SR, amp=0.5):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestWavIO:
    def test_roundtrip_mono(self, tmp_path):
        wav = _tone(440.0, 8000)
        p = tmp_path / "a.wav"
        save_wav(p, wav, SR)
        loaded, sr = load_wav(p)
        assert sr == SR
        assert loaded.shape == (1, 8000)
        np.testing.assert_allclose(loaded[0], wav, atol=1e-4)

    def test_roundtrip_stereo(self, tmp_path):
        wav = np.stack([_tone(440.0, 4000), _tone(220.0, 4000)])
        p = tmp_path / "s.wav"
        save_wav(p, wav, SR)
        loaded, sr = load_wav(p)
        assert loaded.shape == (2, 4000)
        np.testing.assert_allclose(loaded, wav, atol=1e-4)

    def test_mel_npy_roundtrip(self, tmp_path):
        mel = np.random.default_rng(0).standard_normal((80, 50)).astype(np.float32)
        p = tmp_path / "m.npy"
        save_mel(mel, p)
        np.testing.assert_array_equal(load_mel(p), mel)


class TestF0:
    @pytest.mark.parametrize("freq", [110.0, 220.0, 440.0])
    def test_pure_tone_frequency(self, freq):
        wav = _tone(freq)
        f0, voiced = extract_f0(jnp.asarray(wav), AUDIO)
        f0 = np.asarray(f0)
        voiced = np.asarray(voiced)
        assert f0.shape == (SR // AUDIO.hop_length + 1,)
        # interior frames: voiced and within 2% of the true pitch
        inner = slice(5, -5)
        assert voiced[inner].mean() > 0.9
        got = np.median(f0[inner][voiced[inner]])
        assert abs(got - freq) / freq < 0.02, got

    def test_silence_unvoiced(self):
        wav = np.zeros(SR, np.float32)
        f0, voiced = extract_f0(jnp.asarray(wav), AUDIO)
        assert not bool(np.asarray(voiced).any())
        assert float(np.abs(np.asarray(f0)).sum()) == 0.0

    def test_noise_mostly_unvoiced(self):
        wav = np.random.default_rng(0).standard_normal(SR).astype(np.float32) * 0.1
        _, voiced = extract_f0(jnp.asarray(wav), AUDIO)
        assert np.asarray(voiced).mean() < 0.5

    def test_out_of_range_pitch_rejected(self):
        wav = _tone(50.0)  # below pitch_min=80
        f0, voiced = extract_f0(jnp.asarray(wav), AUDIO)
        # must not report a confident in-band pitch for an out-of-band tone
        v = np.asarray(voiced)
        f = np.asarray(f0)
        assert (f[v] >= 80.0).all() if v.any() else True


class TestEnergy:
    def test_range_and_shape(self):
        wav = _tone(220.0)
        e = np.asarray(extract_energy(jnp.asarray(wav), AUDIO))
        assert e.shape == (SR // AUDIO.hop_length + 1,)
        assert e.min() >= 0.0 and e.max() <= 1.0 + 1e-6
        assert abs(e.max() - 1.0) < 1e-3  # per-utterance normalization

    def test_louder_segment_higher_energy(self):
        quiet = _tone(220.0, 11025, amp=0.1)
        loud = _tone(220.0, 11025, amp=0.9)
        wav = np.concatenate([quiet, loud])
        e = np.asarray(extract_energy(jnp.asarray(wav), AUDIO))
        mid = e.shape[0] // 2
        assert e[5 : mid - 5].mean() < e[mid + 5 : -5].mean()


class TestDurations:
    def test_uniform_sums_exactly(self):
        for np_, nf in [(7, 100), (10, 10), (3, 8)]:
            d = uniform_durations(np_, nf)
            assert d.sum() == nf
            assert d.min() >= nf // np_


class TestDataset:
    @pytest.fixture()
    def dataset(self, tmp_path):
        cfg = TTSConfig()
        wavs = tmp_path / "wavs"
        wavs.mkdir()
        lines = []
        rng = np.random.default_rng(0)
        for i, (freq, dur_s) in enumerate([(220, 0.5), (330, 0.7), (440, 0.4), (550, 0.6)]):
            n = int(SR * dur_s)
            wav = _tone(freq, n) + 0.01 * rng.standard_normal(n).astype(np.float32)
            save_wav(wavs / f"u{i}.wav", wav.astype(np.float32), SR)
            lines.append(f"wavs/u{i}.wav|你好世界测试{i}")
        meta = tmp_path / "metadata.csv"
        meta.write_text("\n".join(lines), encoding="utf-8")
        return TTSDataset(str(meta), cfg)

    def test_metadata_parse(self, dataset):
        assert len(dataset) == 4
        assert dataset.utterances[0].text.startswith("你好")

    def test_bucketed_extraction_matches_unpadded_near_bucket_edge(self, dataset, tmp_path):
        """Wav length just below a bucket multiple (pad < half-window used to
        double-reflect the last frame's window: max-abs mel err ~0.45)."""
        from sambert_hifigan_tpu.data.audio import save_wav
        from sambert_hifigan_tpu.data.dataset import TTSDataset, Utterance
        from sambert_hifigan_tpu.data.features import extract_energy, extract_f0
        from sambert_hifigan_tpu.ops.mel import log_mel_spectrogram

        hop = dataset.audio.hop_length
        n = hop * 64 - 100  # 100-sample pad to the bucket, << n_fft//2
        rng = np.random.default_rng(7)
        wav = (0.3 * rng.standard_normal(n)).astype(np.float32)
        (tmp_path / "wavs").mkdir(exist_ok=True)
        save_wav(tmp_path / "wavs/edge.wav", wav, dataset.audio.sample_rate)
        (tmp_path / "metadata.csv").write_text("wavs/edge.wav|你好\n", encoding="utf-8")
        ds2 = TTSDataset(str(tmp_path / "metadata.csv"), dataset.cfg)
        feats = ds2.load_features(ds2.utterances[0])
        from sambert_hifigan_tpu.data.audio import load_wav

        wav16, _ = load_wav(tmp_path / "wavs/edge.wav")  # 16-bit round trip
        t = n // hop + 1
        mel = np.asarray(
            log_mel_spectrogram(jnp.asarray(wav16[0]), dataset.audio)
        ).T[:t]
        np.testing.assert_allclose(feats["mel"], mel, atol=1e-5, rtol=0)

    def test_bucketed_extraction_matches_unpadded(self, dataset):
        """load_features pads wavs to length buckets (one jit compile per
        bucket, not per utterance); reflect padding makes every true frame
        bit-identical to unpadded extraction."""
        from sambert_hifigan_tpu.data.audio import load_wav
        from sambert_hifigan_tpu.data.features import extract_energy, extract_f0
        from sambert_hifigan_tpu.ops.mel import log_mel_spectrogram

        utt = dataset.utterances[1]
        feats = dataset.load_features(utt)
        wav, _ = load_wav(dataset.root / utt.wav_path)
        wav = jnp.asarray(wav[0])
        t = int(wav.shape[-1]) // dataset.audio.hop_length + 1
        mel = np.asarray(log_mel_spectrogram(wav, dataset.audio)).T[:t]
        f0, _ = extract_f0(wav, dataset.audio)
        energy = np.asarray(extract_energy(wav, dataset.audio))[:t]
        # Same math, different compiled shape: XLA may reassociate
        # reductions, so agreement is ULP-level, not bitwise.
        np.testing.assert_allclose(feats["mel"], mel, atol=1e-5, rtol=0)
        np.testing.assert_allclose(feats["f0"], np.asarray(f0)[:t], atol=1e-3, rtol=0)
        np.testing.assert_allclose(feats["energy"], energy, atol=1e-6)

    def test_features_and_cache(self, dataset):
        f1 = dataset.load_features(dataset.utterances[0])
        assert f1["mel"].shape[1] == 80
        t = f1["mel"].shape[0]
        assert f1["f0"].shape == (t,)
        assert f1["energy"].shape == (t,)
        assert f1["dur"].sum() == t  # durations cover every frame
        assert dataset._cache_key(dataset.utterances[0]).exists()
        f2 = dataset.load_features(dataset.utterances[0])  # cache hit
        np.testing.assert_array_equal(f1["mel"], f2["mel"])

    def test_acoustic_batches_static_buckets(self, dataset):
        cfg = dataset.cfg
        batches = list(dataset.batches(batch_size=2, seed=0))
        assert len(batches) == 2
        for b in batches:
            assert b["ph_ids"].shape[1] in cfg.runtime.phoneme_buckets
            assert b["mel_gt"].shape[1] in cfg.runtime.frame_buckets
            assert b["mel_gt"].shape[0] == 2
            assert (b["dur_gt"].sum(axis=1) == b["frame_lengths"]).all()
            assert b["phoneme_mask"].any(axis=1).all()

    def test_vocoder_batches(self, dataset):
        pairs = list(vocoder_batches_from_dataset(dataset, batch_size=2, segment_frames=16))
        assert len(pairs) >= 1
        mel, wav = pairs[0]
        assert mel.shape == (2, 80, 16)
        assert wav.shape == (2, 1, 16 * 256)


def test_synthetic_batch_invariants():
    cfg = TTSConfig()
    b = synthetic_batch(cfg, batch=3, tph=8, tfrm=32)
    assert (b["dur_gt"].sum(axis=1) <= 32).all()
    assert (b["dur_gt"].sum(axis=1) == b["frame_lengths"]).all()
    assert b["mel_gt"].shape == (3, 32, 80)

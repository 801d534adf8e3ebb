"""Native C++ data loader tests: decode parity vs the numpy WAV reader,
prefetcher completeness, graceful handling of bad files."""

import numpy as np
import pytest

from sambert_hifigan_tpu.data.audio import load_wav, save_wav
from sambert_hifigan_tpu.data.native_loader import (
    NativePrefetcher,
    load_wav_native,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native loader did not build"
)


def _tone(freq, n=8000, sr=22050, amp=0.5, ch=1):
    t = np.arange(n) / sr
    x = (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    return np.stack([x * (i + 1) / ch for i in range(ch)]) if ch > 1 else x


class TestNativeDecode:
    def test_parity_with_numpy_reader_mono(self, tmp_path):
        wav = _tone(440.0)
        p = tmp_path / "a.wav"
        save_wav(p, wav, 22050)
        ours, sr1 = load_wav_native(p)
        ref, sr2 = load_wav(p)
        assert sr1 == sr2 == 22050
        np.testing.assert_array_equal(ours, ref)

    def test_parity_stereo(self, tmp_path):
        wav = _tone(220.0, ch=2)
        p = tmp_path / "s.wav"
        save_wav(p, wav, 16000)
        ours, sr = load_wav_native(p)
        ref, _ = load_wav(p)
        assert sr == 16000 and ours.shape == (2, 8000)
        np.testing.assert_array_equal(ours, ref)

    def test_bad_bytes_raise(self):
        from sambert_hifigan_tpu.data.native_loader import decode_wav_bytes

        with pytest.raises(ValueError):
            decode_wav_bytes(b"not a wav file at all, sorry!")


class TestPrefetcher:
    def test_all_files_delivered(self, tmp_path):
        paths = []
        for i in range(10):
            p = tmp_path / f"u{i}.wav"
            save_wav(p, _tone(200.0 + 50 * i, n=4000 + 100 * i), 22050)
            paths.append(str(p))
        got = {}
        pf = NativePrefetcher(paths, n_threads=3, capacity=4)
        for idx, wav, sr in pf:
            got[idx] = (wav.shape, sr)
        pf.close()
        assert sorted(got) == list(range(10))
        for i in range(10):
            assert got[i] == ((1, 4000 + 100 * i), 22050)

    def test_undecodable_files_skipped(self, tmp_path):
        good = tmp_path / "good.wav"
        save_wav(good, _tone(300.0), 22050)
        bad = tmp_path / "bad.wav"
        bad.write_bytes(b"garbage")
        missing = tmp_path / "missing.wav"
        pf = NativePrefetcher([str(good), str(bad), str(missing)], n_threads=2)
        results = list(pf)
        pf.close()
        assert len(results) == 1
        assert results[0][0] == 0

    def test_decode_parity_through_prefetcher(self, tmp_path):
        p = tmp_path / "x.wav"
        wav = _tone(330.0)
        save_wav(p, wav, 22050)
        pf = NativePrefetcher([str(p)])
        [(idx, got, sr)] = list(pf)
        pf.close()
        ref, _ = load_wav(p)
        np.testing.assert_array_equal(got, ref)

"""CLI tool smoke tests (the fast, host-side scripts; the trainer and
inference CLIs are exercised end-to-end by tests/test_e2e_train_to_synth.py
and tests/test_pipeline.py through their underlying APIs)."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent


def _make_wav(tmp_path, name="t.wav", freq=220.0, n=11025):
    from sambert_hifigan_tpu.data.audio import save_wav

    t = np.arange(n) / 22050
    wav = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    p = tmp_path / name
    save_wav(p, wav, 22050)
    return p


def _run(args):
    return subprocess.run(
        [sys.executable, *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=600,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "SAMBERT_FORCE_CPU": "1",
             "HOME": "/root"},
    )


class TestPlotAudio:
    def test_renders_panels(self, tmp_path):
        wav = _make_wav(tmp_path)
        out = tmp_path / "plot.png"
        r = _run(["scripts/plot_audio.py", str(wav), "--output", str(out),
                  "--panels", "waveform,mel,f0,energy"])
        assert r.returncode == 0, r.stderr[-2000:]
        assert out.exists() and out.stat().st_size > 10_000

    def test_phase_and_diagram_panels(self, tmp_path):
        """Panels ported from the reference's plot_new.py / plot_all_diagrams.py
        (phase spectra, percentile-clipped linear views, dB-re-max views)."""
        wav = _make_wav(tmp_path)
        out = tmp_path / "plot_all.png"
        r = _run(["scripts/plot_audio.py", str(wav), "--output", str(out),
                  "--panels", "channels,spec_mag,spec_db,phase,mel_power,mel_db",
                  "--seconds", "0.4"])
        assert r.returncode == 0, r.stderr[-2000:]
        assert out.exists() and out.stat().st_size > 10_000


class TestEvaluate:
    def test_wav_comparison(self, tmp_path):
        a = _make_wav(tmp_path, "a.wav", 220.0)
        b = _make_wav(tmp_path, "b.wav", 440.0)
        r = _run(["scripts/evaluate.py", str(a), str(b)])
        assert r.returncode == 0, r.stderr[-2000:]
        assert "mel-MAE:" in r.stdout and "MCD:" in r.stdout
        # identical files -> ~zero
        r2 = _run(["scripts/evaluate.py", str(a), str(a)])
        mae = float(r2.stdout.split("mel-MAE:")[1].split()[0])
        assert mae < 1e-6

    def test_mel_npy_comparison(self, tmp_path):
        from sambert_hifigan_tpu.data.audio import save_mel

        mel = np.random.default_rng(0).standard_normal((80, 30)).astype(np.float32)
        pa, pb = tmp_path / "a.npy", tmp_path / "b.npy"
        save_mel(mel, pa)
        save_mel(mel + 0.5, pb)
        r = _run(["scripts/evaluate.py", str(pa), str(pb)])
        assert r.returncode == 0, r.stderr[-2000:]
        mae = float(r.stdout.split("mel-MAE:")[1].split()[0])
        assert mae == pytest.approx(0.5, abs=1e-4)


class TestProfile:
    def test_captures_xplane_trace(self, tmp_path):
        """scripts/profile.py writes a TensorBoard-profile xplane trace of a
        warmed surface (the TPU-native replacement for the reference's
        print-based shape logging, SURVEY 5.1)."""
        out = tmp_path / "prof"
        r = _run(["scripts/profile.py", "--surface", "vocoder", "--tiny",
                  "--max-frames", "16", "--reps", "1",
                  "--output", str(out)])
        assert r.returncode == 0, r.stderr[-2000:]
        traces = list(out.rglob("*.xplane.pb"))
        assert traces and traces[0].stat().st_size > 0

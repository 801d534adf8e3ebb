#!/usr/bin/env python
"""Generate a deterministic synthetic speech-like corpus for training demos.

Usage:
  python scripts/make_demo_dataset.py --output data/demo [--n 64] [--seed 0]

Every character's acoustic realization — duration, F0, timbre (harmonic vs
fricative noise), and amplitude — is a pure function of the character, the
same way the frontend's pseudo-G2P maps characters to ids (reference:
models/frontend.py:89-133).  Text therefore genuinely predicts the audio:
the CTC aligner has boundaries to find, the duration/pitch/energy predictors
have structure to learn, and an overfit run converges to near-exact
round-trip mel reconstruction.  Output is metadata.csv (`wav_path|text` per
line, the layout TTSDataset reads) plus 16-bit PCM wavs.

The corpus is NOT speech (no dataset ships with the reference either); it is
the minimal signal family with speech's *statistical interface*: per-token
durations 90-270 ms, F0 in the pitch predictor's [80, 600] Hz range, voiced
harmonic segments mixed with unvoiced noise segments, word-length pauses.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

SR = 22050
# Small alphabet so a 64-utterance corpus sees every character many times.
ALPHABET = "你好世界天地人山水火风雨花鸟虫鱼春夏秋冬东南西北"


def char_params(c: str) -> dict:
    """Deterministic per-character acoustics (mirrors the frontend's ord-hash
    mapping: same char -> same ids -> same sound, every time)."""
    o = ord(c)
    return {
        "dur_s": 0.09 + (o % 7) * 0.03,            # 90-270 ms
        "voiced": (o % 5) != 0,
        "f0": 110.0 * 2.0 ** ((o % 13) / 12.0),    # 110-220 Hz
        "amp": 0.35 + 0.45 * (((o // 7) % 5) / 4.0),
        "bright": 0.3 + 0.7 * (((o // 3) % 4) / 3.0),  # harmonic rolloff
    }


def render_char(c: str) -> np.ndarray:
    p = char_params(c)
    n = int(round(p["dur_s"] * SR))
    t = np.arange(n) / SR
    if p["voiced"]:
        # Harmonic stack with mild vibrato; rolloff set by "brightness".
        vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.5 * t)
        phase = 2 * np.pi * np.cumsum(p["f0"] * vib) / SR
        x = np.zeros(n)
        for k in range(1, 7):
            x += (p["bright"] ** (k - 1) / k) * np.sin(k * phase)
        x /= np.max(np.abs(x)) + 1e-9
    else:
        # Fricative: char-seeded band-shaped noise (reproducible).
        rng = np.random.default_rng(ord(c))
        x = rng.standard_normal(n)
        x = np.convolve(x, np.ones(5) / 5.0, mode="same")  # crude lowpass
        x /= np.max(np.abs(x)) + 1e-9
        x *= 0.6
    # 15 ms raised-cosine fades kill clicks at segment joins.
    f = min(int(0.015 * SR), n // 2)
    env = np.ones(n)
    ramp = 0.5 - 0.5 * np.cos(np.pi * np.arange(f) / f)
    env[:f] = ramp
    env[-f:] = ramp[::-1]
    return (p["amp"] * env * x).astype(np.float32)


def render_text(text: str) -> np.ndarray:
    segs = []
    for i, c in enumerate(text):
        segs.append(render_char(c))
        if (i + 1) % 4 == 0 and i + 1 < len(text):
            segs.append(np.zeros(int(0.05 * SR), dtype=np.float32))  # pause
    return np.concatenate(segs)


def main():
    from sambert_hifigan_tpu.data.audio import save_wav

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--output", type=str, default="data/demo")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    out = Path(args.output)
    (out / "wavs").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    lines = []
    total_s = 0.0
    for i in range(args.n):
        length = int(rng.integers(4, 11))
        text = "".join(rng.choice(list(ALPHABET), size=length))
        wav = render_text(text)
        rel = f"wavs/utt_{i:04d}.wav"
        save_wav(out / rel, wav, SR)
        lines.append(f"{rel}|{text}")
        total_s += len(wav) / SR
    (out / "metadata.csv").write_text("\n".join(lines) + "\n", encoding="utf-8")
    print(f"wrote {args.n} utterances ({total_s:.1f}s audio) to {out}")


if __name__ == "__main__":
    main()

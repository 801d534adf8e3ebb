#!/usr/bin/env python
"""Generate a deterministic synthetic speech-like corpus for training demos.

Usage:
  python scripts/make_demo_dataset.py --output data/demo [--n 64] [--seed 0]
  python scripts/make_demo_dataset.py --output data/demo_v2 --n 384 \
      --speaker-var 1.0     # varied corpus for adversarial training

--speaker-var > 0 adds per-utterance "speaker" variation (F0 scale,
brightness, amplitude, noise floor) on top of the per-character acoustics.
A 70M-param MSD+MPD stack memorizes 64 identical-speaker utterances in ~2k
steps (observed in the r02 demo run) and stops providing useful gradients;
per-utterance variation keeps real crops from repeating so the adversarial
recipe can actually help.

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


def speaker_params(rng: np.random.Generator, amount: float) -> dict:
    """Per-utterance 'speaker': smooth multiplicative deviations from the
    per-character defaults, scaled by `amount` (0 = the legacy fixed voice)."""
    return {
        "f0_scale": 2.0 ** (amount * rng.uniform(-0.35, 0.35)),
        "bright_scale": 1.0 + amount * rng.uniform(-0.35, 0.35),
        "amp_scale": 1.0 + amount * rng.uniform(-0.25, 0.25),
        "noise_floor": amount * rng.uniform(0.0, 0.02),
    }


_NO_SPEAKER = {"f0_scale": 1.0, "bright_scale": 1.0, "amp_scale": 1.0,
               "noise_floor": 0.0}


def render_char(c: str, spk: dict = _NO_SPEAKER) -> np.ndarray:
    p = char_params(c)
    p = dict(
        p,
        f0=min(p["f0"] * spk["f0_scale"], 580.0),
        bright=float(np.clip(p["bright"] * spk["bright_scale"], 0.15, 1.0)),
        amp=float(np.clip(p["amp"] * spk["amp_scale"], 0.1, 0.95)),
    )
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


def render_text(
    text: str, spk: dict = _NO_SPEAKER, rng: np.random.Generator | None = None
) -> np.ndarray:
    segs = []
    for i, c in enumerate(text):
        segs.append(render_char(c, spk))
        if (i + 1) % 4 == 0 and i + 1 < len(text):
            segs.append(np.zeros(int(0.05 * SR), dtype=np.float32))  # pause
    wav = np.concatenate(segs)
    if spk["noise_floor"] > 0 and rng is not None:
        wav = wav + spk["noise_floor"] * rng.standard_normal(len(wav)).astype(
            np.float32
        )
    return wav.astype(np.float32)


def main():
    from sambert_hifigan_tpu.data.audio import save_wav

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--output", type=str, default="data/demo")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--speaker-var", type=float, default=0.0,
                    help="per-utterance voice variation amount (0 = off)")
    args = ap.parse_args()

    out = Path(args.output)
    (out / "wavs").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    lines = []
    total_s = 0.0
    for i in range(args.n):
        length = int(rng.integers(4, 11))
        text = "".join(rng.choice(list(ALPHABET), size=length))
        spk = speaker_params(rng, args.speaker_var)
        wav = render_text(text, spk, rng)
        rel = f"wavs/utt_{i:04d}.wav"
        save_wav(out / rel, wav, SR)
        lines.append(f"{rel}|{text}")
        total_s += len(wav) / SR
    (out / "metadata.csv").write_text("\n".join(lines) + "\n", encoding="utf-8")
    print(f"wrote {args.n} utterances ({total_s:.1f}s audio) to {out}")


if __name__ == "__main__":
    main()

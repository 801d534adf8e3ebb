#!/usr/bin/env python
"""Generate a small synthetic-speech corpus for end-to-end training demos.

The reference ships no dataset and no trainer (SURVEY.md section 0); to
DEMONSTRATE that this framework's training actually converges (not just that
the step functions run), this script synthesizes an audible corpus with the
statistical structure TTS training needs:

  * each phoneme id maps to a fixed "vowel" (2-formant harmonic tone) or
    "consonant" (shaped noise burst) prototype, so mel frames are predictable
    from phoneme identity;
  * per-utterance pitch contours vary (declination + jitter), durations vary
    per phoneme instance (log-normal), boundaries insert short silences —
    so duration/pitch/energy predictors have real, non-degenerate targets;
  * text is drawn from the same pseudo-G2P id space the FrontEnd produces
    (reference: models/frontend.py:35-133 semantics).

Usage:
  python scripts/make_toy_dataset.py --out data/toy --n 32 [--seed 0]

Writes out/wavs/*.wav (16-bit, 22.05 kHz) and out/metadata.csv
(`wav_path|text` per line, design.md:737-757 format).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

SR = 22050


def phoneme_prototype(ph_id: int):
    """Deterministic acoustic identity for a phoneme id (pure ord arithmetic)."""
    is_vowel = (ph_id % 3) != 0
    if is_vowel:
        f1 = 300.0 + (ph_id * 37 % 500)
        f2 = 900.0 + (ph_id * 61 % 1600)
        return ("vowel", f1, f2)
    center = 1500.0 + (ph_id * 97 % 4000)
    width = 300.0 + (ph_id * 13 % 900)
    return ("noise", center, width)


def synth_phoneme(kind_params, n: int, f0: np.ndarray, rng) -> np.ndarray:
    kind, a, b = kind_params
    t = np.arange(n) / SR
    env = np.minimum(1.0, np.minimum(np.arange(n), n - 1 - np.arange(n)) / (0.01 * SR))
    if kind == "vowel":
        phase = 2 * np.pi * np.cumsum(f0) / SR
        sig = 0.5 * np.sin(phase)
        sig += 0.3 * np.sin(2 * phase) * np.sin(2 * np.pi * a * t)
        sig += 0.2 * np.sin(3 * phase) * np.sin(2 * np.pi * b * t)
        sig += 0.25 * np.sin(2 * np.pi * a * t) + 0.15 * np.sin(2 * np.pi * b * t)
    else:
        noise = rng.standard_normal(n)
        # crude bandpass: modulate white noise onto the center frequency
        lp = np.convolve(noise, np.ones(8) / 8, mode="same")
        sig = 0.4 * lp * np.cos(2 * np.pi * a * t)
    return (sig * env).astype(np.float32)


def synth_utterance(text: str, rng) -> np.ndarray:
    from sambert_hifigan_tpu.text.frontend import FrontEnd

    fe = FrontEnd()
    ph, tone, bound = fe.text_to_sequence(text)
    base_f0 = rng.uniform(140, 260)
    pieces = [np.zeros(int(0.05 * SR), np.float32)]  # BOS silence
    for i, (p, tn) in enumerate(zip(ph[1:-1], tone[1:-1])):
        dur_s = float(np.exp(rng.normal(np.log(0.12), 0.35)))
        dur_s = min(max(dur_s, 0.05), 0.4)
        n = int(dur_s * SR)
        # pitch: per-tone offset + utterance declination + vibrato
        f0 = base_f0 * (1.0 + 0.08 * tn) * (1.0 - 0.02 * i)
        f0_curve = f0 * (1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * np.arange(n) / SR))
        pieces.append(synth_phoneme(phoneme_prototype(int(p)), n, f0_curve, rng))
        if rng.random() < 0.15:  # occasional word-boundary pause
            pieces.append(np.zeros(int(0.04 * SR), np.float32))
    pieces.append(np.zeros(int(0.05 * SR), np.float32))  # EOS silence
    wav = np.concatenate(pieces)
    wav = 0.8 * wav / (np.abs(wav).max() + 1e-6)
    return wav.astype(np.float32)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--n", type=int, default=32)
    p.add_argument("--min-chars", type=int, default=4)
    p.add_argument("--max-chars", type=int, default=12)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from sambert_hifigan_tpu.data.audio import save_wav

    rng = np.random.default_rng(args.seed)
    out = Path(args.out)
    (out / "wavs").mkdir(parents=True, exist_ok=True)
    # a small repeating "alphabet" so every phoneme id is seen many times
    alphabet = "的一是了我不人在他有这上们来到时大地为子中你说生国年着就那"
    lines = []
    for i in range(args.n):
        n_chars = int(rng.integers(args.min_chars, args.max_chars + 1))
        text = "".join(rng.choice(list(alphabet), n_chars))
        wav = synth_utterance(text, rng)
        rel = f"wavs/utt_{i:04d}.wav"
        save_wav(str(out / rel), wav, SR)
        lines.append(f"{rel}|{text}")
        print(f"[{i + 1}/{args.n}] {rel}: {len(wav) / SR:.2f}s  '{text}'")
    (out / "metadata.csv").write_text("\n".join(lines) + "\n", encoding="utf-8")
    print(f"wrote {args.n} utterances under {out}")


if __name__ == "__main__":
    main()

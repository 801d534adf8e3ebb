"""Dataset + static-shape batching.

The reference specs a metadata.csv-driven dataset (reference:
.kiro/specs/tts-sam-bert-hifigan/design.md:737-757, tasks.md:404-409 — never
implemented).  Format: one `wav_path|text` pair per line, LJSpeech-style.

TPU-first batching: every batch is padded to a static (Tph bucket, Tfrm
bucket) pair so each (bucket_ph, bucket_frm) combination compiles exactly
once; masks carry true lengths.  The loader precomputes log-mel / F0 / energy
with the SAME shared ops used by the losses (the mel-consistency invariant)
and caches features as .npy next to the audio.

Two entry points:
  TTSDataset       — files on disk, feature cache, bucketed batch iterator
  synthetic_batch  — deterministic in-memory batch for tests/smoke training
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import TTSConfig
from ..ops.mel import log_mel_spectrogram
from ..text.frontend import FrontEnd, pick_bucket
from .audio import load_wav
from .features import extract_energy, extract_f0, uniform_durations


@dataclass
class Utterance:
    wav_path: str
    text: str


def read_metadata(path: str) -> List[Utterance]:
    """Parse metadata.csv: `wav_path|text` per line (design.md:737-757)."""
    utts = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("|", 1)
            if len(parts) != 2:
                raise ValueError(f"malformed metadata line: {line!r}")
            utts.append(Utterance(wav_path=parts[0], text=parts[1]))
    return utts


def _reflect_pad_to(x: np.ndarray, target: int) -> np.ndarray:
    """Right-pad 1-D x to `target` samples by repeated edge-free reflection
    (numpy 'reflect' caps each application at len-1 samples)."""
    while x.shape[-1] < target:
        pad = min(target - x.shape[-1], x.shape[-1] - 1)
        if pad <= 0:  # degenerate 1-sample signal
            return np.pad(x, (0, target - x.shape[-1]))
        x = np.pad(x, (0, pad), mode="reflect")
    return x


class TTSDataset:
    """Loads wavs, extracts/caches features, serves static-shape batches."""

    def __init__(
        self,
        metadata_path: str,
        cfg: TTSConfig,
        root: Optional[str] = None,
        cache_dir: Optional[str] = None,
    ):
        self.cfg = cfg
        self.audio = cfg.audio
        self.root = Path(root) if root else Path(metadata_path).parent
        self.utterances = read_metadata(metadata_path)
        self.frontend = FrontEnd(
            cfg.acoustic_model.frontend.vocab_size,
            cfg.acoustic_model.frontend.tone_size,
            cfg.acoustic_model.frontend.boundary_size,
        )
        self.cache_dir = Path(cache_dir) if cache_dir else self.root / "feature_cache"
        self._extract_jit = jax.jit(self._extract_features)
        # In-memory feature memo on top of the disk cache: trainers call
        # load_features for every utterance every step, and per-step npz
        # reads on the (single-core) host throttle the TPU step rate.
        # Byte-bounded; once full, later utterances keep using the disk cache.
        self._mem_cache: Dict[str, Dict[str, np.ndarray]] = {}
        self._mem_bytes = 0
        self._mem_limit = int(os.environ.get("SAMBERT_MEM_CACHE_MB", "1024")) << 20

    def _memoize(self, utt: Utterance, feats: Dict[str, np.ndarray], replace: bool = False) -> None:
        if replace and utt.wav_path in self._mem_cache:
            self._mem_bytes -= sum(v.nbytes for v in self._mem_cache[utt.wav_path].values())
        nbytes = sum(v.nbytes for v in feats.values())
        if self._mem_bytes + nbytes <= self._mem_limit:
            # freeze the arrays: cached entries are shared across callers, so
            # an in-place mutation would silently poison later reads
            for v in feats.values():
                v.flags.writeable = False
            self._mem_cache[utt.wav_path] = feats
            self._mem_bytes += nbytes

    def __len__(self) -> int:
        return len(self.utterances)

    # ---- feature extraction -------------------------------------------------

    def _extract_features(self, wav: jnp.ndarray):
        mel = log_mel_spectrogram(wav, self.audio)  # [n_mels, T]
        f0, voiced = extract_f0(wav, self.audio)
        # Raw RMS here; load_features normalizes AFTER slicing to the true
        # frame count so the [0, 1] peak is over real frames, not padding.
        energy = extract_energy(wav, self.audio, normalize=False)
        return mel, f0, voiced, energy

    def _cache_key(self, utt: Utterance) -> Path:
        h = hashlib.sha1(
            (utt.wav_path + repr(dataclasses.astuple(self.audio))).encode()
        ).hexdigest()[:16]
        return self.cache_dir / f"{Path(utt.wav_path).stem}_{h}.npz"

    def _read_wav(self, path) -> tuple:
        """Native C++ decode when available (no-GIL, threaded preprocessing);
        numpy fallback otherwise."""
        from .native_loader import load_wav_native, native_available

        if native_available():
            try:
                return load_wav_native(path)
            except (ValueError, RuntimeError):
                pass
        return load_wav(path)

    def load_features(self, utt: Utterance) -> Dict[str, np.ndarray]:
        mem = self._mem_cache.get(utt.wav_path)
        if mem is not None:
            return dict(mem)  # shallow copy; arrays themselves are frozen
        cache = self._cache_key(utt)
        if cache.exists():
            z = np.load(cache)
            feats = {k: z[k] for k in z.files}
            self._memoize(utt, feats)
            return feats
        wav, sr = self._read_wav(self.root / utt.wav_path)
        if sr != self.audio.sample_rate:
            from ..ops.mel import resample

            wav = np.asarray(resample(jnp.asarray(wav), sr, self.audio.sample_rate))
        wav_mono = wav.mean(axis=0) if wav.shape[0] > 1 else wav[0]
        # Bucket the waveform length so _extract_jit compiles once per bucket,
        # not once per utterance.  Reflect padding reproduces the exact samples
        # the centered STFT's own tail reflection would see, so every true
        # frame matches unpadded extraction (up to ULP-level reassociation
        # differences between the two compiled shapes) — PROVIDED the pad is
        # at least half a window: with a shorter pad the last true frame's
        # window crosses the padded signal's edge and the STFT's internal
        # reflection there reflects already-reflected samples.
        n_true = wav_mono.shape[-1]
        n_frames = n_true // self.audio.hop_length + 1
        bucket = self.audio.hop_length * 64
        half_win = max(self.audio.n_fft, self.audio.win_length) // 2
        target = -(-(n_true + half_win) // bucket) * bucket
        padded = _reflect_pad_to(wav_mono, target)
        mel, f0, voiced, energy = self._extract_jit(jnp.asarray(padded))
        mel = mel[:, :n_frames]
        f0, voiced = f0[:n_frames], voiced[:n_frames]
        rms = np.asarray(energy[:n_frames], np.float32)
        energy = rms / (rms.max() + 1e-8)
        ph, tone, bound = self.frontend.text_to_sequence(utt.text)
        dur = uniform_durations(len(ph), n_frames)
        feats = {
            "mel": np.asarray(mel, np.float32).T,  # [T, n_mels]
            "f0": np.asarray(f0, np.float32),
            "voiced": np.asarray(voiced, bool),
            "energy": np.asarray(energy, np.float32),
            "ph_ids": np.asarray(ph, np.int32),
            "tone_ids": np.asarray(tone, np.int32),
            "boundary_ids": np.asarray(bound, np.int32),
            "dur": dur,
            "wav": wav_mono.astype(np.float32),
        }
        cache.parent.mkdir(parents=True, exist_ok=True)
        np.savez(cache, **feats)
        self._memoize(utt, feats)
        return feats

    # ---- alignment ------------------------------------------------------------

    def compute_alignments(
        self,
        steps: int = 400,
        batch_size: int = 8,
        seed: int = 0,
        verbose: bool = False,
    ) -> List[float]:
        """Replace the uniform-duration bootstrap with learned forced
        alignments: train the corpus CTC aligner (data/aligner.py), Viterbi-
        align every utterance, and rewrite the cached `dur` arrays in place.
        Returns the aligner loss history."""
        from .aligner import ctc_durations, train_ctc_aligner

        feats = [self.load_features(u) for u in self.utterances]
        samples = [(f["mel"], f["ph_ids"]) for f in feats]
        net, params, losses = train_ctc_aligner(
            samples,
            vocab_size=self.cfg.acoustic_model.frontend.vocab_size,
            n_mels=self.audio.n_mels,
            steps=steps,
            batch_size=batch_size,
            seed=seed,
        )
        for utt, f in zip(self.utterances, feats):
            dur = ctc_durations(net, params, f["mel"], f["ph_ids"])
            if dur.sum() != f["mel"].shape[0]:
                raise ValueError(
                    f"{utt.wav_path}: aligner durations sum to {int(dur.sum())}"
                    f" != {f['mel'].shape[0]} frames"
                )
            f = dict(f)
            f["dur"] = dur.astype(np.int32)
            np.savez(self._cache_key(utt), **f)
            self._memoize(utt, f, replace=True)
            if verbose:
                print(f"[align] {utt.wav_path}: dur={dur.tolist()}")
        return losses

    # ---- batching ------------------------------------------------------------

    def batches(
        self,
        batch_size: int,
        seed: int = 0,
        drop_remainder: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Shuffled epochs of acoustic-model batches padded to config buckets."""
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(self.utterances))
        ph_buckets = self.cfg.runtime.phoneme_buckets
        frm_buckets = self.cfg.runtime.frame_buckets
        for i in range(0, len(order) - (batch_size - 1 if drop_remainder else 0), batch_size):
            idx = order[i : i + batch_size]
            feats = [self.load_features(self.utterances[j]) for j in idx]
            yield collate_acoustic(feats, ph_buckets, frm_buckets)


def collate_acoustic(
    feats: Sequence[Dict[str, np.ndarray]],
    ph_buckets: Sequence[int],
    frm_buckets: Sequence[int],
) -> Dict[str, np.ndarray]:
    """Pad a list of utterance features to shared static buckets."""
    b = len(feats)
    tph = pick_bucket(max(len(f["ph_ids"]) for f in feats), ph_buckets)
    tfrm = pick_bucket(max(f["mel"].shape[0] for f in feats), frm_buckets)
    n_mels = feats[0]["mel"].shape[1]
    out = {
        "ph_ids": np.zeros((b, tph), np.int32),
        "tone_ids": np.zeros((b, tph), np.int32),
        "boundary_ids": np.zeros((b, tph), np.int32),
        "dur_gt": np.zeros((b, tph), np.int32),
        "mel_gt": np.zeros((b, tfrm, n_mels), np.float32),
        "pitch_gt": np.zeros((b, tfrm), np.float32),
        "energy_gt": np.zeros((b, tfrm), np.float32),
        "phoneme_mask": np.zeros((b, tph), bool),
        "pitch_mask": np.zeros((b, tfrm), bool),
        "frame_lengths": np.zeros((b,), np.int32),
    }
    for i, f in enumerate(feats):
        np_ = len(f["ph_ids"])
        nf = f["mel"].shape[0]
        out["ph_ids"][i, :np_] = f["ph_ids"]
        out["tone_ids"][i, :np_] = f["tone_ids"]
        out["boundary_ids"][i, :np_] = f["boundary_ids"]
        out["dur_gt"][i, :np_] = f["dur"]
        out["mel_gt"][i, :nf] = f["mel"]
        out["pitch_gt"][i, :nf] = f["f0"]
        out["energy_gt"][i, :nf] = f["energy"]
        out["phoneme_mask"][i, :np_] = True
        out["pitch_mask"][i, :nf] = f["voiced"]
        out["frame_lengths"][i] = nf
    return out


def vocoder_batches_from_dataset(
    ds: TTSDataset,
    batch_size: int,
    segment_frames: int = 32,
    seed: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Vocoder training pairs: random fixed-length (mel segment, wav segment)
    crops — the standard HiFi-GAN recipe, static-shape by construction.

    Yields (mel [B, n_mels, segment_frames], wav [B, 1, segment_frames * hop]).
    """
    rng = np.random.default_rng(seed)
    hop = ds.audio.hop_length
    order = rng.permutation(len(ds.utterances))
    mels, wavs = [], []
    for j in order:
        f = ds.load_features(ds.utterances[j])
        mel = f["mel"]  # [T, n_mels]
        wav = f["wav"]
        t = mel.shape[0]
        if t < segment_frames + 1:
            continue
        start = int(rng.integers(0, t - segment_frames))
        mel_seg = mel[start : start + segment_frames].T  # [n_mels, seg]
        wav_seg = wav[start * hop : (start + segment_frames) * hop]
        if wav_seg.shape[0] < segment_frames * hop:
            wav_seg = np.pad(wav_seg, (0, segment_frames * hop - wav_seg.shape[0]))
        mels.append(mel_seg)
        wavs.append(wav_seg[None, :])
        if len(mels) == batch_size:
            yield np.stack(mels).astype(np.float32), np.stack(wavs).astype(np.float32)
            mels, wavs = [], []


def synthetic_batch(
    cfg: TTSConfig, batch: int = 4, tph: int = 16, tfrm: int = 64, seed: int = 0
) -> Dict[str, np.ndarray]:
    """Deterministic random acoustic batch honoring all invariants
    (sum(dur) <= tfrm, masks consistent).  For tests and smoke training."""
    rng = np.random.default_rng(seed)
    fe = cfg.acoustic_model.frontend
    dur = rng.integers(1, max(2, tfrm // tph), (batch, tph)).astype(np.int32)
    totals = dur.sum(axis=1)
    batch_dict = {
        "ph_ids": rng.integers(4, fe.vocab_size, (batch, tph)).astype(np.int32),
        "tone_ids": rng.integers(0, fe.tone_size, (batch, tph)).astype(np.int32),
        "boundary_ids": rng.integers(0, fe.boundary_size, (batch, tph)).astype(np.int32),
        "dur_gt": dur,
        "mel_gt": rng.standard_normal((batch, tfrm, cfg.audio.n_mels)).astype(np.float32),
        "pitch_gt": rng.uniform(80, 600, (batch, tfrm)).astype(np.float32),
        "energy_gt": rng.uniform(0, 1, (batch, tfrm)).astype(np.float32),
        "phoneme_mask": np.ones((batch, tph), bool),
        "pitch_mask": rng.random((batch, tfrm)) > 0.3,
        "frame_lengths": totals.astype(np.int32),
    }
    return batch_dict

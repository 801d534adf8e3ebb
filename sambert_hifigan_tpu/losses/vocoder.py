"""HiFi-GAN vocoder losses (reference: models/losses.py:335-1026).

LSGAN adversarial terms, feature matching (real fmaps stop-gradiented),
multi-resolution STFT (the reference's "spectral convergence" is actually an
L1 on log magnitudes and its "mag" term an L2 on log magnitudes — replicated
on purpose, see SURVEY.md section 7.3.7b), and mel reconstruction through the
ONE shared log-mel op (the consistency invariant).

Aggregation: every GAN term is MEAN-aggregated over all 8 sub-discriminators
(3 MSD + 5 MPD), the FM term additionally mean-aggregated over layers within
each discriminator first (reference: models/losses.py:487-489, 531-533,
595-623; rationale in MULTI_DISCRIMINATOR_LOSS_AGGREGATION.md).

Three ablation loss modes gate which terms are active
(reference: models/losses.py:376-402, 922-1000):
  mel_only   : L_gen = 45 * L_mel                   (no discriminator training)
  adv_mel    : L_gen = L_adv + 45 * L_mel + L_stft
  adv_mel_fm : L_gen = L_adv + 2 * L_fm + 45 * L_mel + L_stft

Inactive terms are still reported as 0-valued entries in the metrics dict —
reference tests assert the full key schema in every mode.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import AudioConfig, LossWeights
from ..ops.mel import log_mel_spectrogram
from ..ops.stft import stft_magnitude

VALID_LOSS_MODES = ("mel_only", "adv_mel", "adv_mel_fm")

# Multi-resolution STFT configs (reference: models/losses.py:431-437)
STFT_PARAMS = (
    {"n_fft": 1024, "hop_length": 120, "win_length": 600},
    {"n_fft": 2048, "hop_length": 240, "win_length": 1200},
    {"n_fft": 512, "hop_length": 50, "win_length": 240},
)


def discriminator_loss(
    disc_real_outputs: Sequence[jnp.ndarray],
    disc_fake_outputs: Sequence[jnp.ndarray],
) -> jnp.ndarray:
    """LSGAN disc loss: mean_d [ E[(D(x)-1)^2] + E[D(g)^2] ]
    (reference: models/losses.py:439-491)."""
    loss = 0.0
    for dr, df in zip(disc_real_outputs, disc_fake_outputs):
        loss += jnp.mean(jnp.square(dr - 1.0)) + jnp.mean(jnp.square(df))
    return loss / len(disc_real_outputs)


def generator_adversarial_loss(
    disc_fake_outputs: Sequence[jnp.ndarray],
) -> jnp.ndarray:
    """LSGAN gen loss: mean_d E[(D(g)-1)^2] (reference: models/losses.py:493-535)."""
    loss = 0.0
    for df in disc_fake_outputs:
        loss += jnp.mean(jnp.square(df - 1.0))
    return loss / len(disc_fake_outputs)


def feature_matching_loss(
    real_feature_maps: Sequence[Sequence[jnp.ndarray]],
    fake_feature_maps: Sequence[Sequence[jnp.ndarray]],
    fmap_counts: Optional[Sequence[Optional[Sequence[Optional[int]]]]] = None,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """L1 over layers (real side stop-gradiented), mean over layers then over
    discriminators; also returns per-discriminator scalars for logging
    (reference: models/losses.py:537-623).

    fmap_counts: optional per-discriminator / per-layer TRUE element counts
    for feature maps in 'compute' layout (models/hifigan.py:
    msd_fmap_true_counts).  Chained-folded maps carry zero tail padding
    identically in real and fake, so sum(|f - r|) / true_count equals the
    reference's elementwise mean exactly; None falls back to jnp.mean.
    """
    per_disc = []
    for di, (real_list, fake_list) in enumerate(
        zip(real_feature_maps, fake_feature_maps)
    ):
        layer_counts = fmap_counts[di] if fmap_counts is not None else None
        disc_loss = 0.0
        for li, (rf, ff) in enumerate(zip(real_list, fake_list)):
            diff = jnp.abs(ff - jax.lax.stop_gradient(rf))
            count = layer_counts[li] if layer_counts is not None else None
            if count is None:
                disc_loss += jnp.mean(diff)
            else:
                disc_loss += jnp.sum(diff) / count
        per_disc.append(disc_loss / len(real_list))
    total = sum(per_disc) / len(per_disc)
    return total, per_disc


def multi_resolution_stft_loss(
    wav_real: jnp.ndarray, wav_fake: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sc, mag) over 3 resolutions: both computed on log(|STFT| + 1e-5) —
    sc = L1, mag = L2 — exactly the reference's (non-standard) math
    (reference: models/losses.py:625-706)."""
    x = wav_real.squeeze(1)  # [B, T]
    g = wav_fake.squeeze(1)
    sc_loss = 0.0
    mag_loss = 0.0
    for p in STFT_PARAMS:
        mag_r = stft_magnitude(
            x, p["n_fft"], p["hop_length"], p["win_length"], power=1.0
        )
        mag_f = stft_magnitude(
            g, p["n_fft"], p["hop_length"], p["win_length"], power=1.0
        )
        log_r = jnp.log(mag_r + 1e-5)
        log_f = jnp.log(mag_f + 1e-5)
        sc_loss += jnp.mean(jnp.abs(log_f - log_r))
        mag_loss += jnp.mean(jnp.square(log_f - log_r))
    n = len(STFT_PARAMS)
    return sc_loss / n, mag_loss / n


def mel_reconstruction_loss(
    wav_real: jnp.ndarray, wav_fake: jnp.ndarray, audio: AudioConfig
) -> jnp.ndarray:
    """L1 between log-mels of real and fake waveforms, using the SAME mel op
    as dataset preprocessing (reference: models/losses.py:708-797)."""
    mel_real = log_mel_spectrogram(wav_real.squeeze(1), audio)
    mel_fake = log_mel_spectrogram(wav_fake.squeeze(1), audio)
    return jnp.mean(jnp.abs(mel_fake - mel_real))


def vocoder_discriminator_loss(
    disc_real_outputs: Sequence[jnp.ndarray],
    disc_fake_outputs: Sequence[jnp.ndarray],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """(reference: models/losses.py:799-832)"""
    loss = discriminator_loss(disc_real_outputs, disc_fake_outputs)
    return loss, {"disc_loss": loss}


def vocoder_generator_loss(
    wav_real: jnp.ndarray,
    wav_fake: jnp.ndarray,
    audio: AudioConfig,
    loss_mode: str = "adv_mel_fm",
    disc_fake_outputs: Optional[Sequence[jnp.ndarray]] = None,
    real_feature_maps: Optional[Sequence[Sequence[jnp.ndarray]]] = None,
    fake_feature_maps: Optional[Sequence[Sequence[jnp.ndarray]]] = None,
    weights: LossWeights = LossWeights(),
    use_mel_loss: bool = True,
    fmap_counts: Optional[Sequence[Optional[Sequence[Optional[int]]]]] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Generator loss per ablation mode (reference: models/losses.py:834-1005).

    Returns (gen_loss, metrics) where metrics carries the reference's exact
    key schema, with zero-valued entries for inactive terms and
    gen_fm_loss_disc_{i} per-discriminator FM components in adv_mel_fm mode.
    fmap_counts: see feature_matching_loss (compute-layout feature maps).
    """
    if loss_mode not in VALID_LOSS_MODES:
        raise ValueError(
            f"Invalid loss_mode '{loss_mode}'. Must be one of {list(VALID_LOSS_MODES)}"
        )
    zero = jnp.zeros((), jnp.float32)
    metrics: Dict[str, jnp.ndarray] = {}

    mel_loss = (
        mel_reconstruction_loss(wav_real, wav_fake, audio) if use_mel_loss else zero
    )
    metrics["gen_mel_loss"] = mel_loss

    if loss_mode == "mel_only":
        gen_loss = weights.vocoder_mel * mel_loss
        metrics["gen_adv_loss"] = zero
        metrics["gen_fm_loss"] = zero
        metrics["gen_sc_loss"] = zero
        metrics["gen_mag_loss"] = zero
        metrics["gen_stft_loss"] = zero
    elif loss_mode == "adv_mel":
        if disc_fake_outputs is None:
            raise ValueError("disc_fake_outputs is required for 'adv_mel' mode")
        adv = generator_adversarial_loss(disc_fake_outputs)
        sc, mag = multi_resolution_stft_loss(wav_real, wav_fake)
        stft = sc + mag
        gen_loss = adv + weights.vocoder_mel * mel_loss + weights.stft * stft
        metrics["gen_adv_loss"] = adv
        metrics["gen_fm_loss"] = zero
        metrics["gen_sc_loss"] = sc
        metrics["gen_mag_loss"] = mag
        metrics["gen_stft_loss"] = stft
    else:  # adv_mel_fm
        if disc_fake_outputs is None:
            raise ValueError("disc_fake_outputs is required for 'adv_mel_fm' mode")
        if real_feature_maps is None or fake_feature_maps is None:
            raise ValueError(
                "real_feature_maps and fake_feature_maps are required for "
                "'adv_mel_fm' mode"
            )
        adv = generator_adversarial_loss(disc_fake_outputs)
        fm, per_disc = feature_matching_loss(
            real_feature_maps, fake_feature_maps, fmap_counts
        )
        sc, mag = multi_resolution_stft_loss(wav_real, wav_fake)
        stft = sc + mag
        gen_loss = (
            adv
            + weights.feature_matching * fm
            + weights.vocoder_mel * mel_loss
            + weights.stft * stft
        )
        metrics["gen_adv_loss"] = adv
        metrics["gen_fm_loss"] = fm
        metrics["gen_sc_loss"] = sc
        metrics["gen_mag_loss"] = mag
        metrics["gen_stft_loss"] = stft
        for i, d in enumerate(per_disc):
            metrics[f"gen_fm_loss_disc_{i}"] = d

    metrics["gen_loss"] = gen_loss
    return gen_loss, metrics


def should_train_discriminator(loss_mode: str) -> bool:
    """(reference: models/losses.py:1007-1026)"""
    return loss_mode in ("adv_mel", "adv_mel_fm")

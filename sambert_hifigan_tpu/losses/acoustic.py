"""Acoustic-model losses (reference: models/losses.py:19-332).

L_total = w_mel * L1(mel) + w_dur * MSE(log_dur_pred, log(dur_gt + 1))
        + w_pitch * MSE(pitch, masked) + w_energy * MSE(energy, masked)

Masked-mean semantics match the reference exactly: loss * mask summed over
valid entries, divided by (mask.sum() + 1e-8); the mel loss divides by
(mask.sum() * n_mels + 1e-8) (reference: models/losses.py:92-98).  Under the
static-shape TPU design the masks are always present and load-bearing (padding
to frame buckets would otherwise pollute every loss).

All returned values are JAX scalars — device_get at the logging boundary, not
inside jit (the reference calls .item() eagerly, models/losses.py:324-330).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from ..config import LossWeights


def _masked_mean(loss: jnp.ndarray, mask: Optional[jnp.ndarray], extra_denom: float = 1.0):
    if mask is None:
        return jnp.mean(loss)
    m = mask.astype(loss.dtype)
    while m.ndim < loss.ndim:
        m = m[..., None]
    return jnp.sum(loss * m) / (jnp.sum(m) * extra_denom + 1e-8)


def mel_l1_loss(
    mel_pred: jnp.ndarray,
    mel_gt: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """L1 over [B, Tfrm, n_mels]; with a [B, Tfrm] mask, averages over valid
    frames x mels (reference: models/losses.py:58-103)."""
    loss = jnp.abs(mel_pred - mel_gt)
    if mask is None:
        return jnp.mean(loss)
    m = mask.astype(loss.dtype)[..., None]
    return jnp.sum(loss * m) / (jnp.sum(mask.astype(loss.dtype)) * mel_pred.shape[-1] + 1e-8)


def duration_loss(
    log_dur_pred: jnp.ndarray,
    dur_gt: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """MSE(log_dur_pred, log(dur_gt + 1)) (reference: models/losses.py:105-155)."""
    log_dur_gt = jnp.log(dur_gt.astype(jnp.float32) + 1.0)
    loss = jnp.square(log_dur_pred - log_dur_gt)
    return _masked_mean(loss, mask)


def pitch_loss(
    pitch_pred: jnp.ndarray,
    pitch_gt: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """MSE with voiced-segment masking (reference: models/losses.py:157-207)."""
    loss = jnp.square(pitch_pred - pitch_gt)
    return _masked_mean(loss, mask)


def energy_loss(
    energy_pred: jnp.ndarray,
    energy_gt: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """MSE (reference: models/losses.py:209-254)."""
    loss = jnp.square(energy_pred - energy_gt)
    return _masked_mean(loss, mask)


def acoustic_loss(
    mel_pred: jnp.ndarray,
    mel_gt: jnp.ndarray,
    log_dur_pred: jnp.ndarray,
    dur_gt: jnp.ndarray,
    pitch_pred: jnp.ndarray,
    pitch_gt: jnp.ndarray,
    energy_pred: jnp.ndarray,
    energy_gt: jnp.ndarray,
    mel_mask: Optional[jnp.ndarray] = None,
    phoneme_mask: Optional[jnp.ndarray] = None,
    pitch_mask: Optional[jnp.ndarray] = None,
    weights: LossWeights = LossWeights(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total weighted loss + component dict (reference: models/losses.py:256-332).

    Key schema is fixed by reference tests: total_loss, mel_loss, dur_loss,
    pitch_loss, energy_loss.
    """
    l_mel = mel_l1_loss(mel_pred, mel_gt, mel_mask)
    l_dur = duration_loss(log_dur_pred, dur_gt, phoneme_mask)
    l_pitch = pitch_loss(pitch_pred, pitch_gt, pitch_mask)
    l_energy = energy_loss(energy_pred, energy_gt, mel_mask)
    total = (
        weights.mel * l_mel
        + weights.dur * l_dur
        + weights.pitch * l_pitch
        + weights.energy * l_energy
    )
    return total, {
        "total_loss": total,
        "mel_loss": l_mel,
        "dur_loss": l_dur,
        "pitch_loss": l_pitch,
        "energy_loss": l_energy,
    }

"""Variance adaptor: duration/pitch/energy predictors + length regulation
(reference: models/variance_adaptor.py).

Differences from the reference are purely mechanical (static shapes):

  * The length regulator is the fixed-shape gather in ops/length_regulator.py
    instead of a Python batch loop; callers pass a static `max_frames` bucket
    and receive a frame mask.
  * All three expansions (features, pitch, energy) share ONE set of gather
    indices computed from the duration.
  * In inference mode, predicted durations of PADDED phonemes are zeroed when
    a phoneme mask is supplied (the reference never masks here because it only
    runs unpadded batches; clamping padding to >= 1 frame would corrupt padded
    batch entries under static shapes).

Quantization boundary semantics match the reference bit-for-bit: clamp to
[min, max], normalize, scale by (n_bins - 1), truncate to int, clamp to
[0, n_bins - 1]; pitch has NO epsilon in the denominator while energy has
+1e-8 (reference: models/variance_adaptor.py:330-357 vs 486-513 — preserved
deliberately, SURVEY.md section 7.3.7e).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import VarianceAdaptorConfig
from ..ops.length_regulator import gather_frames, regulate_indices
from ..utils.init import embedding_init
from .layers import Conv1d, LayerNorm, Linear


class VariancePredictor(nn.Module):
    """The shared predictor architecture (reference:
    models/variance_adaptor.py:13-117): n_layers x [Conv1d(k, same-pad) ->
    ReLU -> LayerNorm -> Dropout -> +residual] then Linear -> scalar.

    Note the residual is added AFTER dropout, to the conv-input
    (reference: models/variance_adaptor.py:81-102).
    """

    d_model: int
    n_layers: int = 2
    kernel_size: int = 3
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: jnp.ndarray,  # [B, Tph, d]
        mask: Optional[jnp.ndarray] = None,  # bool [B, Tph], True = valid
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = h
        for i in range(self.n_layers):
            residual = x
            y = Conv1d(
                self.d_model,
                self.d_model,
                self.kernel_size,
                padding=(self.kernel_size - 1) // 2,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x)
            y = jax.nn.relu(y)
            y = LayerNorm(self.d_model, dtype=self.dtype, name=f"norm_{i}")(y)
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
            x = y + residual
        out = Linear(self.d_model, 1, dtype=self.dtype, name="linear")(x)
        out = out.squeeze(-1)  # [B, Tph]
        if mask is not None:
            out = jnp.where(mask, out, -1e9)
        return out


def quantize_pitch(
    pitch: jnp.ndarray, n_bins: int, pitch_min: float, pitch_max: float
) -> jnp.ndarray:
    """clamp -> normalize (no eps) -> * (n_bins-1) -> trunc -> clamp
    (reference: models/variance_adaptor.py:330-357)."""
    p = jnp.clip(pitch, pitch_min, pitch_max)
    p = (p - pitch_min) / (pitch_max - pitch_min)
    bins = (p * (n_bins - 1)).astype(jnp.int32)
    return jnp.clip(bins, 0, n_bins - 1)


def quantize_energy(
    energy: jnp.ndarray, n_bins: int, energy_min: float, energy_max: float
) -> jnp.ndarray:
    """Same, but with +1e-8 in the denominator
    (reference: models/variance_adaptor.py:486-513)."""
    e = jnp.clip(energy, energy_min, energy_max)
    e = (e - energy_min) / (energy_max - energy_min + 1e-8)
    bins = (e * (n_bins - 1)).astype(jnp.int32)
    return jnp.clip(bins, 0, n_bins - 1)


class VarianceAdaptorOutput(NamedTuple):
    hvar: jnp.ndarray  # [B, max_frames, d]
    frame_mask: jnp.ndarray  # [B, max_frames] bool
    total_frames: jnp.ndarray  # [B] int32
    predictions: Dict[str, jnp.ndarray]


class VarianceAdaptor(nn.Module):
    """(reference: models/variance_adaptor.py:585-791)

    Training (ground truth given): teacher-forces duration for expansion and
    pitch/energy for embedding.  Inference: dur = clamp(round(exp(log_dur)),
    min 1) (reference: models/variance_adaptor.py:746-748), pitch/energy
    embed their own predictions.
    """

    d_model: int = 256
    config: VarianceAdaptorConfig = VarianceAdaptorConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.config
        self.duration_predictor = VariancePredictor(
            self.d_model, c.predictor_layers, c.predictor_kernel_size,
            c.predictor_dropout, dtype=self.dtype,
        )
        self.pitch_predictor = VariancePredictor(
            self.d_model, c.predictor_layers, c.predictor_kernel_size,
            c.predictor_dropout, dtype=self.dtype,
        )
        self.energy_predictor = VariancePredictor(
            self.d_model, c.predictor_layers, c.predictor_kernel_size,
            c.predictor_dropout, dtype=self.dtype,
        )
        self.pitch_emb = self.param(
            "pitch_emb", embedding_init, (c.pitch_bins, self.d_model)
        )
        self.energy_emb = self.param(
            "energy_emb", embedding_init, (c.energy_bins, self.d_model)
        )

    def __call__(
        self,
        henc: jnp.ndarray,  # [B, Tph, d]
        max_frames: int,
        dur_gt: Optional[jnp.ndarray] = None,  # [B, Tph] int
        pitch_gt: Optional[jnp.ndarray] = None,  # [B, max_frames]
        energy_gt: Optional[jnp.ndarray] = None,  # [B, max_frames]
        phoneme_mask: Optional[jnp.ndarray] = None,  # bool [B, Tph], True = valid
        deterministic: bool = True,
        duration_scale: float = 1.0,
        pitch_shift: float = 0.0,
        energy_scale: float = 1.0,
    ) -> VarianceAdaptorOutput:
        """duration_scale / pitch_shift (Hz) / energy_scale are inference-time
        prosody controls (semantics from reference docs/sam_bert_overview.md:
        361-391 and docs/variance_adaptor_theory.md:448-505): slow/fast speech,
        pitch transposition, loudness scaling.  No-ops at their defaults and
        ignored whenever the corresponding ground truth is supplied."""
        c = self.config
        log_dur_pred = self.duration_predictor(
            henc, mask=None, deterministic=deterministic
        )  # [B, Tph] — reference passes no mask here (variance_adaptor.py:736)

        if dur_gt is not None:
            dur = dur_gt.astype(jnp.int32)
        else:
            dur = jnp.round(jnp.exp(log_dur_pred) * duration_scale).astype(jnp.int32)
            dur = jnp.maximum(dur, 1)
            if phoneme_mask is not None:
                dur = dur * phoneme_mask.astype(jnp.int32)

        idx, frame_mask, total = regulate_indices(dur, max_frames)
        hlr = gather_frames(henc, idx, frame_mask)  # [B, max_frames, d]

        # Pitch (reference: models/variance_adaptor.py:359-425)
        pitch_tok = self.pitch_predictor(henc, None, deterministic)  # [B, Tph]
        pitch_frm = gather_frames(pitch_tok, idx, frame_mask)  # [B, max_frames]
        pitch_for_emb = pitch_gt if pitch_gt is not None else pitch_frm + pitch_shift
        pitch_bins = quantize_pitch(
            pitch_for_emb, c.pitch_bins, c.pitch_min, c.pitch_max
        )
        ep = jnp.take(self.pitch_emb, pitch_bins, axis=0).astype(self.dtype)

        # Energy (reference: models/variance_adaptor.py:515-581)
        energy_tok = self.energy_predictor(henc, None, deterministic)
        energy_frm = gather_frames(energy_tok, idx, frame_mask)
        energy_for_emb = (
            energy_gt if energy_gt is not None else energy_frm * energy_scale
        )
        energy_bins = quantize_energy(
            energy_for_emb, c.energy_bins, c.energy_min, c.energy_max
        )
        ee = jnp.take(self.energy_emb, energy_bins, axis=0).astype(self.dtype)

        hvar = hlr + ep + ee
        hvar = hvar * frame_mask[:, :, None].astype(hvar.dtype)

        predictions = {
            "log_dur_pred": log_dur_pred,
            "dur": dur,
            "pitch_tok": pitch_tok,
            "pitch_frm": pitch_frm,
            "energy_tok": energy_tok,
            "energy_frm": energy_frm,
        }
        return VarianceAdaptorOutput(hvar, frame_mask, total, predictions)

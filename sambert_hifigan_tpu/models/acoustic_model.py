"""SAM-BERT acoustic model (reference: models/acoustic_model.py:24-313).

Wires PhonemeEmbedding -> BERTEncoder -> VarianceAdaptor -> PNCAARDecoder.
Static-shape contract: callers provide `max_frames` (a bucket size) and get a
frame mask back with every result.

Training (`__call__` with ground truth): teacher-forces duration, pitch,
energy, and mel; one jittable forward.

Inference (`infer` / `encode`): runs the encoder + variance adaptor under jit,
then the scan-based AR decoder (ar_decoder.ar_decode).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import AcousticModelConfig
from .ar_decoder import PNCAARDecoder
from .encoder import BERTEncoder
from .phoneme_embedding import PhonemeEmbedding
from .variance_adaptor import VarianceAdaptor, VarianceAdaptorOutput


class AcousticForwardOutput(NamedTuple):
    mel_pred: jnp.ndarray  # [B, max_frames, n_mels]
    frame_mask: jnp.ndarray  # [B, max_frames] bool
    total_frames: jnp.ndarray  # [B] int32
    predictions: Dict[str, jnp.ndarray]


class SAMBERTAcousticModel(nn.Module):
    config: AcousticModelConfig = AcousticModelConfig()
    dtype: jnp.dtype = jnp.float32

    def get_config(self) -> dict:
        """Introspection parity (reference: models/acoustic_model.py:299-311)."""
        import dataclasses

        return dataclasses.asdict(self.config)

    def setup(self):
        c = self.config
        self.phoneme_embedding = PhonemeEmbedding(
            c.frontend.vocab_size,
            c.frontend.tone_size,
            c.frontend.boundary_size,
            c.d_model,
            dtype=self.dtype,
        )
        self.bert_encoder = BERTEncoder(c.d_model, c.encoder, dtype=self.dtype)
        self.variance_adaptor = VarianceAdaptor(
            c.d_model, c.variance_adaptor, dtype=self.dtype
        )
        self.ar_decoder = PNCAARDecoder(
            c.d_model, c.n_mels, c.decoder, dtype=self.dtype
        )

    def encode(
        self,
        ph_ids: jnp.ndarray,  # [B, Tph] int
        tone_ids: jnp.ndarray,
        boundary_ids: jnp.ndarray,
        max_frames: int,
        dur_gt: Optional[jnp.ndarray] = None,
        pitch_gt: Optional[jnp.ndarray] = None,
        energy_gt: Optional[jnp.ndarray] = None,
        phoneme_mask: Optional[jnp.ndarray] = None,  # bool [B, Tph] True = valid
        deterministic: bool = True,
        duration_scale: float = 1.0,
        pitch_shift: float = 0.0,
        energy_scale: float = 1.0,
    ) -> VarianceAdaptorOutput:
        """Embedding -> encoder -> variance adaptor (everything before the AR
        decoder; reference stages 1-3, models/acoustic_model.py:236-254)."""
        h0 = self.phoneme_embedding(ph_ids, tone_ids, boundary_ids)
        key_padding = None if phoneme_mask is None else ~phoneme_mask
        henc = self.bert_encoder(
            h0, key_padding_mask=key_padding, deterministic=deterministic
        )
        return self.variance_adaptor(
            henc,
            max_frames,
            dur_gt=dur_gt,
            pitch_gt=pitch_gt,
            energy_gt=energy_gt,
            phoneme_mask=phoneme_mask,
            deterministic=deterministic,
            duration_scale=duration_scale,
            pitch_shift=pitch_shift,
            energy_scale=energy_scale,
        )

    def __call__(
        self,
        ph_ids: jnp.ndarray,
        tone_ids: jnp.ndarray,
        boundary_ids: jnp.ndarray,
        mel_gt: jnp.ndarray,  # [B, max_frames, n_mels]
        dur_gt: jnp.ndarray,  # [B, Tph]
        pitch_gt: Optional[jnp.ndarray] = None,
        energy_gt: Optional[jnp.ndarray] = None,
        phoneme_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> AcousticForwardOutput:
        """Teacher-forced training forward (reference:
        models/acoustic_model.py:181-265 with all ground truth provided)."""
        max_frames = mel_gt.shape[1]
        va = self.encode(
            ph_ids,
            tone_ids,
            boundary_ids,
            max_frames,
            dur_gt=dur_gt,
            pitch_gt=pitch_gt,
            energy_gt=energy_gt,
            phoneme_mask=phoneme_mask,
            deterministic=deterministic,
        )
        mel_pred = self.ar_decoder(
            va.hvar,
            mel_gt,
            memory_key_padding_mask=~va.frame_mask,
            deterministic=deterministic,
        )
        return AcousticForwardOutput(
            mel_pred, va.frame_mask, va.total_frames, va.predictions
        )

    def get_config(self) -> dict:
        c = self.config
        return {
            "vocab_size": c.frontend.vocab_size,
            "tone_size": c.frontend.tone_size,
            "boundary_size": c.frontend.boundary_size,
            "d_model": c.d_model,
            "n_mels": c.n_mels,
            "encoder_config": {
                "d_model": c.d_model,
                "n_layers": c.encoder.n_layers,
                "n_heads": c.encoder.n_heads,
                "d_ff": c.encoder.d_ff,
                "dropout": c.encoder.dropout,
            },
        }


def acoustic_inference(
    model: SAMBERTAcousticModel,
    params,
    ph_ids: jnp.ndarray,
    tone_ids: jnp.ndarray,
    boundary_ids: jnp.ndarray,
    max_frames: int,
    phoneme_mask: Optional[jnp.ndarray] = None,
    max_len: Optional[int] = None,
    duration_scale: float = 1.0,
    pitch_shift: float = 0.0,
    energy_scale: float = 1.0,
) -> AcousticForwardOutput:
    """Full inference: predicted durations + autoregressive mel generation
    (reference: models/acoustic_model.py:267-297), with prosody controls.

    Returns mel_pred [B, max_frames, n_mels] with frames beyond each sample's
    predicted total masked out.
    """
    from .ar_decoder import ar_decode

    va: VarianceAdaptorOutput = model.apply(
        params,
        ph_ids,
        tone_ids,
        boundary_ids,
        max_frames,
        None,
        None,
        None,
        phoneme_mask,
        True,
        duration_scale,
        pitch_shift,
        energy_scale,
        method=SAMBERTAcousticModel.encode,
    )
    decoder = PNCAARDecoder(
        model.config.d_model, model.config.n_mels, model.config.decoder,
        dtype=model.dtype,
    )
    mel = ar_decode(
        decoder,
        {"params": params["params"]["ar_decoder"]},
        va.hvar,
        max_len=max_len or max_frames,
        memory_key_padding_mask=~va.frame_mask,
    )
    mel = mel * va.frame_mask[:, :, None].astype(mel.dtype)
    return AcousticForwardOutput(mel, va.frame_mask, va.total_frames, va.predictions)

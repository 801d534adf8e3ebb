"""Phoneme embedding (reference: models/phoneme_embedding.py:12-75).

H0 = Emb_ph(ph_ids) + Emb_tone(tone_ids) + Emb_boundary(boundary_ids),
each table N(0, 1)-initialized like torch nn.Embedding.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..utils.init import embedding_init


class PhonemeEmbedding(nn.Module):
    vocab_size: int = 300
    tone_size: int = 10
    boundary_size: int = 5
    d_model: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        ph_ids: jnp.ndarray,  # [B, Tph] int
        tone_ids: jnp.ndarray,
        boundary_ids: jnp.ndarray,
    ) -> jnp.ndarray:
        ph_emb = self.param("ph_emb", embedding_init, (self.vocab_size, self.d_model))
        tone_emb = self.param(
            "tone_emb", embedding_init, (self.tone_size, self.d_model)
        )
        boundary_emb = self.param(
            "boundary_emb", embedding_init, (self.boundary_size, self.d_model)
        )
        h0 = (
            jnp.take(ph_emb, ph_ids, axis=0)
            + jnp.take(tone_emb, tone_ids, axis=0)
            + jnp.take(boundary_emb, boundary_ids, axis=0)
        )
        return h0.astype(self.dtype)

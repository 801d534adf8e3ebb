"""BERT encoder (reference: models/bert_encoder.py:13-119).

6 post-norm transformer layers (ReLU, d=256, 4 heads, ffn 1024) followed by a
final LayerNorm (the reference passes norm=nn.LayerNorm(d) to
nn.TransformerEncoder, models/bert_encoder.py:62-66).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import EncoderConfig
from .layers import LayerNorm
from .transformer import TransformerEncoderLayer


class BERTEncoder(nn.Module):
    d_model: int = 256
    config: EncoderConfig = EncoderConfig()
    dtype: jnp.dtype = jnp.float32

    def get_config(self) -> dict:
        """Introspection parity (reference: models/bert_encoder.py:106-118)."""
        import dataclasses

        return {"d_model": self.d_model, **dataclasses.asdict(self.config)}

    @nn.compact
    def __call__(
        self,
        h0: jnp.ndarray,  # [B, Tph, d]
        attn_mask: Optional[jnp.ndarray] = None,  # bool [Tph, Tph], True = blocked
        key_padding_mask: Optional[jnp.ndarray] = None,  # bool [B, Tph], True = pad
        deterministic: bool = True,
    ) -> jnp.ndarray:
        assert h0.ndim == 3 and h0.shape[-1] == self.d_model, h0.shape
        layer_cls = TransformerEncoderLayer
        if self.config.remat:
            # jax.checkpoint per layer: activations recompute on backward
            # instead of living in HBM for the whole step (long frame buckets)
            layer_cls = nn.remat(TransformerEncoderLayer, static_argnums=(4,))
        x = h0
        for i in range(self.config.n_layers):
            x = layer_cls(
                self.d_model,
                self.config.n_heads,
                self.config.d_ff,
                self.config.dropout,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, attn_mask, key_padding_mask, deterministic)
        return LayerNorm(self.d_model, dtype=self.dtype, name="final_norm")(x)

    def get_config(self) -> dict:
        return {
            "d_model": self.d_model,
            "n_layers": self.config.n_layers,
            "n_heads": self.config.n_heads,
            "d_ff": self.config.d_ff,
            "dropout": self.config.dropout,
        }

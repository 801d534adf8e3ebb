"""PNCA AR decoder (reference: models/ar_decoder.py).

Architecture parity: prenet Linear(80->256)->ReLU->Dropout->Linear(256->256),
sinusoidal positional encoding (+dropout), 6 post-norm transformer decoder
layers (8 heads, ffn 2048, ReLU) cross-attending to Hvar, mel projection;
every matrix xavier_uniform (reference: models/ar_decoder.py:61-92).

Training = teacher forcing on the right-shifted ground-truth mel with a causal
mask (reference: models/ar_decoder.py:119-165, shift at 240-261).

Inference = the TPU redesign.  The reference re-encodes the ENTIRE prefix
through all 6 layers for every generated frame with no KV cache — O(T^3)
attention work (reference: models/ar_decoder.py:167-238, noted in SURVEY.md
section 3.2).  Here inference is a single jitted lax.scan over frames with a
preallocated per-layer KV cache in HBM; each step does O(T) attention work
against the cache, is numerically identical to the full-prefix re-run in eval
mode, and `chunk_size` becomes a real scan-unroll factor instead of a logging
knob (reference quirk, models/ar_decoder.py:198-229).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import DecoderConfig
from ..utils.init import xavier_uniform
from .layers import Linear
from .transformer import (
    KVCache,
    TransformerDecoderLayer,
    causal_mask,
    sinusoidal_positional_encoding,
)


class PNCAARDecoder(nn.Module):
    d_model: int = 256
    n_mels: int = 80
    config: DecoderConfig = DecoderConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.config
        self.prenet1 = Linear(
            self.n_mels, self.d_model, kernel_init=xavier_uniform, dtype=self.dtype
        )
        self.prenet2 = Linear(
            self.d_model, self.d_model, kernel_init=xavier_uniform, dtype=self.dtype
        )
        self.prenet_drop = nn.Dropout(c.dropout)
        self.pos_drop = nn.Dropout(c.dropout)
        self.layers = [
            TransformerDecoderLayer(
                self.d_model, c.n_heads, c.d_ff, c.dropout, dtype=self.dtype,
                name=f"layer_{i}",
            )
            for i in range(c.n_layers)
        ]
        self.mel_proj = Linear(
            self.d_model, self.n_mels, kernel_init=xavier_uniform, dtype=self.dtype
        )
        self.pe = sinusoidal_positional_encoding(c.max_len, self.d_model)

    # ---- shared pieces -----------------------------------------------------

    def _prenet(self, mel: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        x = self.prenet1(mel)
        x = jax.nn.relu(x)
        x = self.prenet_drop(x, deterministic=deterministic)
        return self.prenet2(x)

    # ---- training: teacher forcing ------------------------------------------

    def __call__(
        self,
        hvar: jnp.ndarray,  # [B, Tfrm, d]
        mel_gt: jnp.ndarray,  # [B, Tfrm, n_mels]
        memory_key_padding_mask: Optional[jnp.ndarray] = None,  # [B, Tfrm] True=pad
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forcing forward: predict frame t from frames < t.

        (reference: models/ar_decoder.py:119-165)
        """
        b, tfrm, _ = hvar.shape
        # Shift right with a zero start frame (reference: ar_decoder.py:240-261)
        start = jnp.zeros((b, 1, self.n_mels), mel_gt.dtype)
        mel_shifted = jnp.concatenate([start, mel_gt[:, :-1, :]], axis=1)
        x = self._prenet(mel_shifted, deterministic)
        x = x + self.pe[None, :tfrm, :].astype(x.dtype)
        x = self.pos_drop(x, deterministic=deterministic)
        tgt_mask = causal_mask(tfrm)
        for layer in self.layers:
            x = layer(x, hvar, tgt_mask, memory_key_padding_mask, deterministic)
        return self.mel_proj(x)

    # ---- inference: scan + KV cache -----------------------------------------

    def precompute_memory(self, hvar: jnp.ndarray):
        """Project Hvar to per-layer cross-attention K/V once (the memory is
        static across decode steps)."""
        return [layer.precompute_memory_kv(hvar) for layer in self.layers]

    def decode_step(
        self,
        prev_mel: jnp.ndarray,  # [B, n_mels]
        caches: List[KVCache],
        pos: jnp.ndarray,  # scalar int32
        mem_kvs,  # list of (k, v)
        memory_key_padding_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, List[KVCache]]:
        """One autoregressive step at position `pos`."""
        x = self._prenet(prev_mel[:, None, :], True).squeeze(1)  # [B, d]
        x = x + self.pe[pos].astype(x.dtype)
        new_caches = []
        for layer, cache, (mk, mv) in zip(self.layers, caches, mem_kvs):
            x, cache = layer.decode_step(
                x, cache, pos, mk, mv, memory_key_padding_mask
            )
            new_caches.append(cache)
        mel_t = self.mel_proj(x[:, None, :]).squeeze(1)  # [B, n_mels]
        return mel_t, new_caches


def init_decoder_caches(
    config: DecoderConfig, d_model: int, batch: int, max_len: int, dtype=jnp.float32
) -> List[KVCache]:
    dh = d_model // config.n_heads
    shape = (batch, max_len, config.n_heads, dh)
    return [
        KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))
        for _ in range(config.n_layers)
    ]


def ar_decode(
    model: PNCAARDecoder,
    params,
    hvar: jnp.ndarray,  # [B, Tfrm, d]
    max_len: Optional[int] = None,
    memory_key_padding_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Autoregressive mel generation as one lax.scan.

    Starts from a zero frame, generates max_len frames, and (unlike the
    reference, which concatenates and then drops the start frame,
    models/ar_decoder.py:191-233) never materializes the growing prefix: the
    per-layer KV cache carries all state.  `config.chunk_size` unrolls the
    scan body, trading compile time for fewer loop iterations on TPU.
    """
    b, tfrm, d = hvar.shape
    if max_len is None:
        max_len = tfrm
    caches = init_decoder_caches(model.config, model.d_model, b, max_len, model.dtype)
    mem_kvs = model.apply(params, hvar, method=PNCAARDecoder.precompute_memory)

    def step(carry, pos):
        prev_mel, caches = carry
        mel_t, caches = model.apply(
            params,
            prev_mel,
            caches,
            pos,
            mem_kvs,
            memory_key_padding_mask,
            method=PNCAARDecoder.decode_step,
        )
        return (mel_t, caches), mel_t

    init_mel = jnp.zeros((b, model.n_mels), hvar.dtype)
    unroll = max(1, int(model.config.chunk_size))
    (_, _), mels = jax.lax.scan(
        step, (init_mel, caches), jnp.arange(max_len, dtype=jnp.int32),
        unroll=unroll,
    )
    return jnp.swapaxes(mels, 0, 1)  # [B, max_len, n_mels]

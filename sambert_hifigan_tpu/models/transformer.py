"""Transformer building blocks matching torch nn.Transformer* semantics.

The reference uses nn.TransformerEncoderLayer / nn.TransformerDecoderLayer with
post-norm, ReLU, batch_first (reference: models/bert_encoder.py:52-66,
models/ar_decoder.py:72-80).  These are re-implemented by hand so that

  * the math matches torch exactly (post-norm residual placement, shared-QKV
    projection shapes, eps=1e-5 LayerNorm),
  * the decoder self-attention exposes an incremental `decode_step` path with
    a preallocated KV cache — the basis of the scan-based AR decoder that
    replaces the reference's full-prefix re-encode per frame
    (reference: models/ar_decoder.py:198-229),
  * attention/FFN matmuls run through einsum in a compute dtype (bf16 on TPU)
    while LayerNorms and softmax stay in f32.

Masks: `attn_mask` is a boolean [T, S] (True = BLOCKED, matching torch's
bool-mask convention); `key_padding_mask` is boolean [B, S] (True = ignore).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.init import torch_linear_kernel_init, xavier_uniform
from .layers import LayerNorm, Linear

NEG_INF = -1e9


class KVCache(NamedTuple):
    """Per-layer self-attention cache, HBM-resident under jit.

    k, v: [B, max_len, n_heads, d_head]
    """

    k: jnp.ndarray
    v: jnp.ndarray


class MultiHeadAttention(nn.Module):
    """torch nn.MultiheadAttention-compatible MHA.

    Parameters mirror torch's packed in_proj ([3d, d] weight, zeros bias) and
    out_proj (torch-default Linear init, zero bias), stored as separate q/k/v
    kernels in [d_in, d_out] layout.
    """

    d_model: int
    n_heads: int
    dropout: float = 0.0
    # AR decoder re-initializes everything with xavier_uniform
    # (reference: models/ar_decoder.py:88-92); encoder keeps torch defaults.
    xavier_all: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.d_model
        self.wq = self.param("wq", xavier_uniform, (d, d))
        self.wk = self.param("wk", xavier_uniform, (d, d))
        self.wv = self.param("wv", xavier_uniform, (d, d))
        self.bq = self.param("bq", nn.initializers.zeros, (d,))
        self.bk = self.param("bk", nn.initializers.zeros, (d,))
        self.bv = self.param("bv", nn.initializers.zeros, (d,))
        out_init = xavier_uniform if self.xavier_all else torch_linear_kernel_init
        self.wo = self.param("wo", out_init, (d, d))
        self.bo = self.param("bo", nn.initializers.zeros, (d,))
        self.drop = nn.Dropout(self.dropout)

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, d = x.shape
        return x.reshape(b, t, self.n_heads, d // self.n_heads)

    def _project_kv(self, kv: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cdt = self.dtype
        k = self._split(kv.astype(cdt) @ self.wk.astype(cdt) + self.bk.astype(cdt))
        v = self._split(kv.astype(cdt) @ self.wv.astype(cdt) + self.bv.astype(cdt))
        return k, v

    def _attend(
        self,
        q: jnp.ndarray,  # [B, T, H, dh]
        k: jnp.ndarray,  # [B, S, H, dh]
        v: jnp.ndarray,  # [B, S, H, dh]
        mask: Optional[jnp.ndarray],  # bool [.., T, S], True = blocked
        deterministic: bool,
    ) -> jnp.ndarray:
        dh = q.shape[-1]
        scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(dh))
        if mask is not None:
            scores = jnp.where(mask, NEG_INF, scores)
        w = jax.nn.softmax(scores, axis=-1)
        w = self.drop(w, deterministic=deterministic)
        out = jnp.einsum("bhts,bshd->bthd", w.astype(v.dtype), v)
        b, t = out.shape[0], out.shape[1]
        return out.reshape(b, t, self.d_model)

    def __call__(
        self,
        q_input: jnp.ndarray,  # [B, T, d]
        kv_input: jnp.ndarray,  # [B, S, d]
        attn_mask: Optional[jnp.ndarray] = None,  # bool [T, S], True = blocked
        key_padding_mask: Optional[jnp.ndarray] = None,  # bool [B, S], True = ignore
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cdt = self.dtype
        q = self._split(
            q_input.astype(cdt) @ self.wq.astype(cdt) + self.bq.astype(cdt)
        )
        k, v = self._project_kv(kv_input)
        mask = None
        if attn_mask is not None:
            mask = attn_mask[None, None, :, :]
        if key_padding_mask is not None:
            kpm = key_padding_mask[:, None, None, :]
            mask = kpm if mask is None else jnp.logical_or(mask, kpm)
        out = self._attend(q, k, v, mask, deterministic)
        return out.astype(cdt) @ self.wo.astype(cdt) + self.bo.astype(cdt)

    # ---- incremental decoding -------------------------------------------

    def init_cache(self, batch: int, max_len: int, dtype=None) -> KVCache:
        dh = self.d_model // self.n_heads
        dt = dtype or self.dtype
        shape = (batch, max_len, self.n_heads, dh)
        return KVCache(k=jnp.zeros(shape, dt), v=jnp.zeros(shape, dt))

    def decode_step(
        self,
        x_t: jnp.ndarray,  # [B, d] current-step input
        cache: KVCache,
        pos: jnp.ndarray,  # scalar int32 position
    ) -> Tuple[jnp.ndarray, KVCache]:
        """Causal self-attention for one step using the cache.

        Writes this step's K/V at `pos`, attends over positions <= pos.
        """
        cdt = self.dtype
        b, d = x_t.shape
        h = self.n_heads
        dh = d // h
        q = (x_t.astype(cdt) @ self.wq.astype(cdt) + self.bq.astype(cdt)).reshape(b, h, dh)
        k_t = (x_t.astype(cdt) @ self.wk.astype(cdt) + self.bk.astype(cdt)).reshape(b, h, dh)
        v_t = (x_t.astype(cdt) @ self.wv.astype(cdt) + self.bv.astype(cdt)).reshape(b, h, dh)
        k = jax.lax.dynamic_update_slice(cache.k, k_t[:, None], (0, pos, 0, 0))
        v = jax.lax.dynamic_update_slice(cache.v, v_t[:, None], (0, pos, 0, 0))
        max_len = k.shape[1]
        scores = jnp.einsum("bhd,bshd->bhs", q, k).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(dh))
        idx = jnp.arange(max_len)
        scores = jnp.where(idx[None, None, :] > pos, NEG_INF, scores)
        w = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhs,bshd->bhd", w.astype(v.dtype), v).reshape(b, d)
        out = out.astype(cdt) @ self.wo.astype(cdt) + self.bo.astype(cdt)
        return out, KVCache(k=k, v=v)

    def cross_step(
        self,
        x_t: jnp.ndarray,  # [B, d]
        mem_k: jnp.ndarray,  # [B, S, H, dh] precomputed
        mem_v: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] True = ignore
    ) -> jnp.ndarray:
        cdt = self.dtype
        b, d = x_t.shape
        h = self.n_heads
        dh = d // h
        q = (x_t.astype(cdt) @ self.wq.astype(cdt) + self.bq.astype(cdt)).reshape(b, h, dh)
        scores = jnp.einsum("bhd,bshd->bhs", q, mem_k).astype(jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(dh))
        if key_padding_mask is not None:
            scores = jnp.where(key_padding_mask[:, None, :], NEG_INF, scores)
        w = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhs,bshd->bhd", w.astype(mem_v.dtype), mem_v).reshape(b, d)
        return out.astype(cdt) @ self.wo.astype(cdt) + self.bo.astype(cdt)


class FeedForward(nn.Module):
    """linear2(dropout(relu(linear1(x)))) with torch-default or xavier init."""

    d_model: int
    d_ff: int
    dropout: float = 0.1
    xavier_all: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        init = xavier_uniform if self.xavier_all else None
        h = Linear(self.d_model, self.d_ff, kernel_init=init, dtype=self.dtype,
                   name="linear1")(x)
        h = jax.nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return Linear(self.d_ff, self.d_model, kernel_init=init, dtype=self.dtype,
                      name="linear2")(h)


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer (reference: models/bert_encoder.py:52-60):
    x = norm1(x + dropout(SA(x))); x = norm2(x + dropout(FFN(x)))."""

    d_model: int
    n_heads: int
    d_ff: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attn_mask: Optional[jnp.ndarray] = None,
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        sa = MultiHeadAttention(
            self.d_model, self.n_heads, self.dropout, dtype=self.dtype,
            name="self_attn",
        )(x, x, attn_mask, key_padding_mask, deterministic)
        sa = nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        x = LayerNorm(self.d_model, dtype=self.dtype, name="norm1")(x + sa)
        ff = FeedForward(
            self.d_model, self.d_ff, self.dropout, dtype=self.dtype, name="ffn"
        )(x, deterministic)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return LayerNorm(self.d_model, dtype=self.dtype, name="norm2")(x + ff)


class TransformerDecoderLayer(nn.Module):
    """Post-norm decoder layer (reference: models/ar_decoder.py:72-80):
    self-attn -> norm1, cross-attn -> norm2, FFN -> norm3.

    All matrices xavier_uniform (the decoder-wide re-init,
    reference: models/ar_decoder.py:88-92).
    """

    d_model: int
    n_heads: int
    d_ff: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadAttention(
            self.d_model, self.n_heads, self.dropout, xavier_all=True,
            dtype=self.dtype,
        )
        self.cross_attn = MultiHeadAttention(
            self.d_model, self.n_heads, self.dropout, xavier_all=True,
            dtype=self.dtype,
        )
        self.ffn = FeedForward(
            self.d_model, self.d_ff, self.dropout, xavier_all=True, dtype=self.dtype
        )
        self.norm1 = LayerNorm(self.d_model, dtype=self.dtype)
        self.norm2 = LayerNorm(self.d_model, dtype=self.dtype)
        self.norm3 = LayerNorm(self.d_model, dtype=self.dtype)
        self.drop1 = nn.Dropout(self.dropout)
        self.drop2 = nn.Dropout(self.dropout)
        self.drop3 = nn.Dropout(self.dropout)

    def __call__(
        self,
        tgt: jnp.ndarray,  # [B, T, d]
        memory: jnp.ndarray,  # [B, S, d]
        tgt_mask: Optional[jnp.ndarray] = None,  # bool [T, T]
        memory_key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        sa = self.self_attn(tgt, tgt, tgt_mask, None, deterministic)
        x = self.norm1(tgt + self.drop1(sa, deterministic=deterministic))
        ca = self.cross_attn(x, memory, None, memory_key_padding_mask, deterministic)
        x = self.norm2(x + self.drop2(ca, deterministic=deterministic))
        ff = self.ffn(x, deterministic)
        return self.norm3(x + self.drop3(ff, deterministic=deterministic))

    # ---- incremental decoding -------------------------------------------

    def precompute_memory_kv(self, memory: jnp.ndarray):
        return self.cross_attn._project_kv(memory)

    def decode_step(
        self,
        x_t: jnp.ndarray,  # [B, d]
        cache: KVCache,
        pos: jnp.ndarray,
        mem_k: jnp.ndarray,
        mem_v: jnp.ndarray,
        memory_key_padding_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, KVCache]:
        sa, cache = self.self_attn.decode_step(x_t, cache, pos)
        x = self.norm1((x_t + sa)[:, None]).squeeze(1)
        ca = self.cross_attn.cross_step(x, mem_k, mem_v, memory_key_padding_mask)
        x = self.norm2((x + ca)[:, None]).squeeze(1)
        ff = self.ffn(x[:, None], True).squeeze(1)
        x = self.norm3((x + ff)[:, None]).squeeze(1)
        return x, cache


def causal_mask(size: int) -> jnp.ndarray:
    """Boolean [size, size], True above the diagonal (= blocked), matching the
    reference's torch.triu(ones, diagonal=1).bool()
    (reference: models/ar_decoder.py:263-277)."""
    return jnp.triu(jnp.ones((size, size), bool), k=1)


def sinusoidal_positional_encoding(max_len: int, d_model: int) -> jnp.ndarray:
    """[max_len, d_model] sin/cos table (reference: models/ar_decoder.py:280-323)."""
    import numpy as np

    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe)

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
        layer_cls = TransformerDecoderLayer
        if c.remat:
            # remat the teacher-forcing __call__ (activation memory scales
            # with Tfrm there); the incremental decode methods are untouched
            layer_cls = nn.remat(TransformerDecoderLayer, static_argnums=(5,))
        self.layers = [
            layer_cls(
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


class DecodeParams(NamedTuple):
    """Decoder weights extracted from the flax param tree and packed for the
    scan body: per-layer tensors stacked on a leading L axis, self-attention
    Q/K/V fused into one [L, d, 3d] matmul.  Packing happens once per trace
    (outside the scan), so each decode step runs the minimum number of ops —
    the step is weight-streaming-bound on TPU, and fewer/larger matmuls keep
    the MXU pipeline busy."""

    prenet_w1: jnp.ndarray  # [n_mels, d]
    prenet_b1: jnp.ndarray
    prenet_w2: jnp.ndarray  # [d, d]
    prenet_b2: jnp.ndarray
    wqkv: jnp.ndarray  # [L, d, 3d]
    bqkv: jnp.ndarray  # [L, 3d]
    wo: jnp.ndarray  # [L, d, d]
    bo: jnp.ndarray  # [L, d]
    wcq: jnp.ndarray  # [L, d, d]
    bcq: jnp.ndarray
    wco: jnp.ndarray  # [L, d, d]
    bco: jnp.ndarray
    w1: jnp.ndarray  # [L, d, ff]
    b1: jnp.ndarray
    w2: jnp.ndarray  # [L, ff, d]
    b2: jnp.ndarray
    ln: jnp.ndarray  # [L, 3, 2, d]  (norm index, scale/bias, d)
    mel_w: jnp.ndarray  # [d, n_mels]
    mel_b: jnp.ndarray
    pe: jnp.ndarray  # [max_len, d]


def extract_decode_params(model: PNCAARDecoder, params) -> DecodeParams:
    p = params["params"]
    n_layers = model.config.n_layers
    dt = model.dtype

    def stack(path):
        return jnp.stack([path(p[f"layer_{l}"]) for l in range(n_layers)]).astype(dt)

    wqkv = stack(
        lambda q: jnp.concatenate(
            [q["self_attn"]["wq"], q["self_attn"]["wk"], q["self_attn"]["wv"]],
            axis=-1,
        )
    )
    bqkv = stack(
        lambda q: jnp.concatenate(
            [q["self_attn"]["bq"], q["self_attn"]["bk"], q["self_attn"]["bv"]],
            axis=-1,
        )
    )
    ln = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.stack(
                        [
                            p[f"layer_{l}"][f"norm{i}"]["scale"],
                            p[f"layer_{l}"][f"norm{i}"]["bias"],
                        ]
                    )
                    for i in (1, 2, 3)
                ]
            )
            for l in range(n_layers)
        ]
    ).astype(jnp.float32)
    return DecodeParams(
        prenet_w1=p["prenet1"]["kernel"].astype(dt),
        prenet_b1=p["prenet1"]["bias"].astype(dt),
        prenet_w2=p["prenet2"]["kernel"].astype(dt),
        prenet_b2=p["prenet2"]["bias"].astype(dt),
        wqkv=wqkv,
        bqkv=bqkv,
        wo=stack(lambda q: q["self_attn"]["wo"]),
        bo=stack(lambda q: q["self_attn"]["bo"]),
        wcq=stack(lambda q: q["cross_attn"]["wq"]),
        bcq=stack(lambda q: q["cross_attn"]["bq"]),
        wco=stack(lambda q: q["cross_attn"]["wo"]),
        bco=stack(lambda q: q["cross_attn"]["bo"]),
        w1=stack(lambda q: q["ffn"]["linear1"]["kernel"]),
        b1=stack(lambda q: q["ffn"]["linear1"]["bias"]),
        w2=stack(lambda q: q["ffn"]["linear2"]["kernel"]),
        b2=stack(lambda q: q["ffn"]["linear2"]["bias"]),
        ln=ln,
        mel_w=p["mel_proj"]["kernel"].astype(dt),
        mel_b=p["mel_proj"]["bias"].astype(dt),
        # recomputed (not read off the module: setup() attrs are unavailable
        # on an unbound module)
        pe=sinusoidal_positional_encoding(model.config.max_len, model.d_model),
    )


def _layer_norm(x: jnp.ndarray, scale_bias: jnp.ndarray, eps: float = 1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale_bias[0] + scale_bias[1]).astype(x.dtype)


def precompute_memory_packed(model: PNCAARDecoder, params, hvar: jnp.ndarray):
    """Stacked cross-attention K/V: [L, B, S, H, dh] each."""
    p = params["params"]
    dt = model.dtype
    h = model.config.n_heads
    b, s, d = hvar.shape
    ks, vs = [], []
    x = hvar.astype(dt)
    for l in range(model.config.n_layers):
        ca = p[f"layer_{l}"]["cross_attn"]
        k = (x @ ca["wk"].astype(dt) + ca["bk"].astype(dt)).reshape(b, s, h, d // h)
        v = (x @ ca["wv"].astype(dt) + ca["bv"].astype(dt)).reshape(b, s, h, d // h)
        ks.append(k)
        vs.append(v)
    return jnp.stack(ks), jnp.stack(vs)


def make_packed_step(
    dp: DecodeParams,
    mem_k: jnp.ndarray,
    mem_v: jnp.ndarray,
    max_len: int,
    memory_key_padding_mask: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
):
    """The per-frame decode step over packed weights, shared by the one-shot
    scan (ar_decode_packed) and the chunked streaming decoder
    (ar_decode_chunk).  carry = (prev_mel [B, n_mels], cache_k, cache_v);
    caches are [L, B, max_len, H, dh]."""
    L, b, _, h, dh = mem_k.shape
    d = h * dh
    dt = dtype
    neg = jnp.float32(-1e9)
    mem_bias = None
    if memory_key_padding_mask is not None:
        mem_bias = jnp.where(memory_key_padding_mask[:, None, :], neg, 0.0)
    pos_idx = jnp.arange(max_len)

    def step(carry, pos):
        prev_mel, ck, cv = carry
        x = jax.nn.relu(prev_mel @ dp.prenet_w1 + dp.prenet_b1)
        x = x @ dp.prenet_w2 + dp.prenet_b2
        x = x + dp.pe[pos].astype(x.dtype)
        for l in range(L):
            # self-attention with KV cache
            qkv = x @ dp.wqkv[l] + dp.bqkv[l]  # [B, 3d]
            q, k_t, v_t = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, h, dh)
            ck = jax.lax.dynamic_update_slice(
                ck, k_t.reshape(1, b, 1, h, dh), (l, 0, pos, 0, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cv, v_t.reshape(1, b, 1, h, dh), (l, 0, pos, 0, 0)
            )
            scores = jnp.einsum("bhd,bshd->bhs", q, ck[l]).astype(jnp.float32)
            scores = scores / jnp.sqrt(jnp.float32(dh))
            scores = jnp.where(pos_idx[None, None, :] > pos, neg, scores)
            w = jax.nn.softmax(scores, axis=-1).astype(dt)
            sa = jnp.einsum("bhs,bshd->bhd", w, cv[l]).reshape(b, d)
            sa = sa @ dp.wo[l] + dp.bo[l]
            x = _layer_norm(x + sa, dp.ln[l, 0])
            # cross-attention to precomputed memory
            cq = (x @ dp.wcq[l] + dp.bcq[l]).reshape(b, h, dh)
            cs = jnp.einsum("bhd,bshd->bhs", cq, mem_k[l]).astype(jnp.float32)
            cs = cs / jnp.sqrt(jnp.float32(dh))
            if mem_bias is not None:
                cs = cs + mem_bias
            cw = jax.nn.softmax(cs, axis=-1).astype(dt)
            ca = jnp.einsum("bhs,bshd->bhd", cw, mem_v[l]).reshape(b, d)
            ca = ca @ dp.wco[l] + dp.bco[l]
            x = _layer_norm(x + ca, dp.ln[l, 1])
            # FFN
            ff = jax.nn.relu(x @ dp.w1[l] + dp.b1[l]) @ dp.w2[l] + dp.b2[l]
            x = _layer_norm(x + ff, dp.ln[l, 2])
        mel_t = x @ dp.mel_w + dp.mel_b
        return (mel_t, ck, cv), mel_t

    return step


def init_packed_carry(
    n_layers: int, batch: int, max_len: int, n_heads: int, d_head: int,
    n_mels: int, dtype=jnp.float32,
):
    """Initial (prev_mel, cache_k, cache_v) carry for make_packed_step."""
    shape = (n_layers, batch, max_len, n_heads, d_head)
    return (
        jnp.zeros((batch, n_mels), dtype),
        jnp.zeros(shape, dtype),
        jnp.zeros(shape, dtype),
    )


def ar_decode_packed(
    model: PNCAARDecoder,
    params,
    hvar: jnp.ndarray,
    max_len: Optional[int] = None,
    memory_key_padding_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fast AR decode: one lax.scan over a pure-array step built from packed
    weights.  Numerically identical to the module path (same op order per
    layer); the module path remains the reference implementation."""
    b, tfrm, d = hvar.shape
    if max_len is None:
        max_len = tfrm
    cfg = model.config
    dt = model.dtype
    dp = extract_decode_params(model, params)
    mem_k, mem_v = precompute_memory_packed(model, params, hvar)
    step = make_packed_step(
        dp, mem_k, mem_v, max_len, memory_key_padding_mask, dt
    )
    carry0 = init_packed_carry(
        cfg.n_layers, b, max_len, cfg.n_heads, d // cfg.n_heads, model.n_mels, dt
    )
    unroll = max(1, int(cfg.chunk_size))
    (_, _, _), mels = jax.lax.scan(
        step, carry0, jnp.arange(max_len, dtype=jnp.int32), unroll=unroll
    )
    return jnp.swapaxes(mels, 0, 1)


def ar_decode_chunk(
    step,
    carry,
    pos0: jnp.ndarray,  # scalar int32: first position of this chunk
    chunk: int,
    unroll: int = 1,
):
    """Advance the packed decoder by `chunk` frames from `carry`.

    Returns (carry', mel_chunk [B, chunk, n_mels]).  Splitting the one-shot
    scan into segments is carry-exact: chaining ar_decode_chunk calls yields
    bit-identical mels to ar_decode_packed (asserted by
    tests/test_pipeline.py streaming equivalence tests).  This is the
    streaming unit: first audio after `chunk` decode steps instead of after
    the full utterance (reference design.md:799-824's goal; its chunk_size
    knob never actually chunked, reference: models/ar_decoder.py:198-229)."""
    carry, mels = jax.lax.scan(
        step,
        carry,
        pos0 + jnp.arange(chunk, dtype=jnp.int32),
        unroll=max(1, unroll),
    )
    return carry, jnp.swapaxes(mels, 0, 1)


def init_decoder_caches(
    config: DecoderConfig, d_model: int, batch: int, max_len: int, dtype=jnp.float32
) -> List[KVCache]:
    dh = d_model // config.n_heads
    shape = (batch, max_len, config.n_heads, dh)
    return [
        KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))
        for _ in range(config.n_layers)
    ]


def _pallas_decode_wanted(
    model: PNCAARDecoder, batch: int, max_len: int, mem_len: int
) -> bool:
    import os

    from ..ops.pallas.decode_kernel import pallas_decode_fits

    flag = os.getenv("SAMBERT_PALLAS_DECODE", "auto")
    if flag == "0":
        return False
    on_tpu = jax.default_backend() == "tpu"
    cfg = model.config
    eligible = (
        batch <= 32  # batch rows ride the [R, d] row tile (R = ceil(B/8)*8)
        and model.d_model % cfg.n_heads == 0
        and model.d_model >= 128  # lane-width floor for the head-fold trick
        and pallas_decode_fits(
            cfg.n_layers, batch, max_len, mem_len, model.d_model, cfg.d_ff
        )
    )
    if flag == "1":
        return eligible
    return on_tpu and eligible


def ar_decode(
    model: PNCAARDecoder,
    params,
    hvar: jnp.ndarray,
    max_len: Optional[int] = None,
    memory_key_padding_mask: Optional[jnp.ndarray] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Autoregressive mel generation.

    Starts from a zero frame, generates max_len frames, and (unlike the
    reference, which re-encodes the growing prefix every step,
    models/ar_decoder.py:191-233) carries all state in per-layer KV caches.

    Two engines, identical math:
      * batch <= 32 on TPU (VMEM permitting): the Pallas mega-kernel
        (ops/pallas/decode_kernel) runs the whole loop on-chip —
        VMEM-resident caches, double-buffered weight streaming, no per-step
        dispatch overhead.  Batch rows ride the sublanes of the [R, d]
        row tile (R = ceil(B/8)*8 <= 32), so every batch element shares ONE
        weight stream (the bottleneck): batched decode costs ~the B=1
        latency, not B kernel runs;
      * otherwise: a lax.scan over packed weights (weight streaming amortizes
        across the large batch there).
    Override with use_pallas or SAMBERT_PALLAS_DECODE=0/1/auto.
    """
    b = hvar.shape[0]
    if max_len is None:
        max_len = hvar.shape[1]
    if use_pallas is None:
        use_pallas = _pallas_decode_wanted(model, b, max_len, hvar.shape[1])
    if use_pallas and b <= 32:
        dp = extract_decode_params(model, params)
        mem_k, mem_v = precompute_memory_packed(model, params, hvar)
        kwargs = dict(
            n_heads=model.config.n_heads,
            n_mels=model.n_mels,
            interpret=jax.default_backend() != "tpu",
        )
        from ..ops.pallas.decode_kernel import pallas_ar_decode

        # An int8-VMEM-resident variant was built and measured (round 4) and
        # removed in round 5: not faster (the bf16 kernel's double-buffered
        # weight stream already hides fully behind the issue-latency-bound
        # serial compute), and its resident int8 weights (~5.5 MB) occupy
        # MORE VMEM than the streaming kernel's two-slice buffer (~3.7 MB),
        # so it cannot extend batched T/B reach either.  Full writeup in
        # docs/performance.md; the engine lives in git history (<= d55c6c8,
        # ops/pallas/decode_kernel_q.py).
        out = pallas_ar_decode(
            dp, mem_k, mem_v, max_len, memory_key_padding_mask, **kwargs
        )
        return out.astype(hvar.dtype)
    return ar_decode_packed(model, params, hvar, max_len, memory_key_padding_mask)


def ar_decode_module(
    model: PNCAARDecoder,
    params,
    hvar: jnp.ndarray,  # [B, Tfrm, d]
    max_len: Optional[int] = None,
    memory_key_padding_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference scan implementation through the flax module's decode_step
    (kept as the equivalence baseline for ar_decode_packed)."""
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

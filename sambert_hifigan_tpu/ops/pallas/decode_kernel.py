"""Pallas mega-kernel: the ENTIRE autoregressive mel decode loop on-chip.

Why: the XLA scan path costs ~90 us/frame, and profiling shows it is
op-dispatch bound — ~150 small HLO ops per step at ~0.5-1 us each (removing
the FFN, 80%% of the FLOPs/weights, saves only 8%%).  This kernel runs the
whole T-step, L-layer decode as ONE Pallas program:

  * KV caches ([L*B, T, d] bf16) and the cross-attention memory K/V live in
    VMEM for the entire decode — zero HBM cache traffic,
  * per-layer weight matrices stream HBM -> VMEM through a 2-slot
    double-buffered DMA pipeline that runs one layer ahead of compute,
  * all per-step ops execute back-to-back on the VPU/MXU with no XLA loop
    or dispatch machinery.

HBM traffic collapses to the irreducible weight stream (T * 16.5 MB), which
double-buffering overlaps with compute.

Batching (B <= 32): the row tile is [R, d] with R = ceil(B/8)*8 (8, 16, or
32 sublane rows) and a B=1 decode leaves 7 dead sublanes in every matmul.
Batch elements ride in those rows: all dense matmuls ([R, d] @ [d, *]) are
the SAME size for any B <= R, and the per-step weight stream — the
bottleneck — is shared across the whole batch.  Only the attention reads
(one [T, d] pass per batch row) and the cache staging scale with B, so
batched decode costs ~the B=1 latency instead of B sequential kernel runs,
and B=16/32 reuses ONE weight stream where two/four sequential B=8 launches
would stream the weights two/four times.  (R is independent of the 8-step
staging/flush granularity SUB, which stays fixed.)

Head-folded attention (d = 256 = 8 heads x 32): with lanes packed h-major,
scores for all heads come from one VPU multiply + one [T, d] @ G matmul where
G[c, h] = 1 iff lane c belongs to head h; the weighted value sum is the
transpose trick with G^T.  No per-head loops, no tiny matmuls.

Numerics match ar_decode_packed: bf16 matmul inputs with f32 accumulation,
f32 softmax and LayerNorm.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 8  # staging granularity (steps between cache flushes) and min row tile
MAX_ROWS = 32  # max batch rows in one kernel (VMEM cache budget bound)


def _head_group_matrix(d: int, n_heads: int, pad_to: int = 128) -> np.ndarray:
    """G [d, pad_to]: G[c, h] = 1 iff lane c is in head h (h-major lanes);
    columns beyond n_heads are zero (lane padding for the VPU/MXU — the extra
    score columns are inert because G^T's corresponding rows are zero)."""
    dh = d // n_heads
    g = np.zeros((d, max(n_heads, pad_to)), np.float32)
    for h in range(n_heads):
        g[h * dh : (h + 1) * dh, h] = 1.0
    return g


def _decode_kernel(
    # --- scalar prefetch ---
    n_steps_ref,  # [1] int32 (actual steps to run; buffers sized T)
    # --- VMEM operands ---
    biases_ref,  # [L, 8, ff] f32: rows 0..5 = bqkv(768) | bo | bcq | bco | b1(2048) | b2, zero-padded to ff lanes
    ln_ref,  # [L*3*2, d] f32
    prenet_w1_ref,  # [n_mels_pad, d] bf16 (80 -> padded rows)
    prenet_w2_ref,  # [d, d] bf16
    prenet_b_ref,  # [2, d] f32 (b1, b2)
    mel_w_ref,  # [d, n_mels_pad] bf16
    mel_b_ref,  # [1, n_mels_pad] f32
    pe_ref,  # [T, d] f32
    g_ref,  # [d, 128] bf16 head-group matrix (lane-padded)
    mem_bias_ref,  # [B, S, 1] f32 additive cross-attention bias (-1e9 on pads)
    # --- HBM operands (streamed / resident) ---
    wqkv_hbm,  # [L, d, 3d] bf16
    wo_hbm,  # [L, d, d]
    wcq_hbm,  # [L, d, d]
    wco_hbm,  # [L, d, d]
    w1_hbm,  # [L, d, ff]
    w2_hbm,  # [L, ff, d]
    mem_k_hbm,  # [L*B, S, d] bf16
    mem_v_hbm,  # [L*B, S, d] bf16
    # --- output ---
    out_ref,  # [B, T, n_mels_pad] f32
    # --- scratch ---
    kcache,  # [L*B, T, d] bf16
    vcache,  # [L*B, T, d] bf16
    memk,  # [L*B, S, d] bf16
    memv,  # [L*B, S, d] bf16
    wqkv_s,  # [2, d, 3d] bf16
    wo_s,  # [2, d, d]
    wcq_s,  # [2, d, d]
    wco_s,  # [2, d, d]
    w1_s,  # [2, d, ff]
    w2_s,  # [2, ff, d]
    mel_s,  # [R, n_mels_pad] f32 (carries prev mel frames, rows 0..B-1)
    kstage,  # [L*B, 8, d] bf16 staging (cache rows awaiting aligned flush)
    vstage,  # [L*B, 8, d] bf16
    mstage,  # [B, 8, n_mels_pad] f32
    w_sems,  # DMA sems [2, 6]
    m_sems,  # DMA sems [2]
    f_sems,  # DMA sems [3] (cache/output flushes)
    *,
    L: int,
    B: int,
    T: int,
    S: int,
    D: int,
    H: int,
    FF: int,
    NMEL: int,
    R: int = SUB,  # row tile (batch capacity): 8, 16 or 32 sublane rows
):
    DH = D // H
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    neg = f32(-1e9)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)

    def weight_dma(slot, l):
        return [
            pltpu.make_async_copy(src.at[l], dst.at[slot], w_sems.at[slot, i])
            for i, (src, dst) in enumerate(
                [
                    (wqkv_hbm, wqkv_s),
                    (wo_hbm, wo_s),
                    (wcq_hbm, wcq_s),
                    (wco_hbm, wco_s),
                    (w1_hbm, w1_s),
                    (w2_hbm, w2_s),
                ]
            )
        ]

    # Preload memory K/V into VMEM (resident for the whole decode).
    mk_dma = pltpu.make_async_copy(mem_k_hbm, memk, m_sems.at[0])
    mv_dma = pltpu.make_async_copy(mem_v_hbm, memv, m_sems.at[1])
    mk_dma.start()
    mv_dma.start()

    # Zero state.  Caches/staging must not hold NaN garbage: masked-out rows
    # are still READ by the attention products before masking, and NaN * 0
    # poisons the softmax.  One-time O(L*B*T*D) init, amortized over all steps.
    mel_s[:] = jnp.zeros((R, NMEL), f32)
    kcache[:] = jnp.zeros((L * B, T, D), bf16)
    vcache[:] = jnp.zeros((L * B, T, D), bf16)
    kstage[:] = jnp.zeros((L * B, SUB, D), bf16)
    vstage[:] = jnp.zeros((L * B, SUB, D), bf16)
    mstage[:] = jnp.zeros((B, SUB, NMEL), f32)

    # Warm the weight pipeline with layer 0.
    for dma in weight_dma(0, 0):
        dma.start()

    mk_dma.wait()
    mv_dma.wait()

    def ln(x32, idx):
        # x32 [SUB, D] f32; ln_ref rows: [scale, bias] at 2*idx, 2*idx+1
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        return y * ln_ref[2 * idx, :] + ln_ref[2 * idx + 1, :]

    def pad_rows(rows):
        """Stack B [1, C] rows (+ zero rows) into an [R, C] tile."""
        c = rows[0].shape[-1]
        if B < R:
            rows = rows + [jnp.zeros((R - B, c), rows[0].dtype)]
        return jnp.concatenate(rows, axis=0)

    def attend_cross(q32, l):
        """Cross-attention for all batch rows: q32 [SUB, D] f32 (rows 0..B-1
        live) against the VMEM-resident memory K/V of each batch element.
        Returns [SUB, D] f32."""
        outs = []
        for b in range(B):
            qrow = (q32[b : b + 1, :] / np.sqrt(DH)).astype(bf16)  # [1, D]
            keys = memk[l * B + b]
            values = memv[l * B + b]
            prod = (keys * qrow).astype(bf16)  # [S, D]
            scores = jnp.dot(prod, g_ref[:], preferred_element_type=f32)
            scores = scores + mem_bias_ref[b]  # [S, H] + [S, 1]
            m = jnp.max(scores, axis=0, keepdims=True)
            e = jnp.exp(scores - m)
            s = jnp.sum(e, axis=0, keepdims=True)
            w = (e / s).astype(bf16)  # [S, Hpad]
            wexp = jnp.dot(w, g_ref[:].T, preferred_element_type=f32)
            outs.append(
                jnp.sum(wexp * values.astype(f32), axis=0, keepdims=True)
            )
        return pad_rows(outs)

    stage_iota = jax.lax.broadcasted_iota(jnp.int32, (SUB, 1), 0)

    def attend_self(q32, l, j, base):
        """Causal self-attention for all batch rows over two key/value
        sources per row b (the current step's K/V are ALREADY staged at row
        j by layer_body, collapsing the old three-source softmax):
          kcache/vcache[l*B+b] [T, D]  flushed cache rows  (valid: row < base)
          kstage/vstage[l*B+b] [8, D]  staging rows        (valid: row <= j)
        The flushed cache is never rewritten per step — the masked O(T)
        read-modify-write this replaces was the kernel's dominant VPU cost.
        Returns [SUB, D] f32."""
        mask1 = (t_iota >= base).astype(f32) * neg
        mask2 = (stage_iota > j).astype(f32) * neg
        outs = []
        for b in range(B):
            qrow = (q32[b : b + 1, :] / np.sqrt(DH)).astype(bf16)
            keys, values = kcache[l * B + b], vcache[l * B + b]
            kst, vst = kstage[l * B + b], vstage[l * B + b]
            s1 = jnp.dot((keys * qrow).astype(bf16), g_ref[:],
                         preferred_element_type=f32) + mask1  # [T, H]
            s2 = jnp.dot((kst * qrow).astype(bf16), g_ref[:],
                         preferred_element_type=f32) + mask2  # [8, H]
            m = jnp.maximum(
                jnp.max(s1, axis=0, keepdims=True),
                jnp.max(s2, axis=0, keepdims=True),
            )
            e1 = jnp.exp(s1 - m)
            e2 = jnp.exp(s2 - m)
            denom = jnp.sum(e1, axis=0, keepdims=True) + jnp.sum(
                e2, axis=0, keepdims=True
            )
            w1 = (e1 / denom).astype(bf16)
            w2 = (e2 / denom).astype(bf16)
            o = jnp.sum(
                jnp.dot(w1, g_ref[:].T, preferred_element_type=f32)
                * values.astype(f32),
                axis=0, keepdims=True,
            )
            o = o + jnp.sum(
                jnp.dot(w2, g_ref[:].T, preferred_element_type=f32)
                * vst.astype(f32),
                axis=0, keepdims=True,
            )
            outs.append(o)
        return pad_rows(outs)

    mstage_iota = jax.lax.broadcasted_iota(jnp.int32, (B, SUB, 1), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)

    def step(t, _):
        base = (t // 8) * 8
        j = t - base
        # prenet on the previous mel frames (rows 0..B-1)
        x = jnp.dot(
            mel_s[:].astype(bf16), prenet_w1_ref[:NMEL, :],
            preferred_element_type=f32,
        )
        x = jnp.maximum(x + prenet_b_ref[0:1, :], 0.0)
        x = jnp.dot(x.astype(bf16), prenet_w2_ref[:], preferred_element_type=f32)
        x = x + prenet_b_ref[1:2, :]
        # dynamic single-row access is not sublane-aligned for Mosaic;
        # select the pe row with a mask-reduce instead (one VPU pass)
        pe_row = jnp.sum(
            pe_ref[:] * (t_iota == t).astype(f32), axis=0, keepdims=True
        )
        x = x + pe_row  # same position for every batch row

        def layer_body(l, x):
            if L % 2 == 0:
                # t*L is even -> slot parity is static per unrolled layer
                slot = l % 2
                nxt = (l + 1) % 2
            else:
                slot = jax.lax.rem(t * L + l, 2)
                nxt = jax.lax.rem(t * L + l + 1, 2)
            # wait for this layer's weights
            for dma in weight_dma(slot, l):
                dma.wait()
            # prefetch next layer's weights (cyclic; l is a python int here)
            next_l = (l + 1) % L

            @pl.when(jnp.logical_or(t + 1 < n_steps_ref[0], l + 1 < L))
            def _():
                for dma in weight_dma(nxt, next_l):
                    dma.start()

            # ---- self-attention (staged cache: no O(T) rewrite) ----
            qkv = jnp.dot(
                x.astype(bf16), wqkv_s[slot], preferred_element_type=f32
            )  # [SUB, 3D]
            qkv = qkv + biases_ref[l, 0:1, : 3 * D]
            q = qkv[:, :D]
            k_t = qkv[:, D : 2 * D].astype(bf16)  # rows 0..B-1 live
            v_t = qkv[:, 2 * D :].astype(bf16)
            # stage this layer's K/V at row j BEFORE attending: the softmax
            # then runs over just cache + stage (two sources, not three)
            sel = stage_iota == j  # [SUB, 1]
            k_rows = jnp.concatenate(
                [k_t[b : b + 1][None] for b in range(B)], axis=0
            )  # [B, 1, D]
            v_rows = jnp.concatenate(
                [v_t[b : b + 1][None] for b in range(B)], axis=0
            )
            kstage[l * B : (l + 1) * B] = jnp.where(
                sel[None], jnp.broadcast_to(k_rows, (B, SUB, D)),
                kstage[l * B : (l + 1) * B],
            )
            vstage[l * B : (l + 1) * B] = jnp.where(
                sel[None], jnp.broadcast_to(v_rows, (B, SUB, D)),
                vstage[l * B : (l + 1) * B],
            )
            sa = attend_self(q, l, j, base)
            sa = jnp.dot(sa.astype(bf16), wo_s[slot], preferred_element_type=f32)
            sa = sa + biases_ref[l, 1:2, :D]
            x = ln(x + sa, 3 * l + 0)
            # ---- cross-attention ----
            cq = jnp.dot(x.astype(bf16), wcq_s[slot], preferred_element_type=f32)
            cq = cq + biases_ref[l, 2:3, :D]
            ca = attend_cross(cq, l)
            ca = jnp.dot(ca.astype(bf16), wco_s[slot], preferred_element_type=f32)
            ca = ca + biases_ref[l, 3:4, :D]
            x = ln(x + ca, 3 * l + 1)
            # ---- FFN ----
            hmid = jnp.dot(x.astype(bf16), w1_s[slot], preferred_element_type=f32)
            hmid = jnp.maximum(hmid + biases_ref[l, 4:5, :FF], 0.0)
            ff = jnp.dot(hmid.astype(bf16), w2_s[slot], preferred_element_type=f32)
            ff = ff + biases_ref[l, 5:6, :D]
            return ln(x + ff, 3 * l + 2)

        # layers are a static unrolled chain (L is small); fori would need the
        # DMA handles rebuilt per l anyway
        for l in range(L):
            x = layer_body(l, x)

        mel_t = jnp.dot(x.astype(bf16), mel_w_ref[:], preferred_element_type=f32)
        mel_t = mel_t + mel_b_ref[0:1, :]
        # dead rows B..SUB-1 are zeroed so they can't drift to inf/NaN across
        # steps (they feed back through the prenet matmul)
        mel_s[:] = jnp.where(row_iota < B, mel_t, 0.0)

        # stage this step's mel rows (K/V were staged per layer above): an
        # O(8) masked write instead of the O(T) output rewrite
        mel_rows = jnp.concatenate(
            [mel_t[b : b + 1][None] for b in range(B)], axis=0
        )  # [B, 1, NMEL]
        mstage[:] = jnp.where(
            mstage_iota == j,
            jnp.broadcast_to(mel_rows, (B, SUB, NMEL)),
            mstage[:],
        )

        # aligned flush every 8 steps: staging -> cache/output via DMA
        @pl.when(j == 7)
        def _flush_now():
            flush(base)

        return 0

    def flush(base):
        start = pl.multiple_of(base, 8)
        d1 = pltpu.make_async_copy(
            kstage, kcache.at[:, pl.ds(start, 8), :], f_sems.at[0]
        )
        d2 = pltpu.make_async_copy(
            vstage, vcache.at[:, pl.ds(start, 8), :], f_sems.at[1]
        )
        d3 = pltpu.make_async_copy(
            mstage, out_ref.at[:, pl.ds(start, 8), :], f_sems.at[2]
        )
        d1.start(); d2.start(); d3.start()
        d1.wait(); d2.wait(); d3.wait()

    jax.lax.fori_loop(0, n_steps_ref[0], step, 0)

    # trailing partial block (n_steps not a multiple of 8): flush the last
    # staging rows; rows beyond n_steps carry stale data the caller slices off
    @pl.when(n_steps_ref[0] % 8 != 0)
    def _():
        flush((n_steps_ref[0] // 8) * 8)


def pallas_decode_vmem_bytes(
    L: int, B: int, T: int, S: int, d: int, ff: int
) -> int:
    """Estimated VMEM footprint of the mega-kernel's scratch buffers."""
    t_pad = -(-T // 8) * 8
    caches = 2 * L * B * t_pad * d * 2
    mem = 2 * L * B * S * d * 2
    weights = 2 * (3 * d * d + 3 * d * d + 2 * d * ff) * 2
    pe_out = t_pad * d * 4 + B * t_pad * 128 * 4
    return caches + mem + weights + pe_out


def pallas_decode_fits(L: int, B: int, T: int, S: int, d: int, ff: int) -> bool:
    """True if the batched kernel's scratch fits the VMEM budget."""
    return pallas_decode_vmem_bytes(L, B, T, S, d, ff) < 88 * 1024 * 1024


def pallas_ar_decode(
    dp,  # DecodeParams (from models.ar_decoder.extract_decode_params)
    mem_k: jnp.ndarray,  # [L, B, S, H, dh]
    mem_v: jnp.ndarray,
    max_len: int,
    memory_key_padding_mask: Optional[jnp.ndarray],  # [B, S] bool or None
    n_heads: int,
    n_mels: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the mega-kernel.  Returns mel [B, max_len, n_mels] (f32)."""
    L, d, d3 = dp.wqkv.shape
    FF = dp.w1.shape[-1]
    T = -(-max_len // 8) * 8  # buffers padded to the 8-step flush granularity
    B = mem_k.shape[1]
    S = mem_k.shape[2]
    H = n_heads
    NMEL_PAD = 128  # lane-pad the mel dim
    bf16 = jnp.bfloat16
    if B > MAX_ROWS:
        raise ValueError(f"pallas_ar_decode supports batch <= {MAX_ROWS}, got {B}")
    R = max(SUB, -(-B // SUB) * SUB)  # row tile: 8, 16, 24 or 32

    # ---- pack small operands ----
    BW = max(FF, 3 * d)
    biases = jnp.zeros((L, SUB, BW), jnp.float32)
    biases = biases.at[:, 0, : 3 * d].set(dp.bqkv.astype(jnp.float32))
    biases = biases.at[:, 1, :d].set(dp.bo.astype(jnp.float32))
    biases = biases.at[:, 2, :d].set(dp.bcq.astype(jnp.float32))
    biases = biases.at[:, 3, :d].set(dp.bco.astype(jnp.float32))
    biases = biases.at[:, 4, :FF].set(dp.b1.astype(jnp.float32))
    biases = biases.at[:, 5, :d].set(dp.b2.astype(jnp.float32))
    ln_flat = dp.ln.reshape(L * 3 * 2, d)  # [(l, norm, scale/bias), d]

    prenet_w1 = jnp.zeros((NMEL_PAD, d), bf16).at[:n_mels].set(
        dp.prenet_w1.astype(bf16)
    )
    prenet_b = jnp.stack(
        [dp.prenet_b1.astype(jnp.float32), dp.prenet_b2.astype(jnp.float32)]
    )
    mel_w = jnp.zeros((d, NMEL_PAD), bf16).at[:, :n_mels].set(dp.mel_w.astype(bf16))
    mel_b = jnp.zeros((1, NMEL_PAD), jnp.float32).at[0, :n_mels].set(
        dp.mel_b.astype(jnp.float32)
    )
    pe = dp.pe[:T].astype(jnp.float32)
    g = jnp.asarray(_head_group_matrix(d, H)).astype(bf16)
    if memory_key_padding_mask is not None:
        mem_bias = jnp.where(memory_key_padding_mask, -1e9, 0.0).astype(
            jnp.float32
        )[:, :, None]  # [B, S, 1]
    else:
        mem_bias = jnp.zeros((B, S, 1), jnp.float32)

    # [L, B, S, H, dh] -> [L*B, S, d]
    mem_k_flat = mem_k.reshape(L * B, S, d).astype(bf16)
    mem_v_flat = mem_v.reshape(L * B, S, d).astype(bf16)

    kernel = functools.partial(
        _decode_kernel, L=L, B=B, T=T, S=S, D=d, H=H, FF=FF, NMEL=NMEL_PAD, R=R
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # biases
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prenet_w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prenet_w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # prenet_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mel_w
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mel_b
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pe
            pl.BlockSpec(memory_space=pltpu.VMEM),  # g
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mem_bias
            pl.BlockSpec(memory_space=pl.ANY),  # wqkv
            pl.BlockSpec(memory_space=pl.ANY),  # wo
            pl.BlockSpec(memory_space=pl.ANY),  # wcq
            pl.BlockSpec(memory_space=pl.ANY),  # wco
            pl.BlockSpec(memory_space=pl.ANY),  # w1
            pl.BlockSpec(memory_space=pl.ANY),  # w2
            pl.BlockSpec(memory_space=pl.ANY),  # mem_k
            pl.BlockSpec(memory_space=pl.ANY),  # mem_v
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L * B, T, d), bf16),  # kcache
            pltpu.VMEM((L * B, T, d), bf16),  # vcache
            pltpu.VMEM((L * B, S, d), bf16),  # memk
            pltpu.VMEM((L * B, S, d), bf16),  # memv
            pltpu.VMEM((2, d, 3 * d), bf16),  # wqkv slots
            pltpu.VMEM((2, d, d), bf16),  # wo
            pltpu.VMEM((2, d, d), bf16),  # wcq
            pltpu.VMEM((2, d, d), bf16),  # wco
            pltpu.VMEM((2, d, FF), bf16),  # w1
            pltpu.VMEM((2, FF, d), bf16),  # w2
            pltpu.VMEM((R, NMEL_PAD), jnp.float32),  # mel carry
            pltpu.VMEM((L * B, SUB, d), bf16),  # kstage
            pltpu.VMEM((L * B, SUB, d), bf16),  # vstage
            pltpu.VMEM((B, SUB, NMEL_PAD), jnp.float32),  # mstage
            pltpu.SemaphoreType.DMA((2, 6)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, NMEL_PAD), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray([max_len], jnp.int32),
        biases,
        ln_flat,
        prenet_w1,
        dp.prenet_w2.astype(bf16),
        prenet_b,
        mel_w,
        mel_b,
        pe,
        g,
        mem_bias,
        dp.wqkv.astype(bf16),
        dp.wo.astype(bf16),
        dp.wcq.astype(bf16),
        dp.wco.astype(bf16),
        dp.w1.astype(bf16),
        dp.w2.astype(bf16),
        mem_k_flat,
        mem_v_flat,
    )
    return out[:, :max_len, :n_mels]

"""Int8-weight variant of the Pallas decode mega-kernel (opt-in).

The bf16 kernel (decode_kernel.py) is weight-streaming bound: 16.5 MB of
weights cross HBM per generated frame because the full decoder (19 MB bf16)
does not fit VMEM.  Quantized to per-output-channel symmetric int8, the
weights shrink to ~8.6 MB and live in VMEM for the WHOLE decode — per-step
HBM traffic drops to zero and the step becomes compute/latency bound.

Quantization scheme:
  * weights: w_q[., co] = round(w / s_co), s_co = max|w[., co]| / 127
    (per-output-channel symmetric; computed from the f32/bf16 params once),
  * activations: dynamic per-tensor symmetric int8 at each matmul input
    (s_x = max|x| / 127), int8 x int8 -> int32 on the MXU, dequantized as
    acc * (s_x * s_co) in f32,
  * LayerNorm, softmax, attention (against bf16 caches) stay bf16/f32.

This changes numerics (unlike every other kernel in this repo) and is gated
behind SAMBERT_PALLAS_DECODE=int8.  Measured mel deviation is bounded by
tests (MAD < 0.05 vs the bf16 engine).

Measured on v5e (512 frames, reference config): int8 16.0 ms vs bf16
14.7 ms — NOT faster, despite zero per-step HBM weight traffic.  The bf16
kernel's double-buffered streaming already fully overlaps the serial
per-frame compute, which is issue-latency-bound (~30 small [8,d] matmuls
per frame), so removing the streaming does not shorten the critical path.
The kernel remains useful where HBM bandwidth is contended (e.g. decode
colocated with training) or HBM capacity is tight, not for latency.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_kernel import SUB, _head_group_matrix

I8_MAX = 127.0


def _quantize_weight(w: jnp.ndarray):
    """w [..., Dout] -> (int8 weights, scales [1, Dout] f32)."""
    w32 = w.astype(jnp.float32)
    axes = tuple(range(w32.ndim - 1))
    s = jnp.max(jnp.abs(w32), axis=axes, keepdims=False) / I8_MAX + 1e-12
    q = jnp.clip(jnp.round(w32 / s), -I8_MAX, I8_MAX).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def _decode_kernel_q(
    n_steps_ref,
    # VMEM operands
    biases_ref,  # [L, 8, BW] f32
    ln_ref,  # [L*3*2, d] f32
    scales_ref,  # [L, 8, BW] f32 (per-channel weight scales, same row layout)
    prenet_w1_ref,  # [NMEL, d] bf16
    prenet_w2_ref,  # [d, d] bf16
    prenet_b_ref,  # [2, d] f32
    mel_w_ref,  # [d, NMEL] bf16
    mel_b_ref,  # [1, NMEL] f32
    pe_ref,  # [T, d] f32
    g_ref,  # [d, 128] bf16
    mem_bias_ref,  # [S, 1] f32
    # int8 weights, fully VMEM-resident
    wqkv_ref,  # [L, d, 3d] int8
    wo_ref,  # [L, d, d]
    wcq_ref,
    wco_ref,
    w1_ref,  # [L, d, ff]
    w2_ref,  # [L, ff, d]
    memk_ref,  # [L, S, d] bf16
    memv_ref,  # [L, S, d] bf16
    out_ref,  # [T, NMEL] f32
    # scratch
    kcache,  # [L, T, d] bf16
    vcache,
    mel_s,  # [SUB, NMEL] f32
    *,
    L: int,
    T: int,
    S: int,
    D: int,
    H: int,
    FF: int,
    NMEL: int,
):
    DH = D // H
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    i32 = jnp.int32
    neg = f32(-1e9)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)

    mel_s[:] = jnp.zeros((SUB, NMEL), f32)
    kcache[:] = jnp.zeros((L, T, D), bf16)
    vcache[:] = jnp.zeros((L, T, D), bf16)

    def ln(x32, idx):
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        return y * ln_ref[2 * idx, :] + ln_ref[2 * idx + 1, :]

    def qmat(x32, w_ref_i8, l, scale_row, width):
        """x32 [SUB, Din] f32 @ int8 weights -> [SUB, width] f32."""
        sx = jnp.max(jnp.abs(x32)) / I8_MAX + 1e-12
        xi = jnp.clip(jnp.round(x32 / sx), -I8_MAX, I8_MAX).astype(jnp.int8)
        acc = jnp.dot(xi, w_ref_i8[l], preferred_element_type=i32)
        return acc.astype(f32) * (sx * scales_ref[l, scale_row, :width])

    def attend(q32, keys, values, bias_col, pos):
        qrow = (q32[0:1, :] / np.sqrt(DH)).astype(bf16)
        prod = (keys * qrow).astype(bf16)
        scores = jnp.dot(prod, g_ref[:], preferred_element_type=f32)
        if bias_col is None:
            scores = scores + (t_iota > pos).astype(f32) * neg
        else:
            scores = scores + bias_col
        m = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - m)
        s = jnp.sum(e, axis=0, keepdims=True)
        w = (e / s).astype(bf16)
        wexp = jnp.dot(w, g_ref[:].T, preferred_element_type=f32)
        o = jnp.sum(wexp * values.astype(f32), axis=0, keepdims=True)
        return jnp.broadcast_to(o, (SUB, D))

    def step(t, _):
        x = jnp.dot(
            mel_s[:].astype(bf16), prenet_w1_ref[:NMEL, :],
            preferred_element_type=f32,
        )
        x = jnp.maximum(x + prenet_b_ref[0:1, :], 0.0)
        x = jnp.dot(x.astype(bf16), prenet_w2_ref[:], preferred_element_type=f32)
        x = x + prenet_b_ref[1:2, :]
        pe_row = jnp.sum(
            pe_ref[:] * (t_iota == t).astype(f32), axis=0, keepdims=True
        )
        x = x + pe_row

        for l in range(L):
            qkv = qmat(x, wqkv_ref, l, 0, 3 * D) + biases_ref[l, 0:1, : 3 * D]
            q = qkv[:, :D]
            k_t = qkv[0:1, D : 2 * D].astype(bf16)
            v_t = qkv[0:1, 2 * D :].astype(bf16)
            row_is_t = t_iota == t
            kcache[l] = jnp.where(row_is_t, jnp.broadcast_to(k_t, (T, D)), kcache[l])
            vcache[l] = jnp.where(row_is_t, jnp.broadcast_to(v_t, (T, D)), vcache[l])
            sa = attend(q, kcache[l], vcache[l], None, t)
            sa = qmat(sa, wo_ref, l, 1, D) + biases_ref[l, 1:2, :D]
            x = ln(x + sa, 3 * l + 0)
            cq = qmat(x, wcq_ref, l, 2, D) + biases_ref[l, 2:3, :D]
            ca = attend(cq, memk_ref[l], memv_ref[l], mem_bias_ref[:], 0)
            ca = qmat(ca, wco_ref, l, 3, D) + biases_ref[l, 3:4, :D]
            x = ln(x + ca, 3 * l + 1)
            hmid = jnp.maximum(
                qmat(x, w1_ref, l, 4, FF) + biases_ref[l, 4:5, :FF], 0.0
            )
            ff = qmat(hmid, w2_ref, l, 5, D) + biases_ref[l, 5:6, :D]
            x = ln(x + ff, 3 * l + 2)

        mel_t = jnp.dot(x.astype(bf16), mel_w_ref[:], preferred_element_type=f32)
        mel_t = mel_t + mel_b_ref[0:1, :]
        mel_s[:] = jnp.broadcast_to(mel_t[0:1, :], (SUB, NMEL))
        out_ref[:] = jnp.where(
            t_iota == t, jnp.broadcast_to(mel_t[0:1, :], (T, NMEL)), out_ref[:]
        )
        return _

    jax.lax.fori_loop(0, n_steps_ref[0], step, 0)


def pallas_ar_decode_int8(
    dp,  # DecodeParams
    mem_k: jnp.ndarray,  # [L, 1, S, H, dh]
    mem_v: jnp.ndarray,
    max_len: int,
    memory_key_padding_mask: Optional[jnp.ndarray],
    n_heads: int,
    n_mels: int,
    interpret: bool = False,
) -> jnp.ndarray:
    L, d, d3 = dp.wqkv.shape
    FF = dp.w1.shape[-1]
    T = max_len
    S = mem_k.shape[2]
    H = n_heads
    NMEL_PAD = 128
    bf16 = jnp.bfloat16
    BW = max(FF, 3 * d)

    biases = jnp.zeros((L, SUB, BW), jnp.float32)
    biases = biases.at[:, 0, : 3 * d].set(dp.bqkv.astype(jnp.float32))
    biases = biases.at[:, 1, :d].set(dp.bo.astype(jnp.float32))
    biases = biases.at[:, 2, :d].set(dp.bcq.astype(jnp.float32))
    biases = biases.at[:, 3, :d].set(dp.bco.astype(jnp.float32))
    biases = biases.at[:, 4, :FF].set(dp.b1.astype(jnp.float32))
    biases = biases.at[:, 5, :d].set(dp.b2.astype(jnp.float32))
    ln_flat = dp.ln.reshape(L * 3 * 2, d)

    scales = jnp.zeros((L, SUB, BW), jnp.float32)
    qs = {}
    for name, w, row, width in (
        ("wqkv", dp.wqkv, 0, 3 * d),
        ("wo", dp.wo, 1, d),
        ("wcq", dp.wcq, 2, d),
        ("wco", dp.wco, 3, d),
        ("w1", dp.w1, 4, FF),
        ("w2", dp.w2, 5, d),
    ):
        qw, s = jax.vmap(_quantize_weight)(w)  # [L, ...] int8, [L, width]
        qs[name] = qw
        scales = scales.at[:, row, :width].set(s)

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
        mem_bias = jnp.where(memory_key_padding_mask[0], -1e9, 0.0).astype(
            jnp.float32
        )[:, None]
    else:
        mem_bias = jnp.zeros((S, 1), jnp.float32)
    mem_k_flat = mem_k[:, 0].reshape(L, S, d).astype(bf16)
    mem_v_flat = mem_v[:, 0].reshape(L, S, d).astype(bf16)

    kernel = functools.partial(
        _decode_kernel_q, L=L, T=T, S=S, D=d, H=H, FF=FF, NMEL=NMEL_PAD
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 19,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((L, T, d), bf16),  # kcache
            pltpu.VMEM((L, T, d), bf16),  # vcache
            pltpu.VMEM((SUB, NMEL_PAD), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, NMEL_PAD), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray([max_len], jnp.int32),
        biases,
        ln_flat,
        scales,
        prenet_w1,
        dp.prenet_w2.astype(bf16),
        prenet_b,
        mel_w,
        mel_b,
        pe,
        g,
        mem_bias,
        qs["wqkv"],
        qs["wo"],
        qs["wcq"],
        qs["wco"],
        qs["w1"],
        qs["w2"],
        mem_k_flat,
        mem_v_flat,
    )
    return out[None, :, :n_mels]

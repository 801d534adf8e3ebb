"""Pallas fused MRF kernel: one kernel per multi-receptive-field block.

An MRF is 3 parallel ResBlocks of 3 (dilated conv -> conv) pairs each — 18
convolutions whose XLA lowering makes 36 HBM tensor passes over activations
that are up to 131k samples long.  This kernel runs the whole block per time
tile entirely in VMEM:

  * activations are CHANNEL-FOLDED to exactly 128 lanes ([T, C] ->
    [T/r, r*C] with r = 128/C), so every conv becomes a small set of
    full-width [E, 128] @ [128, 128] tap matmuls (block-Toeplitz weights,
    exact — same math as ops/conv.py:folded_conv1d),
  * all 18 convs' tap weights live in VMEM for the whole kernel
    (~3-6 MB depending on stage),
  * each grid step DMAs one [tile + 2H, 128] input window (host pre-pads H
    zero rows per side — zero rows in folded layout are exactly the conv's
    zero padding), computes the full ResBlock chains with LeakyReLU and
    residuals on the VPU/MXU, and writes one [tile, 128] output block.

Margin bookkeeping: each conv shrinks the valid row interval by its tap
span; H is the total span of the deepest chain, so the central `tile` rows
of the final output are exact.  Rows outside the valid interval hold garbage
that is never read.

Weight/structure extraction happens on the host (`plan_mrf`,
`pack_mrf_weights`); the kernel body is generated from the static plan.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import GeneratorConfig

LANES = 128
LRELU_SLOPE = 0.1


@dataclass(frozen=True)
class ConvTaps:
    """Static plan for one folded conv: tap row-offsets (relative) and the
    index range of its tap matrices inside the packed weight array."""

    offsets: Tuple[int, ...]  # folded-row offset per tap
    start: int  # first tap index in the packed array
    margin: int  # max(|offsets|) — rows consumed from the valid interval


def _fold_taps(w: np.ndarray, dilation: int, padding: int, fold: int):
    """Block-Toeplitz tap matrices for a folded conv.

    w [k, C, C] -> list of (q, W_q [fold*C, fold*C]) with
    W_q[s*C+ci, j*C+co] = w[i, ci, co] where (q, s) = divmod(j + i*d - p, fold).
    Zero-only taps are dropped.
    """
    k, cin, cout = w.shape
    taps = {}
    for j in range(fold):
        for i in range(k):
            q, s = divmod(j + i * dilation - padding, fold)
            if q not in taps:
                taps[q] = np.zeros((fold * cin, fold * cout), w.dtype)
            taps[q][s * cin : (s + 1) * cin, j * cout : (j + 1) * cout] = w[i]
    return sorted(taps.items())


def plan_mrf(
    cfg: GeneratorConfig, channels: int, params: dict
) -> Tuple[np.ndarray, np.ndarray, List[List[Tuple[ConvTaps, ConvTaps]]], int, int]:
    """Build the packed tap weights + bias array + static structure for one
    MRF's params (the flax subtree {'resblock_i': {'conv{1,2}_{j}': ...}}).

    Returns (packed_taps [N, 128, 128], biases [n_convs, 128], structure,
    fold, total_margin).
    """
    if channels >= LANES:
        fold = 1  # wide stages already fill the lanes
    elif LANES % channels == 0:
        fold = LANES // channels
    else:
        raise ValueError(f"channels {channels} must divide {LANES}")
    packed: List[np.ndarray] = []
    biases: List[np.ndarray] = []
    structure: List[List[Tuple[ConvTaps, ConvTaps]]] = []
    total_margin = 0
    for rb_idx, (k, dils) in enumerate(
        zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
    ):
        rb_params = params[f"resblock_{rb_idx}"]
        chain: List[Tuple[ConvTaps, ConvTaps]] = []
        rb_margin = 0
        for j, d in enumerate(dils):
            pair = []
            for conv_name, dd in (("conv1", d), ("conv2", 1)):
                cp = rb_params[f"{conv_name}_{j}"]
                w = np.asarray(cp["kernel"], np.float32)  # [k, C, C]
                b = np.asarray(cp["bias"], np.float32)
                pad = (k * dd - dd) // 2
                taps = _fold_taps(w, dd, pad, fold)
                offsets = tuple(q for q, _ in taps)
                start = len(packed)
                packed.extend(m for _, m in taps)
                bias_row = np.tile(b, fold)  # folded bias repeats per phase
                biases.append(bias_row)
                margin = max(max(-min(offsets), max(offsets)), 0)
                pair.append(ConvTaps(offsets, start, margin))
            chain.append((pair[0], pair[1]))
            rb_margin += pair[0].margin + pair[1].margin
        structure.append(chain)
        total_margin = max(total_margin, rb_margin)
    packed_arr = np.stack(packed).astype(np.float32)  # [N, 128, 128]
    bias_arr = np.stack(biases).astype(np.float32)  # [n_convs, 128]
    return packed_arr, bias_arr, structure, fold, total_margin


def _mrf_kernel(
    x_hbm,  # [Tf + 2H, 128] bf16 (host zero-padded)
    taps_ref,  # [N, 128, 128] bf16 VMEM
    bias_ref,  # [n_convs, 128] f32 VMEM
    out_ref,  # [tile, 128] block VMEM
    xbuf,  # [E, 128] bf16 scratch
    sem,
    *,
    structure,
    tile: int,
    H: int,
    W: int,
):
    E = tile + 2 * H
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile, E), :], xbuf, sem
    )
    dma.start()
    dma.wait()
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    x0 = xbuf[:].astype(f32)  # [E, 128]

    def lrelu(v):
        return jnp.where(v >= 0, v, LRELU_SLOPE * v)

    def conv(v32, plan: ConvTaps, bias_idx: int):
        acc = jnp.zeros((E, W), f32)
        vb = v32.astype(bf16)
        for t_idx, q in enumerate(plan.offsets):
            # shifted read: rows [q, E + q) clipped to the buffer; the
            # clipped edge rows are inside the discard margin by design
            lo = max(q, 0)
            hi = min(E + q, E)
            seg = vb[lo:hi, :]
            w = taps_ref[plan.start + t_idx]
            part = jnp.dot(seg, w, preferred_element_type=f32)
            pad_lo = lo - q  # rows missing at the top
            pad_hi = E - (hi - q)
            if pad_lo or pad_hi:
                part = jnp.pad(part, ((pad_lo, pad_hi), (0, 0)))
            acc = acc + part
        return acc + bias_ref[bias_idx, :]

    out = None
    bias_idx = 0
    for chain in structure:
        y = x0
        for plan1, plan2 in chain:
            t1 = conv(lrelu(y), plan1, bias_idx)
            bias_idx += 1
            t2 = conv(lrelu(t1), plan2, bias_idx)
            bias_idx += 1
            y = y + t2
        out = y if out is None else out + y
    out = out / len(structure)
    out_ref[:] = out[H : H + tile, :]


def fused_mrf(
    x: jnp.ndarray,  # [B, T, C] activations (unfolded)
    packed_taps: jnp.ndarray,  # [N, 128, 128]
    biases: jnp.ndarray,  # [n_convs, 128]
    structure,
    fold: int,
    margin: int,
    tile: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply one fused MRF.  Batch is folded into sequential kernel calls
    (the latency path is B=1)."""
    b, t, c = x.shape
    tf = t // fold
    # round the halo up to a sublane multiple for aligned DMA slicing
    H = max(8, -(-margin // 8) * 8)
    tile = min(tile, tf)
    while tf % tile:
        tile //= 2
    if tile < 8:
        raise ValueError(f"folded length {tf} too small to tile")
    W = fold * c
    kernel = functools.partial(
        _mrf_kernel, structure=structure, tile=tile, H=H, W=W
    )
    taps_bf = packed_taps.astype(jnp.bfloat16)
    outs = []
    for bi in range(b):
        xf = x[bi].reshape(tf, fold * c).astype(jnp.bfloat16)
        xf = jnp.pad(xf, ((H, H), (0, 0)))
        # keep the pad/reshape producers out of the custom call's fusion:
        # fused at [B, T, C] scale they overflow XLA's 16 MB scoped-vmem
        # stack budget (observed at the serving warmup's widest bucket)
        xf = jax.lax.optimization_barrier(xf)
        out = pl.pallas_call(
            kernel,
            grid=(tf // tile,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    packed_taps.shape, lambda i: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    biases.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (tile, W), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((tf, W), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((tile + 2 * H, W), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024
            ),
            interpret=interpret,
        )(xf, taps_bf, biases.astype(jnp.float32))
        outs.append(out.reshape(t, c))
    return jnp.stack(outs).astype(x.dtype)

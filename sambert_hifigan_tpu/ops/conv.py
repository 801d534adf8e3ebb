"""Convolution primitives with PyTorch-compatible semantics, TPU-first layout.

The reference's compute path is built from torch Conv1d/ConvTranspose1d/Conv2d
(reference: models/hifigan.py:26-131, 177-222, 307-321, 484-493 and
models/variance_adaptor.py:43-60).  Here they are implemented directly on
lax.conv_general_dilated with channel-LAST layouts ([B, T, C] / [B, H, W, C]),
which XLA tiles onto the MXU with the channel axis on the 128-wide lane
dimension.  Padding arithmetic reproduces torch exactly, including the
transposed-conv output-length contract
  out_len = (in_len - 1) * stride - 2 * pad + kernel
(so the generator's T_wav = Tfrm * hop invariant holds,
reference: tests/test_hifigan_generator.py:40-99).

Kernel layouts:
  conv1d            w: [K, C_in // groups, C_out]
  conv_transpose1d  w: [K, C_in, C_out]   (already in "effective conv" form;
                       from a torch ConvTranspose1d weight W [C_in, C_out, K]
                       use  w[t, i, o] = W[i, o, K-1-t])
  conv2d            w: [KH, KW, C_in // groups, C_out]
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    """'same' padding for odd kernels (reference: models/hifigan.py:21-23)."""
    return (kernel_size * dilation - dilation) // 2


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """x [B, T, C_in], w [K, C_in//groups, C_out] -> [B, T', C_out]."""
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b
    return y


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """Torch-semantics ConvTranspose1d via input dilation.

    x [B, T, C_in], w [K, C_in, C_out] (effective-conv form) ->
    [B, (T-1)*stride - 2*padding + K, C_out].
    """
    k = w.shape[0]
    pad = k - 1 - padding
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if b is not None:
        y = y + b
    return y


def folded_conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """ConvTranspose1d as tap-matmuls + interleave — exact same math as
    conv_transpose1d, rearranged for the MXU.

    The lhs-dilated formulation makes XLA slide a length-k kernel over a
    mostly-zero dilated input (7/8 wasted multiplies at stride 8, poor MXU
    tiling).  Instead: for output phase j in [0, stride), only taps
    i = j + padding - stride*q of the kernel contribute, so the transpose is
    a SHORT dense conv producing all `stride` phases at once in the lane dim:

      W'[q - q_min, ci, j*Cout + co] = w[k-1-i, ci, co]   (i valid)
      y_phases = conv1d(x, W', asymmetric pad (-q_min, q_max))  # [B, T, u*Co]
      y = y_phases.reshape(B, T*u, Co)

    For the generator's (k=16, u=8) stages this is 3 taps of
    [T, Cin] @ [Cin, 8*Cout] — full 128-lane output tiles instead of a
    stride-8 scan.  Requires out_len == T*stride (true whenever
    2*padding == k - stride, the generator's configuration).

    x [B, T, C_in], w [K, C_in, C_out] (effective-conv form, same layout as
    conv_transpose1d) -> [B, T*stride, C_out].
    """
    k, cin, cout = w.shape
    u = stride
    p = padding
    if (x.shape[1] - 1) * u - 2 * p + k != x.shape[1] * u:
        raise ValueError(
            "folded_conv_transpose1d requires out_len == T*stride "
            f"(k={k}, stride={u}, padding={p})"
        )
    q_min = -((k - 1 - p) // u)
    q_max = (u - 1 + p) // u
    k_q = q_max - q_min + 1
    w_f = jnp.zeros((k_q, cin, u * cout), w.dtype)
    for j in range(u):
        for q in range(q_min, q_max + 1):
            i = j + p - u * q
            if 0 <= i < k:
                w_f = jax.lax.dynamic_update_slice(
                    w_f, w[k - 1 - i][None], (q - q_min, 0, j * cout)
                )
    y = lax.conv_general_dilated(
        x,
        w_f,
        window_strides=(1,),
        padding=[(-q_min, q_max)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )  # [B, T, u*cout]
    bsz, t = x.shape[0], x.shape[1]
    y = y.reshape(bsz, t * u, cout)
    if b is not None:
        y = y + b
    return y


def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (0, 0),
    groups: int = 1,
) -> jnp.ndarray:
    """x [B, H, W, C_in], w [KH, KW, C_in//groups, C_out] -> [B, H', W', C_out]."""
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b
    return y


def folded_conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    fold: int = 4,
) -> jnp.ndarray:
    """Channel-folded conv1d (stride/groups-aware) — exact same math as
    conv1d, rearranged for the MXU.

    Small-channel convs starve the MXU's 128 output lanes: HiFi-GAN's MRF
    tail runs C = 32..64 (measured 1.6 TFLOP/s on v5e), and the MSD
    discriminator ladder is WORSE — grouped k=41 convs expose only
    C_out/groups = 16..64 lanes per group at up to 8192-sample sequences
    (profiled at ~6% MFU; they dominate the GAN train step).  Folding packs
    `fold` consecutive OUTPUT steps into the channel axis: per group,
    [T, Cg] -> [T/(fold*s), fold*s*Cg] and the conv becomes a block-Toeplitz
    conv over the folded axis whose per-group matmul is
    [T', K_f*fold*s*Cg_in] @ [K_f*fold*s*Cg_in, fold*Cg_out] — `fold`x the
    output lanes.  For output phase j and tap i:

      o = s*j + i*d - p,  (q, m) = divmod(o, fold*s)
      W_f[q - q_min, (m, ci), (g, j, co)] = w[i, ci, g*Cg_out + co]

    so y_f = grouped_conv(x_f, W_f) with asymmetric folded-axis padding
    (-q_min, q_max) equals the original exactly: zero padding commutes with
    the fold (pad blocks are whole blocks of original zeros), and T that is
    not a multiple of fold*s is right-zero-padded then output-trimmed, which
    matches the conv's own implicit zero padding (no valid output tap ever
    reads past index T + p - 1).  The dense W_f does K_f*fold*s/k x the
    multiplies (1.0-2.3x for the MSD shapes) for fold x the lanes — a
    measured net win whenever Cg*k << 128*128.
    """
    if fold <= 1:
        return conv1d(
            x, w, b, stride=stride, padding=padding, dilation=dilation,
            groups=groups,
        )
    bsz, t, cin = x.shape
    k, cg_in, cout = w.shape
    if cg_in * groups != cin or cout % groups:
        raise ValueError(
            f"bad grouped shapes: x C={cin}, w {w.shape}, groups={groups}"
        )
    cg_out = cout // groups
    r, s, d, p = fold, stride, dilation, padding
    big_f = r * s  # input steps consumed per folded block of r outputs
    t_out = (t + 2 * p - (k - 1) * d - 1) // s + 1
    n_blocks = max(-(-t // big_f), -(-t_out // r))
    t_pad = n_blocks * big_f
    if t_pad > t:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    q_min = (-p) // big_f  # floor; <= 0 since o_min = -p
    o_max = s * (r - 1) + (k - 1) * d - p
    q_max = o_max // big_f
    k_f = q_max - q_min + 1
    # Build [K_f, (m, ci), (g, j, co)] with ONE gather: for each folded-kernel
    # cell (q, m, j) at most one original tap i satisfies
    # (q_min + q)*F + m == s*j + i*d - p; precompute that index map statically
    # (a per-(i,j) scatter would emit O(k*fold) HLO ops and blow up XLA
    # compile time on the full 41-tap ladder).
    import numpy as _np

    i_idx = _np.zeros((k_f, big_f, r), _np.int32)
    valid = _np.zeros((k_f, big_f, r), bool)
    for q in range(k_f):
        for m in range(big_f):
            o = (q_min + q) * big_f + m
            num = o + p - s * _np.arange(r)  # i*d for each phase j
            i_cand = num // d
            ok = (num % d == 0) & (i_cand >= 0) & (i_cand < k)
            i_idx[q, m] = _np.where(ok, i_cand, 0)
            valid[q, m] = ok
    wr = w.reshape(k, cg_in, groups, cg_out)
    w6 = jnp.take(wr, jnp.asarray(i_idx.reshape(-1)), axis=0)
    w6 = w6.reshape(k_f, big_f, r, cg_in, groups, cg_out)
    w6 = jnp.where(
        jnp.asarray(valid)[:, :, :, None, None, None], w6, 0
    )
    w6 = w6.transpose(0, 1, 3, 4, 2, 5)  # -> [K_f, m, ci, g, j, co]

    if groups == 1:
        # 1-D folded conv, I-dim (m, ci): pure reshapes, no relayout
        w_f = w6.reshape(k_f, big_f * cg_in, r * cg_out)
        x_f = x.reshape(bsz, n_blocks, big_f * cin)
        y_f = lax.conv_general_dilated(
            x_f,
            w_f,
            window_strides=(1,),
            padding=[(-q_min, q_max)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )  # [B, n_blocks, r * cg_out]
        y = y_f.reshape(bsz, n_blocks * r, cout)[:, :t_out]
    else:
        # Grouped: feature_group_count needs group-contiguous input channels,
        # and the (m, g) -> (g, m) fold transpose costs ~0.4 ms per 8 MB on
        # v5e (measured — it dominated the first folded GAN step).  Instead
        # run a 2-D conv with H = block index and W = within-block position:
        # the kernel's W extent covers all big_f positions (out W = 1) and
        # channels stay untouched, so the input needs only a free reshape.
        x4 = x.reshape(bsz, n_blocks, big_f, cin)
        w4 = w6.reshape(k_f, big_f, cg_in, groups * r * cg_out)
        y_f = lax.conv_general_dilated(
            x4,
            w4,
            window_strides=(1, 1),
            padding=[(-q_min, q_max), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )  # [B, n_blocks, 1, groups * r * cg_out]
        y = y_f.reshape(bsz, n_blocks, groups, r, cg_out)
        y = y.transpose(0, 1, 3, 2, 4)  # output unfold: (g, j) -> (j, g)
        y = y.reshape(bsz, n_blocks * r, cout)[:, :t_out]
    if b is not None:
        y = y + b
    return y


def conv_out_len(
    t: int, kernel_size: int, stride: int = 1, padding: int = 0, dilation: int = 1
) -> int:
    """Torch Conv1d output-length formula."""
    return (t + 2 * padding - (kernel_size - 1) * dilation - 1) // stride + 1


def fold_time(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, T, C] -> [B, ceil(T/r), C*r] pseudo-channel layout.

    Pseudo-channel index is c*r + j (channel-MAJOR, time-phase minor): pixel n
    carries times [n*r, (n+1)*r).  T not divisible by r is right-zero-padded.
    For C == 1 this is a pure reshape (free under XLA).

    This is the on-wire activation format of the chained folded MSD ladder
    (chain_folded_conv1d): channel-major phase packing is what keeps any
    contiguous true-channel grouping contiguous in pseudo-channels, so
    feature_group_count convs chain without a single relayout.
    """
    b, t, c = x.shape
    nb = -(-t // r)
    if nb * r > t:
        x = jnp.pad(x, ((0, 0), (0, nb * r - t), (0, 0)))
    if c == 1:
        # pure reshape; the size-1 transpose form below trips a TPU fusion
        # cost-model CHECK (jellyfish TransformWindow) on large waveforms
        return x.reshape(b, nb, r)
    return x.reshape(b, nb, r, c).transpose(0, 1, 3, 2).reshape(b, nb, c * r)


def unfold_time(y: jnp.ndarray, r: int, t: int) -> jnp.ndarray:
    """Inverse of fold_time: [B, nb, C*r] -> [B, t, C] (trims tail padding)."""
    b, nb, cr = y.shape
    c = cr // r
    if c == 1:  # pure reshape (see fold_time)
        return y.reshape(b, nb * r, 1)[:, :t]
    y = y.reshape(b, nb, c, r).transpose(0, 1, 3, 2).reshape(b, nb * r, c)
    return y[:, :t]


def chain_folded_conv1d(
    x_f: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    t_in: int,
    r_in: int,
    r_out: int,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Folded-in -> folded-out conv1d: consumes AND produces the fold_time
    pseudo-channel layout, so a whole conv ladder runs with ZERO transposes
    between layers — exact same math as conv1d on the unfolded signal.

    Motivation (profiled on the HiFi-GAN GAN train step, v5e): folded_conv1d
    recovers MXU lanes for the MSD's small-group k=41 convs but pays an
    unfold transpose per conv ((g, j) -> (j, g) channel permutes, ~28 ms of
    an 88.7 ms step including backward mirrors).  Packing phases
    channel-MAJOR removes the permutes entirely:

      input  pseudo-channel (ci, m): true channel ci at block phase m,
      output pseudo-channel (co, j): layout-stable across layers, and any
      contiguous true-channel group [c0, c1) maps to the contiguous
      pseudo-range [c0*r, c1*r) — feature_group_count works unchanged.

    For output phase j and tap i, the read offset within the input stream is
    o = j*stride + i*dilation - padding = q*r_in + m, so the kernel

      W_f[q - q_min, (ci, m), (g, co, j)] = w[i, ci, g*cg_out + co]

    turns the conv into a plain grouped 1-D conv over the BLOCK axis with
    window stride w_pix = r_out*stride / r_in (must divide; powers of two in
    the MSD schedule).  Block-axis padding pads whole blocks of zeros, which
    is exactly the conv's own zero padding; output positions past the true
    t_out (the tail block's dead phases) are masked to zero so downstream
    layers read exactly the implicit zeros the unfolded conv would.

    x_f [B, ceil(t_in/r_in), C_in*r_in]  (positions >= t_in must be zero),
    w   [K, C_in // groups, C_out]       (same layout as conv1d),
    ->  [B, ceil(t_out/r_out), C_out*r_out] with t_out = conv_out_len(...).
    """
    if (r_out * stride) % r_in != 0:
        raise ValueError(
            f"chain_folded_conv1d needs r_out*stride % r_in == 0 "
            f"(r_in={r_in}, r_out={r_out}, stride={stride})"
        )
    bsz, nb_in, cr_in = x_f.shape
    k, cg_in, cout = w.shape
    cin = cg_in * groups
    if cr_in != cin * r_in or cout % groups:
        raise ValueError(
            f"bad shapes: x_f C*r={cr_in}, cin={cin}, r_in={r_in}, w {w.shape}"
        )
    cg_out = cout // groups
    s, d, p = stride, dilation, padding
    w_pix = (r_out * s) // r_in
    t_out = conv_out_len(t_in, k, s, p, d)
    nb_out = -(-t_out // r_out)

    import numpy as _np

    # Static (q, m, j) -> tap i index map, one gather (see folded_conv1d for
    # why per-tap scatters are ruinous for XLA compile time).
    j_arr = _np.arange(r_out)
    i_arr = _np.arange(k)
    o = j_arr[None, :] * s + i_arr[:, None] * d - p  # [k, r_out]
    q_all = o // r_in
    q_min, q_max = int(q_all.min()), int(q_all.max())
    k_f = q_max - q_min + 1
    i_idx = _np.zeros((k_f, r_in, r_out), _np.int32)
    valid = _np.zeros((k_f, r_in, r_out), bool)
    for q in range(q_min, q_max + 1):
        for m in range(r_in):
            off = q * r_in + m  # o for this (q, m)
            num = off + p - s * j_arr  # i*d per output phase
            i_cand = num // d
            ok = (num % d == 0) & (i_cand >= 0) & (i_cand < k)
            i_idx[q - q_min, m] = _np.where(ok, i_cand, 0)
            valid[q - q_min, m] = ok

    wr = w.reshape(k, cg_in, groups, cg_out)
    w6 = jnp.take(wr, jnp.asarray(i_idx.reshape(-1)), axis=0)
    w6 = w6.reshape(k_f, r_in, r_out, cg_in, groups, cg_out)
    w6 = jnp.where(jnp.asarray(valid)[:, :, :, None, None, None], w6, 0)
    # -> [k_f, (ci, m), (g, co, j)]
    w6 = w6.transpose(0, 3, 1, 4, 5, 2)
    w_f = w6.reshape(k_f, cg_in * r_in, groups * cg_out * r_out)

    pad_l = -q_min
    pad_r = max(0, (nb_out - 1) * w_pix + k_f - pad_l - nb_in)
    y = lax.conv_general_dilated(
        x_f,
        w_f,
        window_strides=(w_pix,),
        padding=[(pad_l, pad_r)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )[:, :nb_out]
    if b is not None:
        y = y + jnp.repeat(b, r_out)
    rem = t_out - (nb_out - 1) * r_out
    if rem < r_out:
        # Dead phases of the tail block: zero them so downstream convs see
        # exactly the implicit zero padding of the unfolded formulation.
        mask = jnp.tile(jnp.arange(r_out) < rem, cout).astype(y.dtype)
        y = jnp.concatenate([y[:, :-1], y[:, -1:] * mask], axis=1)
    return y


def avg_pool1d(
    x: jnp.ndarray, kernel_size: int, stride: int, padding: int
) -> jnp.ndarray:
    """Torch AvgPool1d with count_include_pad=True (the default used by the
    MSD pooling ladder, reference: models/hifigan.py:400-404).

    x [B, T, C] -> [B, (T + 2*padding - kernel)//stride + 1, C].
    """
    # Implemented as a depthwise conv with a constant 1/k kernel: identical to
    # torch's count_include_pad=True average (zero pad, fixed divisor), and
    # cleanly reverse-differentiable under jit (lax.reduce_window's generic
    # reducer is not).
    c = x.shape[-1]
    kernel = jnp.full((kernel_size, 1, c), 1.0 / kernel_size, x.dtype)
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c,
    )


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.1) -> jnp.ndarray:
    """LeakyReLU with the HiFi-GAN slope (reference: models/hifigan.py:81-84)."""
    return jnp.where(x >= 0, x, negative_slope * x)


def weight_norm_kernel(g: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """w = g * v / ||v||, norm over all axes except the output-channel (last)
    axis — equivalent to torch weight_norm(dim=0) on [C_out, ...] layouts.

    Discriminator convs use this parametrization at construction
    (reference: models/hifigan.py:307-321, 481-493); the generator does NOT
    (plain convs at init, reference: models/hifigan.py:177-222).
    """
    axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True) + 1e-12)
    return g * v / norm


def reflect_pad_time(x: jnp.ndarray, pad_right: int, axis: int = 1) -> jnp.ndarray:
    """Reflect-pad along the time axis (MPD non-divisible lengths,
    reference: models/hifigan.py:514-517)."""
    if pad_right == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad_right)
    return jnp.pad(x, cfg, mode="reflect")

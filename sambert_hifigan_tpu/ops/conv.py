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
    padding: int = 0,
    dilation: int = 1,
    fold: int = 4,
) -> jnp.ndarray:
    """Channel-folded stride-1 conv1d — exact same math as conv1d, rearranged
    for the MXU.

    HiFi-GAN's late stages are long-T, small-C convs (C = 32..64 at up to
    256x the frame rate); a C=32 conv uses 32 of the MXU's 128 output lanes
    and a 32*k contraction — single-digit utilization (measured 1.6 TFLOP/s
    on v5e).  Folding packs `fold` consecutive time steps into the channel
    axis ([T, C] -> [T/fold, fold*C]) and rewrites the conv as a block-
    Toeplitz conv over the folded axis:

      o = j + i*d - p,  (q, s) = divmod(o, fold)
      W_f[q - q_min, s*Ci + ci, j*Co + co] = w[i, ci, co]

    so y_f = conv(x_f, W_f) with asymmetric padding (-q_min, q_max) equals the
    original output exactly (zero padding commutes with the fold because
    folded pad blocks are whole blocks of original zeros).  The dense W_f does
    up to ~fold x more multiplies, but utilization rises ~fold^2, a measured
    net win for C*k << 128*128.

    Requires T % fold == 0 and stride 1 / groups 1.
    """
    if fold <= 1:
        return conv1d(x, w, b, padding=padding, dilation=dilation)
    bsz, t, cin = x.shape
    k, _, cout = w.shape
    if t % fold:
        raise ValueError(f"T={t} not divisible by fold={fold}")
    o_min = -padding
    o_max = (fold - 1) + (k - 1) * dilation - padding
    q_min = o_min // fold
    q_max = o_max // fold
    k_f = q_max - q_min + 1
    w_f = jnp.zeros((k_f, fold * cin, fold * cout), w.dtype)
    for j in range(fold):
        for i in range(k):
            q, s = divmod(j + i * dilation - padding, fold)
            w_f = jax.lax.dynamic_update_slice(
                w_f, w[i][None], (q - q_min, s * cin, j * cout)
            )
    x_f = x.reshape(bsz, t // fold, fold * cin)
    y_f = lax.conv_general_dilated(
        x_f,
        w_f,
        window_strides=(1,),
        padding=[(-q_min, q_max)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    y = y_f.reshape(bsz, t, cout)
    if b is not None:
        y = y + b
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

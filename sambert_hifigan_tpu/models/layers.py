"""Reusable flax modules: torch-semantics conv/linear layers.

Shared by the HiFi-GAN family and the variance-adaptor predictors.  Kernels
live in TPU-friendly channel-last layouts (see ops/conv.py); initialization
matches torch defaults (see utils/init.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import conv as conv_ops
from ..utils.init import (
    torch_bias_init,
    torch_conv_kernel_init,
    torch_linear_kernel_init,
)


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize semantics: x / max(||x||, eps)."""
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


class SpectralNorm:
    """Power-iteration spectral normalization with torch parity
    (torch.nn.utils.spectral_norm; reference uses it on the discriminators
    when use_spectral_norm=True, /root/reference/models/hifigan.py:307-321,
    481-493).

    w_mat is the weight flattened to [C_out, -1] in torch's element order;
    u [C_out] and v [fan_in] are persistent state in the 'spectral' variable
    collection.  When the collection is mutable (training), ONE power
    iteration runs per call with stop-gradiented u/v (torch
    n_power_iterations=1 under no_grad); otherwise the stored vectors are
    used as-is (torch eval).  sigma = u^T W v differentiates through W only,
    exactly like torch; the effective kernel is w / sigma.

    Used via Conv1d/Conv2d(spectral_norm=True); apply with
    mutable=["spectral"] to advance the iteration (the jitted GAN step's
    D-pass does; all read-only paths — G-pass, eval, parity — don't).
    """

    @staticmethod
    def apply(module: nn.Module, w: jnp.ndarray, w_mat: jnp.ndarray) -> jnp.ndarray:
        cout, fan = w_mat.shape

        def vec_init(n):
            def init():
                key = module.make_rng("params")
                return _l2_normalize(jax.random.normal(key, (n,), jnp.float32))

            return init

        u_var = module.variable("spectral", "u", vec_init(cout))
        v_var = module.variable("spectral", "v", vec_init(fan))
        u, v = u_var.value, v_var.value
        updating = (
            module.is_mutable_collection("spectral")
            and not module.is_initializing()
        )
        if updating:
            wm = jax.lax.stop_gradient(w_mat)
            v = _l2_normalize(wm.T @ u)
            u = _l2_normalize(wm @ v)
            u_var.value, v_var.value = u, v
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = u @ (w_mat @ v)
        return w / sigma


class Conv1d(nn.Module):
    """Torch-semantics Conv1d on [B, T, C] with optional weight norm.

    weight_norm=True reproduces torch's nn.utils.weight_norm(conv) applied at
    construction (discriminators, reference: models/hifigan.py:307-321); at
    init g = ||v|| so the effective kernel equals the plain init draw.
    spectral_norm=True reproduces torch's nn.utils.spectral_norm instead
    (see SpectralNorm).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    spectral_norm: bool = False
    # Channel-fold factor for the MXU (see ops/conv.py:folded_conv1d); a
    # call-time transform — parameter shapes and semantics are unchanged.
    # Stride/groups-aware; T that does not divide is zero-padded and trimmed.
    fold: int = 1
    # Chained-fold mode (ops/conv.py:chain_folded_conv1d): (r_in, r_out).
    # When set, __call__ consumes AND produces the fold_time pseudo-channel
    # layout [B, nb, C*r] and needs the true input length via chain_t_in.
    # Parameter shapes/semantics are unchanged (same call-time transform
    # family as `fold`, but with zero inter-layer relayouts).
    chain: Optional[Tuple[int, int]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, chain_t_in: Optional[int] = None
    ) -> jnp.ndarray:
        kshape = (self.kernel_size, self.in_channels // self.groups, self.out_channels)
        fan_in = kshape[0] * kshape[1]
        if self.weight_norm and self.spectral_norm:
            raise ValueError("weight_norm and spectral_norm are exclusive")
        if self.weight_norm:
            def wn_init(key, shape):
                v = torch_conv_kernel_init(key, shape)
                g = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1)))
                return {"v": v, "g": g}

            wn = self.param("kernel_wn", wn_init, kshape)
            w = conv_ops.weight_norm_kernel(wn["g"], wn["v"])
        else:
            w = self.param("kernel", torch_conv_kernel_init, kshape)
            if self.spectral_norm:
                # torch flattens its [out, in/g, k] weight to [out, -1];
                # ours is [k, in/g, out] — transpose reproduces the order.
                w_mat = w.transpose(2, 1, 0).reshape(self.out_channels, -1)
                w = SpectralNorm.apply(self, w, w_mat)
        b = (
            self.param("bias", torch_bias_init(fan_in), (self.out_channels,))
            if self.use_bias
            else None
        )
        w = w.astype(self.dtype)
        b = b.astype(self.dtype) if b is not None else None
        x = x.astype(self.dtype)
        if self.chain is not None:
            if chain_t_in is None:
                raise ValueError("chain mode requires chain_t_in (true length)")
            r_in, r_out = self.chain
            return conv_ops.chain_folded_conv1d(
                x, w, b, t_in=chain_t_in, r_in=r_in, r_out=r_out,
                stride=self.stride, padding=self.padding,
                dilation=self.dilation, groups=self.groups,
            )
        if self.fold > 1:
            return conv_ops.folded_conv1d(
                x, w, b, stride=self.stride, padding=self.padding,
                dilation=self.dilation, groups=self.groups, fold=self.fold,
            )
        return conv_ops.conv1d(
            x,
            w,
            b,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
        )


class ConvTranspose1d(nn.Module):
    """Torch-semantics ConvTranspose1d on [B, T, C].

    Kernel stored in effective-conv form [K, C_in, C_out].  torch computes the
    default-init fan_in of a ConvTranspose1d from its [C_in, C_out, K] weight
    as C_out * K, which is reproduced here.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kshape = (self.kernel_size, self.in_channels, self.out_channels)
        # torch fan_in for ConvTranspose1d weight [in, out, k]: dim-1 * k
        fan_in = self.out_channels * self.kernel_size
        def k_init(key, shape):
            bound = 1.0 / (fan_in**0.5)
            return jax.random.uniform(key, shape, jnp.float32, -bound, bound)

        w = self.param("kernel", k_init, kshape)
        b = (
            self.param("bias", torch_bias_init(fan_in), (self.out_channels,))
            if self.use_bias
            else None
        )
        w = w.astype(self.dtype)
        b = b.astype(self.dtype) if b is not None else None
        x = x.astype(self.dtype)
        # Tap-matmul formulation when the exact-length contract holds
        # (2*padding == kernel - stride, true for all generator stages):
        # dense [T, Cin] @ [Cin, stride*Cout] taps instead of an lhs-dilated
        # scan — measured large MXU-utilization win (ops/conv.py).
        if (
            self.stride > 1
            and 2 * self.padding == self.kernel_size - self.stride
        ):
            return conv_ops.folded_conv_transpose1d(
                x, w, b, stride=self.stride, padding=self.padding
            )
        return conv_ops.conv_transpose1d(
            x, w, b, stride=self.stride, padding=self.padding
        )


class Conv2d(nn.Module):
    """Torch-semantics Conv2d on [B, H, W, C] with optional weight norm
    (MPD, reference: models/hifigan.py:484-493)."""

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    weight_norm: bool = False
    spectral_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kshape = (kh, kw, self.in_channels, self.out_channels)
        fan_in = kh * kw * self.in_channels
        if self.weight_norm and self.spectral_norm:
            raise ValueError("weight_norm and spectral_norm are exclusive")
        if self.weight_norm:
            def wn_init(key, shape):
                v = torch_conv_kernel_init(key, shape)
                g = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2)))
                return {"v": v, "g": g}

            wn = self.param("kernel_wn", wn_init, kshape)
            w = conv_ops.weight_norm_kernel(wn["g"], wn["v"])
        else:
            w = self.param("kernel", torch_conv_kernel_init, kshape)
            if self.spectral_norm:
                # torch flattens its [out, in, kh, kw] weight to [out, -1];
                # ours is [kh, kw, in, out] — transpose reproduces the order.
                w_mat = w.transpose(3, 2, 0, 1).reshape(self.out_channels, -1)
                w = SpectralNorm.apply(self, w, w_mat)
        b = (
            self.param("bias", torch_bias_init(fan_in), (self.out_channels,))
            if self.use_bias
            else None
        )
        w = w.astype(self.dtype)
        b = b.astype(self.dtype) if b is not None else None
        return conv_ops.conv2d(
            x.astype(self.dtype), w, b, stride=self.stride, padding=self.padding
        )


class Linear(nn.Module):
    """Torch-semantics Linear: kernel [in, out], torch-default init."""

    in_features: int
    out_features: int
    use_bias: bool = True
    kernel_init: Optional[object] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = self.kernel_init or torch_linear_kernel_init
        w = self.param("kernel", init, (self.in_features, self.out_features))
        y = x.astype(self.dtype) @ w.astype(self.dtype)
        if self.use_bias:
            b = self.param(
                "bias", torch_bias_init(self.in_features), (self.out_features,)
            )
            y = y + b.astype(self.dtype)
        return y


class LayerNorm(nn.Module):
    """LayerNorm over the last axis, torch-default eps/affine."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


def remove_weight_norm(params):
    """Fold every weight-norm parametrization in a params pytree into its
    effective kernel (the runtime analog of the reference's
    `remove_weight_norm`, /root/reference/models/hifigan.py:263-271).

    Each `kernel_wn = {"g", "v"}` leaf pair becomes v' = g * v / ||v||
    (the effective kernel) with g' = ||v'||, so `weight_norm_kernel(g', v')
    == v'` exactly: the parametrization collapses to identity and v' IS the
    plain conv kernel.  Structure is preserved — the module applies unchanged
    and checkpoints stay load-compatible."""

    def fold(node):
        # tree.map's is_leaf hands this only {"g","v"} dicts and true leaves
        if isinstance(node, dict):
            w = conv_ops.weight_norm_kernel(node["g"], node["v"])
            axes = tuple(range(w.ndim - 1))
            g = jnp.sqrt(jnp.sum(jnp.square(w), axis=axes))
            return {"g": g, "v": w}
        return node

    return jax.tree.map(
        fold, params, is_leaf=lambda n: isinstance(n, dict) and set(n) == {"g", "v"}
    )


def apply_weight_norm(params):
    """Re-split every folded kernel into a fresh (g, v) weight-norm pair
    (the reference's `apply_weight_norm`,
    /root/reference/models/hifigan.py:273-283): g = ||v||, v unchanged —
    the effective kernel is identical, but g and v's direction become
    independent trainable quantities again."""

    def split(node):
        # tree.map's is_leaf hands this only {"g","v"} dicts and true leaves
        if isinstance(node, dict):
            v = node["v"]
            axes = tuple(range(v.ndim - 1))
            g = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes))
            return {"g": g, "v": v}
        return node

    return jax.tree.map(
        split, params, is_leaf=lambda n: isinstance(n, dict) and set(n) == {"g", "v"}
    )

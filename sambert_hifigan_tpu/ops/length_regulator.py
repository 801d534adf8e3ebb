"""Static-shape length regulator.

The reference expands phoneme features to frame level with a Python loop over
the batch and per-sample torch.repeat_interleave followed by zero-padding to
the batch max (reference: models/variance_adaptor.py:171-269) — dynamic
shapes, untraceable.  Here the same math is a fixed-shape gather:

  cum[b, j] = sum_{i<=j} dur[b, i]
  frame t of sample b belongs to phoneme  idx[b, t] = #{j : cum[b, j] <= t}
  out[b, t] = h[b, idx[b, t]]         for t < cum[b, -1]
  out[b, t] = 0                        otherwise (mask)

This reproduces repeat_interleave exactly, including dur=0 phonemes emitting
no frames (reference: tests/test_length_regulator.py:109-127), while staying
jit-compatible: `max_frames` is a static bucket size, and invalid tail frames
are zeroed and flagged in the returned mask.

TPU notes: the searchsorted is O(Tfrm * log Tph) vectorized compares on the
VPU; the gather is a single dynamic-gather XLA op.  No host sync, no
data-dependent shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def regulate_indices(
    dur: jnp.ndarray, max_frames: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute gather indices for length regulation.

    Args:
      dur: [B, Tph] int durations (clamped to >= 0, matching
           reference models/variance_adaptor.py:213-217).
      max_frames: static output length.

    Returns:
      idx:   [B, max_frames] int32 phoneme index per frame (clamped to valid).
      mask:  [B, max_frames] bool, True for frames inside sum(dur).
      total: [B] int32 total frames per sample.
    """
    dur = jnp.maximum(dur.astype(jnp.int32), 0)
    cum = jnp.cumsum(dur, axis=1)  # [B, Tph]
    total = cum[:, -1]
    t = jnp.arange(max_frames, dtype=jnp.int32)
    # idx[b, t] = number of cum[b, :] entries <= t  == searchsorted(cum, t, 'right')
    idx = jnp.sum(cum[:, None, :] <= t[None, :, None], axis=-1).astype(jnp.int32)
    mask = t[None, :] < total[:, None]
    idx = jnp.minimum(idx, dur.shape[1] - 1)
    return idx, mask, total


def length_regulate(
    h: jnp.ndarray, dur: jnp.ndarray, max_frames: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Expand h [B, Tph, d] by dur [B, Tph] to ([B, max_frames, d], mask, total)."""
    idx, mask, total = regulate_indices(dur, max_frames)
    out = jnp.take_along_axis(h, idx[:, :, None], axis=1)
    out = out * mask[:, :, None].astype(h.dtype)
    return out, mask, total


def gather_frames(h: jnp.ndarray, idx: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Gather with precomputed indices (so duration/pitch/energy expansion all
    share one index computation)."""
    if h.ndim == 3:
        out = jnp.take_along_axis(h, idx[:, :, None], axis=1)
        return out * mask[:, :, None].astype(h.dtype)
    out = jnp.take_along_axis(h, idx, axis=1)
    return out * mask.astype(h.dtype)

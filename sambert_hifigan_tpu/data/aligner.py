"""Learned forced alignment: phoneme durations from the data itself.

The reference has no aligner (its spec'd dataset was never built and its
training demos use random tensors; SURVEY.md section 2.4 I-4/I-6), so
duration ground truth is a first-class absence.  Round 1 bootstrapped with
uniform splits (features.py:uniform_durations), which would teach the
DurationPredictor a degenerate target.  This module supplies real targets:

  1. A small conv CTC model is trained ON THE TRAINING CORPUS itself
     (mel [T, n_mels] -> per-frame phoneme posteriors) with optax.ctc_loss —
     a one-shot preprocessing step, jitted with static bucket shapes.
  2. Durations are read off a blank-free monotonic Viterbi pass through each
     utterance's label sequence (CTC-segmentation style): every phoneme gets
     >= 1 frame, durations sum EXACTLY to the utterance's frame count, so
     sum(dur) == Tfrm holds by construction (the LengthRegulator contract,
     reference: models/variance_adaptor.py:171-269).

TPU notes: training runs as one jitted step over bucket-padded batches
(frame buckets x label buckets compile once each); the Viterbi decode is a
host-side numpy DP — it is offline preprocessing, O(T * N) per utterance,
and is not on any training or serving path.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.layers import Conv1d, LayerNorm, Linear

# The CTC blank is a DEDICATED class at index vocab_size — not an id from
# the frontend space.  The frontend maps ' ' to PAD_ID == 0, so id 0 CAN
# appear in label sequences; reusing it as blank would both violate
# optax.ctc_loss's blank-free-labels requirement and zero out the space
# phoneme's emission in the Viterbi pass.
def blank_id(vocab_size: int) -> int:
    return vocab_size


class CTCAlignerNet(nn.Module):
    """mel [B, T, n_mels] -> framewise logits [B, T, vocab + 1]
    (the extra class is the CTC blank)."""

    vocab_size: int = 300
    n_mels: int = 80
    d_model: int = 192
    n_layers: int = 3
    kernel_size: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        pad = (self.kernel_size - 1) // 2
        x = Conv1d(
            self.n_mels, self.d_model, self.kernel_size, padding=pad,
            dtype=self.dtype, name="conv_in",
        )(mel)
        x = jax.nn.relu(x)
        for i in range(self.n_layers):
            y = Conv1d(
                self.d_model, self.d_model, self.kernel_size, padding=pad,
                dtype=self.dtype, name=f"conv_{i}",
            )(x)
            y = jax.nn.relu(y)
            y = LayerNorm(self.d_model, dtype=self.dtype, name=f"norm_{i}")(y)
            x = x + y
        return Linear(self.d_model, self.vocab_size + 1, dtype=self.dtype,
                      name="proj")(x)


def _bucket(n: int, granularity: int) -> int:
    return ((n + granularity - 1) // granularity) * granularity


def _pad_batch(
    mels: Sequence[np.ndarray],
    labels: Sequence[np.ndarray],
    frame_gran: int,
    label_gran: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    t = _bucket(max(m.shape[0] for m in mels), frame_gran)
    n = _bucket(max(len(l) for l in labels), label_gran)
    b = len(mels)
    n_mels = mels[0].shape[1]
    mel_pad = np.zeros((b, t, n_mels), np.float32)
    lab_pad = np.zeros((b, n), np.int32)
    mel_padding = np.ones((b, t), np.float32)  # 1.0 = padded (optax convention)
    lab_padding = np.ones((b, n), np.float32)
    for i, (m, l) in enumerate(zip(mels, labels)):
        mel_pad[i, : m.shape[0]] = m
        lab_pad[i, : len(l)] = l
        mel_padding[i, : m.shape[0]] = 0.0
        lab_padding[i, : len(l)] = 0.0
    return mel_pad, lab_pad, mel_padding, lab_padding


def train_ctc_aligner(
    samples: Sequence[Tuple[np.ndarray, np.ndarray]],  # (mel [T, n_mels], ph [N])
    vocab_size: int = 300,
    n_mels: int = 80,
    steps: int = 400,
    batch_size: int = 8,
    learning_rate: float = 2e-3,
    seed: int = 0,
    d_model: int = 192,
    n_layers: int = 3,
    frame_gran: int = 64,
    label_gran: int = 8,
) -> Tuple[CTCAlignerNet, Dict, List[float]]:
    """Train the corpus aligner; returns (net, params, loss history)."""
    net = CTCAlignerNet(vocab_size, n_mels, d_model, n_layers)
    rng = np.random.default_rng(seed)
    params = net.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, frame_gran, n_mels))
    )
    opt = optax.adamw(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, mel, labels, mel_padding, label_padding):
        def loss_fn(p):
            logits = net.apply(p, mel)
            per_ex = optax.ctc_loss(
                logits, mel_padding, labels, label_padding,
                blank_id=blank_id(vocab_size),
            )
            frames = jnp.maximum(jnp.sum(1.0 - mel_padding, axis=-1), 1.0)
            return jnp.mean(per_ex / frames)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses: List[float] = []
    n = len(samples)
    for i in range(steps):
        idx = rng.choice(n, size=min(batch_size, n), replace=n < batch_size)
        mels = [samples[j][0] for j in idx]
        labs = [samples[j][1] for j in idx]
        mel, lab, mel_p, lab_p = _pad_batch(mels, labs, frame_gran, label_gran)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(mel), jnp.asarray(lab),
            jnp.asarray(mel_p), jnp.asarray(lab_p),
        )
        losses.append(float(loss))
    return net, params, losses


def viterbi_durations(log_probs: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Blank-free monotonic Viterbi segmentation.

    log_probs [T, K] (log-softmax over classes), labels [N] ints.
    Returns dur [N] int32 with dur >= 1 everywhere and sum(dur) == T.

    DP over (frame t, label n): at each frame the path either stays on the
    current label or advances to the next; every label must be visited.
    """
    lp = np.asarray(log_probs, np.float64)
    labels = np.asarray(labels)
    t_len, n_len = lp.shape[0], labels.shape[0]
    if n_len > t_len:
        raise ValueError(f"{n_len} labels cannot align to {t_len} frames")
    emit = lp[:, labels]  # [T, N]
    neg = -1e18
    dp = np.full((t_len, n_len), neg)
    back = np.zeros((t_len, n_len), np.int8)  # 1 = came from n-1
    dp[0, 0] = emit[0, 0]
    for t in range(1, t_len):
        # feasibility window: n <= t and n >= N - (T - t)
        n_lo = max(0, n_len - (t_len - t))
        n_hi = min(t, n_len - 1)
        stay = dp[t - 1, n_lo : n_hi + 1]
        adv = np.full_like(stay, neg)
        if n_lo == 0:
            adv[1:] = dp[t - 1, n_lo : n_hi]
        else:
            adv[:] = dp[t - 1, n_lo - 1 : n_hi]
        better = adv > stay
        dp[t, n_lo : n_hi + 1] = np.where(better, adv, stay) + emit[t, n_lo : n_hi + 1]
        back[t, n_lo : n_hi + 1] = better
    dur = np.zeros(n_len, np.int32)
    n = n_len - 1
    for t in range(t_len - 1, -1, -1):
        dur[n] += 1
        if t > 0 and back[t, n]:
            n -= 1
    if not (n == 0 and dur.sum() == t_len and (dur >= 1).all()):
        raise ValueError(
            f"viterbi backtrack violated the duration contract "
            f"(n={n}, sum={int(dur.sum())}, T={t_len})"
        )
    return dur


def nonblank_log_posteriors(logits: np.ndarray) -> np.ndarray:
    """log p(class | frame, not blank): CTC models are blank-peaky, so the
    blank-free Viterbi runs on posteriors renormalized over non-blank classes
    (standard CTC-segmentation practice).  The blank is the LAST column."""
    x = np.asarray(logits, np.float64)[:, :-1]  # drop the blank class
    x = x - x.max(axis=1, keepdims=True)
    lse = np.log(np.exp(x).sum(axis=1, keepdims=True))
    return x - lse


def ctc_durations(
    net: CTCAlignerNet, params, mel: np.ndarray, ph_ids: np.ndarray
) -> np.ndarray:
    """Align one utterance: mel [T, n_mels], ph_ids [N] -> dur [N],
    sum(dur) == T, dur >= 1."""
    logits = np.asarray(net.apply(params, jnp.asarray(mel)[None])[0])
    return viterbi_durations(nonblank_log_posteriors(logits), ph_ids)

"""Optimizer construction: LR schedules, EMA, gradient accumulation.

The reference trains (in its demos) with constant learning rates and no
parameter averaging (reference: demo_ablation_modes.py:71-78 — plain
AdamW(2e-4) for both GAN sides; its unimplemented trainer spec,
.kiro/specs/tts-sam-bert-hifigan/tasks.md:315-402, never mentions schedules).
Production GAN-vocoder recipes rely on all three of the knobs below, so the
TPU framework makes them first-class config (TrainStageConfig) rather than
script-local hacks:

* **LR schedules** — `constant` (the reference recipe, default),
  `exponential` (the official HiFi-GAN recipe: lr *= gamma every N steps),
  and `warmup_cosine` (linear warmup -> cosine decay to a floor).  Built as
  optax schedules, so the decayed rate lives inside the jitted step; the
  current value is also recomputed host-side-free as a metric (`lr`).
* **EMA** — an exponential moving average of the generator / acoustic
  parameters, updated inside the jitted step (zero extra host syncs) and
  carried in the train state (so it checkpoints/restores/shards like any
  other leaf).  Inference and eval prefer the EMA copy when present:
  averaged weights are the standard way to strip late-training GAN jitter.
* **Gradient accumulation** — optax.MultiSteps wraps the whole chain; k
  micro-batch gradients are averaged and applied as ONE optimizer update,
  scaling effective batch without scaling HBM.  The schedule then advances
  per *applied* update (optax counts inner steps), matching large-batch
  semantics exactly.

All three compose: MultiSteps(chain(clip, adamw(schedule))) with an EMA
tracking the post-update parameters.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import ConfigError, TrainStageConfig


def make_lr_schedule(
    tr: TrainStageConfig, base_lr: Optional[float] = None
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build the optax schedule for a training stage.

    `base_lr` overrides tr.learning_rate (used for the discriminator's
    separate rate).  Returns a callable step -> lr; `step` counts applied
    optimizer updates (micro-steps / accumulate_steps).
    """
    lr = tr.learning_rate if base_lr is None else base_lr
    kind = tr.lr_schedule
    if kind == "constant":
        sched = optax.constant_schedule(lr)
    elif kind == "exponential":
        # HiFi-GAN's published recipe decays per epoch; steps are the unit
        # here (lr_decay_steps ~ steps per epoch).  staircase=True matches
        # the discrete per-epoch multiply.
        sched = optax.exponential_decay(
            init_value=lr,
            transition_steps=tr.lr_decay_steps,
            decay_rate=tr.lr_decay_gamma,
            staircase=True,
        )
    elif kind == "warmup_cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr,
            warmup_steps=max(tr.warmup_steps, 1),
            decay_steps=max(tr.lr_total_steps, tr.warmup_steps + 1),
            end_value=lr * tr.lr_end_ratio,
        )
    else:
        raise ConfigError(
            f"unknown lr_schedule {kind!r}; expected constant | exponential "
            "| warmup_cosine"
        )
    if kind != "warmup_cosine" and tr.warmup_steps > 0:
        warm = optax.linear_schedule(0.0, lr, tr.warmup_steps)
        sched = optax.join_schedules([warm, sched], [tr.warmup_steps])
    return sched


def build_optimizer(
    tr: TrainStageConfig,
    base_lr: Optional[float] = None,
    gradient_clip: Optional[float] = None,
) -> optax.GradientTransformation:
    """clip? -> AdamW(schedule), wrapped in MultiSteps when accumulating.

    `gradient_clip` defaults to the stage's configured clip; pass None
    explicitly via the stage config to disable (the reference's vocoder
    recipe has no clipping, configs/config.yaml:26-33)."""
    clip = tr.gradient_clip if gradient_clip is None else gradient_clip
    chain = []
    if clip is not None:
        chain.append(optax.clip_by_global_norm(clip))
    chain.append(
        optax.adamw(
            make_lr_schedule(tr, base_lr),
            b1=tr.beta1,
            b2=tr.beta2,
            weight_decay=tr.weight_decay,
        )
    )
    opt = optax.chain(*chain)
    if tr.accumulate_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=tr.accumulate_steps)
    return opt


def current_lr(tr: TrainStageConfig, step: jnp.ndarray, base_lr=None):
    """The schedule value at train-loop `step` (micro-steps), for metrics.
    Applied-update count = step // accumulate_steps (MultiSteps only advances
    the inner optimizer on the k-th micro-step)."""
    applied = step // tr.accumulate_steps if tr.accumulate_steps > 1 else step
    return make_lr_schedule(tr, base_lr)(applied)


def ema_update(ema: Any, params: Any, decay: float) -> Any:
    """One EMA step: ema <- decay * ema + (1 - decay) * params."""
    return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay), ema, params)


def maybe_init_ema(tr: TrainStageConfig, params: Any) -> Any:
    """EMA starts as a copy of the initial parameters (bias-correction-free:
    early steps track params closely at typical decays); None when off."""
    if tr.ema_decay <= 0.0:
        return None
    return jax.tree.map(jnp.array, params)


def inference_params(params: Any, ema_params: Any) -> Any:
    """Prefer the EMA copy for inference/eval when it exists."""
    return params if ema_params is None else ema_params

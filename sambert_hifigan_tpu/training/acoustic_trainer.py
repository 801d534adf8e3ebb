"""Acoustic-model training, one jitted step.

The reference never implemented a trainer (spec tasks 24-25 unchecked,
reference: .kiro/specs/tts-sam-bert-hifigan/tasks.md:315-402); the recipe
below follows its config and test patterns: Adam-style optimizer at lr 1e-4
with global-norm gradient clipping at 1.0
(reference: configs/config.yaml:17-24), teacher-forced forward, AcousticLoss
with masks threaded from the static-shape batch.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import LossWeights, TTSConfig, TrainStageConfig
from ..losses.acoustic import acoustic_loss
from ..models.acoustic_model import SAMBERTAcousticModel
from ..parallel.mesh import batch_sharding, replicated_sharding
from .optim import build_optimizer, current_lr, ema_update
from .train_state import AcousticTrainState


def cast_floats(tree, dtype):
    """Cast every floating leaf of a pytree (bf16 compute <-> f32 loss
    boundary for mixed-precision training); non-float leaves pass through."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
        else x,
        tree,
    )


def make_acoustic_optimizer(cfg: TTSConfig) -> optax.GradientTransformation:
    # clip -> AdamW(schedule), MultiSteps-wrapped when accumulating
    # (training/optim.py; reference recipe = constant lr, no averaging).
    return build_optimizer(cfg.training.acoustic)


def init_acoustic_state(
    model: SAMBERTAcousticModel,
    cfg: TTSConfig,
    rng,
    tph: int = 16,
    max_frames: int = 64,
    batch: int = 1,
    ema: "bool | None" = None,
) -> AcousticTrainState:
    """`ema` overrides the config's ema_decay>0 decision for whether the
    state carries an ema_params slot — inference/eval CLIs pass
    CheckpointManager.has_ema() so the restore target matches the
    checkpoint's structure."""
    opt = make_acoustic_optimizer(cfg)
    want_ema = (cfg.training.acoustic.ema_decay > 0.0) if ema is None else ema

    # One jitted program for the whole init instead of hundreds of eager
    # per-op dispatches (flax init outside jit compiles every conv/norm as
    # its own tiny XLA program — measured ~8 min of sub-second compiles on a
    # 1-core host; jitted + persistently cached it is one program).
    def _init(rng) -> AcousticTrainState:
        ph = jnp.zeros((batch, tph), jnp.int32)
        mel = jnp.zeros((batch, max_frames, cfg.acoustic_model.n_mels))
        dur = jnp.ones((batch, tph), jnp.int32)
        params = model.init(rng, ph, ph, ph, mel, dur)
        return AcousticTrainState(
            params=params,
            opt_state=opt.init(params),
            step=jnp.zeros((), jnp.int32),
            ema_params=jax.tree.map(jnp.array, params) if want_ema else None,
        )

    return jax.jit(_init)(rng)


def acoustic_inference_params(state: AcousticTrainState):
    """Parameters for inference/eval — the EMA copy when present."""
    return state.params if state.ema_params is None else state.ema_params


def acoustic_params_from_tree(tree: dict, prefer_ema: bool = True):
    """Same selection from a CheckpointManager.restore_tree() dict (the
    optimizer-agnostic CLI restore path)."""
    ema = tree.get("ema_params") if prefer_ema else None
    return ema if ema is not None else tree["params"]


def acoustic_train_step(
    state: AcousticTrainState,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    *,
    model: SAMBERTAcousticModel,
    opt: optax.GradientTransformation,
    weights: LossWeights = LossWeights(),
    scheduled_sampling: float = 0.0,
    mixed_precision: bool = False,
    stage: TrainStageConfig = TrainStageConfig(),
) -> Tuple[AcousticTrainState, Dict[str, jnp.ndarray]]:
    """batch keys: ph_ids, tone_ids, boundary_ids [B, Tph] int32;
    dur_gt [B, Tph] int32; mel_gt [B, maxF, n_mels]; pitch_gt, energy_gt
    [B, maxF]; phoneme_mask [B, Tph] bool; pitch_mask [B, maxF] bool
    (voiced-frame mask, reference: models/losses.py:157-207).

    scheduled_sampling > 0 enables two-pass parallel scheduled sampling:
    pass 1 runs the ordinary teacher-forced forward; pass 2 re-runs it with
    each decoder-input frame replaced (per-frame Bernoulli(p)) by the
    pass-1 prediction, and the loss is taken on pass 2.  Targets are
    unchanged - only the decoder's conditioning mixes in its own outputs,
    which narrows the train/inference mismatch of free-running AR decoding
    (exposure bias).  The reference has no trainer, so pure teacher forcing
    (p = 0) remains the default recipe.

    mixed_precision=True runs the model forward/backward in bfloat16 (master
    params stay f32 — layers cast weights at use); outputs are cast back to
    f32 so every loss reduction, the optimizer, and the update are full
    precision.  bf16 shares f32's exponent range, so no loss scaling."""
    rng, ss_rng = jax.random.split(rng)
    if mixed_precision:
        model = model.clone(dtype=jnp.bfloat16)

    def forward(params, teacher_mel, dropout_rng):
        return model.apply(
            params,
            batch["ph_ids"],
            batch["tone_ids"],
            batch["boundary_ids"],
            teacher_mel,
            batch["dur_gt"],
            batch.get("pitch_gt"),
            batch.get("energy_gt"),
            batch.get("phoneme_mask"),
            deterministic=False,
            rngs={"dropout": dropout_rng},
        )

    def loss_fn(params):
        teacher_mel = batch["mel_gt"]
        if scheduled_sampling > 0.0:
            pass1 = forward(params, teacher_mel, rng)
            keep_own = jax.random.bernoulli(
                ss_rng, scheduled_sampling,
                teacher_mel.shape[:2] + (1,),
            )
            teacher_mel = jnp.where(
                keep_own, jax.lax.stop_gradient(pass1.mel_pred), teacher_mel
            )
        out = forward(params, teacher_mel, rng)
        if mixed_precision:
            out = cast_floats(out, jnp.float32)
        total, metrics = acoustic_loss(
            out.mel_pred,
            batch["mel_gt"],
            out.predictions["log_dur_pred"],
            batch["dur_gt"],
            out.predictions["pitch_frm"],
            batch["pitch_gt"],
            out.predictions["energy_frm"],
            batch["energy_gt"],
            mel_mask=out.frame_mask,
            phoneme_mask=batch.get("phoneme_mask"),
            pitch_mask=batch.get("pitch_mask"),
            weights=weights,
        )
        return total, metrics

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics["grad_norm"] = optax.global_norm(grads)
    metrics["lr"] = current_lr(stage, state.step)
    ema_params = state.ema_params
    if ema_params is not None:
        ema_params = ema_update(ema_params, params, stage.ema_decay)
    return (
        AcousticTrainState(
            params=params,
            opt_state=opt_state,
            step=state.step + 1,
            ema_params=ema_params,
        ),
        metrics,
    )


def make_jitted_acoustic_step(
    model: SAMBERTAcousticModel, cfg: TTSConfig, mesh=None
) -> Callable:
    opt = make_acoustic_optimizer(cfg)
    step = functools.partial(
        acoustic_train_step, model=model, opt=opt, weights=cfg.loss_weights,
        scheduled_sampling=cfg.training.acoustic.scheduled_sampling,
        mixed_precision=cfg.training.acoustic.mixed_precision,
        stage=cfg.training.acoustic,
    )
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )

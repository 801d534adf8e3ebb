"""HiFi-GAN GAN training, one jitted step.

The reference's only "trainer" is an eager demo
(reference: demo_ablation_modes.py:33-225): D-step on detached fake audio,
optimizer step, then REGENERATE the fake audio and take the G-step against the
just-updated discriminators.  That exact ordering is reproduced here inside a
single jitted `train_step`:

  1. wav_fake = G(mel)
  2. d_grads on discriminate(wav_real, stop_gradient(wav_fake)) -> update D
  3. wav_fake' = G(mel) again (same G params, reference regenerates too),
     discriminate with the UPDATED D, generator loss per ablation mode
     -> update G

In mel_only mode the discriminator branch is skipped entirely
(reference: demo_ablation_modes.py:107-119) but the metrics dict still carries
the full key schema with zeros.

Optimizers: AdamW(lr 2e-4, betas (0.8, 0.99)) for G and for MSD+MPD jointly
(reference: demo_ablation_modes.py:71-78, configs/config.yaml:26-33; no
gradient clipping for the vocoder).

Scaling: the step is sharding-agnostic; `make_jitted_vocoder_step` binds it to
a mesh with the batch sharded over 'data' and both states replicated — XLA
inserts the gradient all-reduces over ICI.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import AudioConfig, LossWeights, TTSConfig, TrainStageConfig
from ..losses.vocoder import (
    should_train_discriminator,
    vocoder_discriminator_loss,
    vocoder_generator_loss,
)
from ..models.hifigan import HiFiGAN, msd_fmap_true_counts
from ..parallel.mesh import batch_sharding, replicated_sharding
from .acoustic_trainer import cast_floats
from .optim import build_optimizer, current_lr, ema_update
from .train_state import VocoderTrainState


def make_vocoder_optimizers(cfg: TTSConfig):
    # Both sides get the stage's schedule/clip/accumulation (training/optim.py);
    # D keeps its separate base rate (GAN hygiene).
    tr = cfg.training.vocoder
    g_opt = build_optimizer(tr)
    d_opt = build_optimizer(tr, base_lr=tr.learning_rate_discriminator or tr.learning_rate)
    return g_opt, d_opt


def init_vocoder_state(
    model: HiFiGAN,
    cfg: TTSConfig,
    rng,
    mel_frames: int = 32,
    batch: int = 1,
    ema: Optional[bool] = None,
) -> VocoderTrainState:
    """`ema` overrides the config's ema_decay>0 decision for whether the
    state carries a g_ema_params slot — inference/eval CLIs pass
    CheckpointManager.has_ema() so the restore target matches the
    checkpoint's structure."""
    g_opt, d_opt = make_vocoder_optimizers(cfg)
    want_ema = (cfg.training.vocoder.ema_decay > 0.0) if ema is None else ema

    # Jitted whole-state init: G + 8 discriminators initialized eagerly is
    # hundreds of tiny per-op XLA compiles (the dominant cost of cold starts
    # on slow hosts); as one jitted program it compiles once and rides the
    # persistent cache (see acoustic_trainer.init_acoustic_state).
    def _init(rng) -> VocoderTrainState:
        mel = jnp.zeros((batch, cfg.audio.n_mels, mel_frames))
        variables = model.init(rng, mel, method=HiFiGAN.init_all)
        params = variables["params"]
        g_params = {"params": {"generator": params["generator"]}}
        d_params = {"params": {"msd": params["msd"], "mpd": params["mpd"]}}
        d_trainable = d_params
        if "spectral" in variables:
            # spectral-norm u/v state: carried next to the D params but NOT
            # trainable (the optimizer sees only the "params" subtree)
            d_params = {**d_params, "spectral": variables["spectral"]}
        return VocoderTrainState(
            g_params=g_params,
            d_params=d_params,
            g_opt_state=g_opt.init(g_params),
            d_opt_state=d_opt.init(d_trainable),
            step=jnp.zeros((), jnp.int32),
            g_ema_params=jax.tree.map(jnp.array, g_params) if want_ema else None,
        )

    return jax.jit(_init)(rng)


def generator_inference_params(state: VocoderTrainState) -> dict:
    """The generator parameter subtree for inference/eval — the EMA copy when
    the state carries one (training/optim.py), else the raw trained params."""
    src = state.g_ema_params if state.g_ema_params is not None else state.g_params
    return {"params": src["params"]["generator"]}


def generator_params_from_tree(tree: dict, prefer_ema: bool = True) -> dict:
    """Same selection from a CheckpointManager.restore_tree() dict (the
    optimizer-agnostic CLI restore path)."""
    src = tree.get("g_ema_params") if prefer_ema else None
    if src is None:
        src = tree["g_params"]
    return {"params": src["params"]["generator"]}


def _discriminate(model: HiFiGAN, d_params, wav_real, wav_fake):
    # "compute" fmap layout: MSD feature maps stay in the chained-folded
    # pseudo-channel layout and MPD's stay channel-last — no unfold/transpose
    # relayouts inside the jitted step (profiled at 28 ms/step in torch
    # layout).  Loss exactness is preserved via msd_fmap_true_counts below.
    return model.apply(
        d_params, wav_real, wav_fake, "compute", method=HiFiGAN.discriminate
    )


def _generate(model: HiFiGAN, g_params, mel):
    return model.apply(g_params, mel)


def vocoder_train_step(
    state: VocoderTrainState,
    mel: jnp.ndarray,  # [B, n_mels, Tfrm]
    wav_real: jnp.ndarray,  # [B, 1, Tfrm * hop]
    *,
    model: HiFiGAN,
    g_opt: optax.GradientTransformation,
    d_opt: optax.GradientTransformation,
    audio: AudioConfig,
    loss_mode: str,
    weights: LossWeights = LossWeights(),
    mixed_precision: bool = False,
    d_update_every: int = 1,
    stage: TrainStageConfig = TrainStageConfig(),
) -> Tuple[VocoderTrainState, Dict[str, jnp.ndarray]]:
    metrics: Dict[str, jnp.ndarray] = {}
    train_d = should_train_discriminator(loss_mode)
    if mixed_precision:
        # bf16 G/D compute (master params stay f32; layers cast weights at
        # use).  Waveforms and feature maps are cast back to f32 at the loss
        # boundary below, so every loss reduction and both optimizers run
        # full precision.  bf16 shares f32's exponent range — no loss scale.
        model = model.clone(dtype=jnp.bfloat16)

    # ---- D step (reference: demo_ablation_modes.py:175-186) ----
    d_params, d_opt_state = state.d_params, state.d_opt_state
    # Spectral-norm state (models/layers.py:SpectralNorm) rides inside
    # d_params under the "spectral" collection key: it is NOT a trainable
    # leaf (no gradients/optimizer), but advances by one power iteration per
    # D-pass (torch n_power_iterations=1 semantics) via mutable apply.
    spectral = d_params.get("spectral")
    d_trainable = {"params": d_params["params"]}
    if train_d:
        # optimization_barrier at the generator->discriminator seam: under
        # bf16 the TPU fusion cost model CHECK-fails (jellyfish
        # TransformWindow) on candidates that span the generator's conv_post
        # and the MSD's folded-ladder reshape through the [B, T_wav, 1]
        # waveform; the barrier pins the waveform as a materialized boundary
        # (it is one anyway) on both forward and transpose paths.
        wav_fake = jax.lax.optimization_barrier(
            jax.lax.stop_gradient(_generate(model, state.g_params, mel))
        )

        def d_loss_fn(dp):
            if spectral is not None:
                outs, new_vars = model.apply(
                    {**dp, "spectral": spectral}, wav_real, wav_fake,
                    "compute", method=HiFiGAN.discriminate,
                    mutable=["spectral"],
                )
                new_spectral = new_vars["spectral"]
            else:
                outs = _discriminate(model, dp, wav_real, wav_fake)
                new_spectral = None
            (
                msd_ro, _, msd_fo, _, mpd_ro, _, mpd_fo, _,
            ) = cast_floats(outs, jnp.float32)
            loss, d_metrics = vocoder_discriminator_loss(
                list(msd_ro) + list(mpd_ro), list(msd_fo) + list(mpd_fo)
            )
            return loss, (d_metrics, new_spectral)

        (d_loss, (d_metrics, new_spectral)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(d_trainable)
        d_updates, d_opt_state_new = d_opt.update(
            d_grads, d_opt_state, d_trainable
        )
        d_params_new = optax.apply_updates(d_trainable, d_updates)
        if d_update_every > 1:
            # gate the D update on the step counter (one jitted program;
            # grads are computed regardless so metrics stay comparable)
            apply = (state.step % d_update_every) == 0
            pick = lambda new, old: jax.tree.map(  # noqa: E731
                lambda a, b: jnp.where(apply, a, b), new, old
            )
            d_params = pick(d_params_new, d_trainable)
            d_opt_state = pick(d_opt_state_new, d_opt_state)
        else:
            d_params, d_opt_state = d_params_new, d_opt_state_new
        if new_spectral is not None:
            # the power iteration advances on EVERY D forward (torch
            # semantics), independent of the gated optimizer update
            d_params = {
                **d_params, "spectral": jax.lax.stop_gradient(new_spectral)
            }
        metrics.update(d_metrics)
        metrics["d_grad_norm"] = optax.global_norm(d_grads)
    else:
        metrics["disc_loss"] = jnp.zeros((), jnp.float32)

    # ---- G step against the updated D (reference: demo_ablation_modes.py:194-210) ----
    def g_loss_fn(gp):
        # same barrier as the D step (fusion cost-model CHECK, see above)
        wav_fake = jax.lax.optimization_barrier(
            _generate(model, gp, mel).astype(jnp.float32)
        )
        kwargs = {}
        if train_d:
            (
                _, msd_rf, msd_fo, msd_ff, _, mpd_rf, mpd_fo, mpd_ff,
            ) = cast_floats(
                _discriminate(model, d_params, wav_real, wav_fake), jnp.float32
            )
            kwargs["disc_fake_outputs"] = list(msd_fo) + list(mpd_fo)
            if loss_mode == "adv_mel_fm":
                kwargs["real_feature_maps"] = list(msd_rf) + list(mpd_rf)
                kwargs["fake_feature_maps"] = list(msd_ff) + list(mpd_ff)
                dc = model.config.discriminator
                kwargs["fmap_counts"] = msd_fmap_true_counts(
                    wav_real.shape[2], wav_real.shape[0],
                    channel_div=dc.channel_div, fold_max=dc.msd_fold_max,
                    n_scales=dc.msd_scales,
                ) + [None] * len(dc.mpd_periods)
        loss, g_metrics = vocoder_generator_loss(
            wav_real, wav_fake, audio, loss_mode=loss_mode, weights=weights, **kwargs
        )
        return loss, g_metrics

    (g_loss, g_metrics), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
        state.g_params
    )
    g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt_state, state.g_params)
    g_params = optax.apply_updates(state.g_params, g_updates)
    metrics.update(g_metrics)
    metrics["g_grad_norm"] = optax.global_norm(g_grads)
    metrics["lr"] = current_lr(stage, state.step)
    if not train_d:
        metrics["d_grad_norm"] = jnp.zeros((), jnp.float32)
    g_ema = state.g_ema_params
    if g_ema is not None:
        g_ema = ema_update(g_ema, g_params, stage.ema_decay)

    new_state = VocoderTrainState(
        g_params=g_params,
        d_params=d_params,
        g_opt_state=g_opt_state,
        d_opt_state=d_opt_state,
        step=state.step + 1,
        g_ema_params=g_ema,
    )
    return new_state, metrics


def make_jitted_vocoder_step(
    model: HiFiGAN,
    cfg: TTSConfig,
    mesh=None,
    loss_mode: Optional[str] = None,
) -> Callable:
    """Bind config and (optionally) a mesh; returns jitted
    (state, mel, wav) -> (state, metrics) with donated state."""
    g_opt, d_opt = make_vocoder_optimizers(cfg)
    step = functools.partial(
        vocoder_train_step,
        model=model,
        g_opt=g_opt,
        d_opt=d_opt,
        audio=cfg.audio,
        loss_mode=loss_mode or cfg.vocoder.loss_mode,
        weights=cfg.loss_weights,
        mixed_precision=cfg.training.vocoder.mixed_precision,
        d_update_every=cfg.training.vocoder.d_update_every,
        stage=cfg.training.vocoder,
    )
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, data, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )

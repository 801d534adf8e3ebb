"""bf16 mixed-precision training equivalence.

The reference's AMP task was specced but never implemented
(reference: .kiro/specs/tts-sam-bert-hifigan/tasks.md:426-429); the TPU-native
recipe (TrainStageConfig.mixed_precision, default ON) runs model compute in
bfloat16 while master params, grads, optimizer state, and loss reductions stay
f32.  These tests pin the contract:

  1. the bf16 loss trajectory tracks the f32 trajectory over several steps
     (bf16 is a compute-precision change, not a different recipe);
  2. master parameters and optimizer state never leave float32;
  3. the bf16 step is finite and actually runs in the default suite.
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from sambert_hifigan_tpu.config import (
    AcousticModelConfig,
    DecoderConfig,
    DiscriminatorConfig,
    EncoderConfig,
    GeneratorConfig,
    TTSConfig,
    VocoderConfig,
)
from sambert_hifigan_tpu.models.acoustic_model import SAMBERTAcousticModel
from sambert_hifigan_tpu.models.hifigan import HiFiGAN
from sambert_hifigan_tpu.training.acoustic_trainer import (
    init_acoustic_state,
    make_jitted_acoustic_step,
)
from sambert_hifigan_tpu.training.vocoder_trainer import (
    init_vocoder_state,
    make_jitted_vocoder_step,
)

TINY_ACOUSTIC = AcousticModelConfig(
    d_model=32,
    encoder=EncoderConfig(n_layers=1, n_heads=4, d_ff=64),
    decoder=DecoderConfig(n_layers=1, n_heads=4, d_ff=64, max_len=128),
)
TINY_VOC = VocoderConfig(
    generator=GeneratorConfig(
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    ),
    # 2 MPD periods + 2 MSD scales: the equivalence under test is an
    # aggregate-metric property of the partitioned/bf16 GAN step, not of
    # the 8-way fan-out (test_training.py keeps the full 8-tuple contract);
    # halving the stack halves the XLA:CPU compile that dominates this file.
    discriminator=DiscriminatorConfig(
        mpd_periods=(2, 3), msd_scales=2, channel_div=16
    ),
)


def _cfg(mixed: bool) -> TTSConfig:
    base = TTSConfig()
    training = dataclasses.replace(
        base.training,
        acoustic=dataclasses.replace(base.training.acoustic, mixed_precision=mixed),
        vocoder=dataclasses.replace(base.training.vocoder, mixed_precision=mixed),
    )
    return dataclasses.replace(
        base,
        acoustic_model=TINY_ACOUSTIC,
        vocoder=dataclasses.replace(TINY_VOC, loss_mode="adv_mel_fm"),
        training=training,
    )


def _acoustic_batch(b=4, tph=6, maxf=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "ph_ids": jnp.asarray(rng.integers(4, 300, (b, tph)), jnp.int32),
        "tone_ids": jnp.asarray(rng.integers(0, 10, (b, tph)), jnp.int32),
        "boundary_ids": jnp.asarray(rng.integers(0, 5, (b, tph)), jnp.int32),
        "dur_gt": jnp.asarray(rng.integers(1, 3, (b, tph)), jnp.int32),
        "mel_gt": jnp.asarray(rng.standard_normal((b, maxf, 80)), jnp.float32),
        "pitch_gt": jnp.asarray(rng.uniform(80, 600, (b, maxf)), jnp.float32),
        "energy_gt": jnp.asarray(rng.uniform(0, 1, (b, maxf)), jnp.float32),
        "phoneme_mask": jnp.ones((b, tph), bool),
        "pitch_mask": jnp.asarray(rng.random((b, maxf)) > 0.3),
    }


def test_acoustic_bf16_tracks_f32_trajectory():
    """4 consecutive steps; every per-step loss within 10% of the f32 arm
    (bf16 mantissa ~3 decimal digits; trajectories diverge slowly, not
    wildly, when the recipe is otherwise identical)."""
    batches = [_acoustic_batch(seed=s) for s in range(4)]
    keys = [jax.random.PRNGKey(100 + s) for s in range(4)]
    losses = {}
    for mixed in (False, True):
        cfg = _cfg(mixed)
        model = SAMBERTAcousticModel(cfg.acoustic_model)
        state = init_acoustic_state(
            model, cfg, jax.random.PRNGKey(0), tph=6, max_frames=16
        )
        step = make_jitted_acoustic_step(model, cfg)
        traj = []
        for b, k in zip(batches, keys):
            state, m = step(state, b, k)
            traj.append(float(m["mel_loss"]))
        losses[mixed] = traj
        # master params and Adam state stay f32 regardless of compute dtype
        for leaf in jax.tree.leaves(state.params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree.leaves(state.opt_state):
            if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
                assert jnp.asarray(leaf).dtype == jnp.float32
    np.testing.assert_allclose(losses[True], losses[False], rtol=0.1)


def test_vocoder_bf16_tracks_f32_gan_step():
    """Two GAN steps (adv_mel_fm: both optimizers, FM + STFT + adv terms);
    headline losses within 10% of the f32 arm, params stay f32."""
    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.standard_normal((2, 80, 8)), jnp.float32)
    wav = jnp.asarray(rng.standard_normal((2, 1, 8 * 256)) * 0.1, jnp.float32)
    mel2 = jnp.asarray(rng.standard_normal((2, 80, 8)), jnp.float32)
    wav2 = jnp.asarray(rng.standard_normal((2, 1, 8 * 256)) * 0.1, jnp.float32)
    out = {}
    for mixed in (False, True):
        cfg = _cfg(mixed)
        model = HiFiGAN(cfg.vocoder)
        state = init_vocoder_state(model, cfg, jax.random.PRNGKey(0), mel_frames=8)
        step = make_jitted_vocoder_step(model, cfg)
        state, m1 = step(state, mel, wav)
        state, m2 = step(state, mel2, wav2)
        out[mixed] = {k: float(v) for k, v in m2.items()}
        for leaf in jax.tree.leaves(state.g_params) + jax.tree.leaves(
            state.d_params
        ):
            assert leaf.dtype == jnp.float32
        for k, v in out[mixed].items():
            assert np.isfinite(v), k
    for k in ("gen_loss", "disc_loss", "gen_mel_loss", "gen_fm_loss"):
        np.testing.assert_allclose(
            out[True][k], out[False][k], rtol=0.1, err_msg=k
        )

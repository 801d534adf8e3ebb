"""End-to-end lifecycle test: train one step of each model, checkpoint,
restore into a TTSPipeline, synthesize.  This is the full production path
(train -> save -> load -> infer) on tiny configs."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sambert_hifigan_tpu.config import (
    AcousticModelConfig,
    DecoderConfig,
    DiscriminatorConfig,
    EncoderConfig,
    GeneratorConfig,
    RuntimeConfig,
    TTSConfig,
    VocoderConfig,
)
from sambert_hifigan_tpu.data.dataset import synthetic_batch
from sambert_hifigan_tpu.models.acoustic_model import SAMBERTAcousticModel
from sambert_hifigan_tpu.models.hifigan import HiFiGAN
from sambert_hifigan_tpu.pipeline import TTSPipeline
from sambert_hifigan_tpu.training.acoustic_trainer import (
    init_acoustic_state,
    make_jitted_acoustic_step,
)
from sambert_hifigan_tpu.training.checkpoint import CheckpointManager
from sambert_hifigan_tpu.training.vocoder_trainer import (
    init_vocoder_state,
    make_jitted_vocoder_step,
)


def _tiny_cfg():
    return dataclasses.replace(
        TTSConfig(),
        acoustic_model=AcousticModelConfig(
            d_model=32,
            encoder=EncoderConfig(n_layers=1, n_heads=4, d_ff=64),
            decoder=DecoderConfig(n_layers=1, n_heads=4, d_ff=64, max_len=256),
        ),
        vocoder=VocoderConfig(
            generator=GeneratorConfig(
                upsample_initial_channel=32,
                resblock_kernel_sizes=(3,),
                resblock_dilation_sizes=((1, 3),),
            ),
            discriminator=DiscriminatorConfig(channel_div=16),
            loss_mode="mel_only",
        ),
        runtime=RuntimeConfig(phoneme_buckets=(16, 32), frame_buckets=(64, 128)),
    )


@pytest.mark.slow
def test_train_checkpoint_restore_synthesize(tmp_path):
    """Marked slow (the single biggest compile stack in the suite); every
    piece is covered individually by test_training, test_checkpoint, and
    test_pipeline — this test is their integration, run via `-m ""`."""
    cfg = _tiny_cfg()
    rng = np.random.default_rng(0)

    # --- train acoustic for 1 step and checkpoint
    ac_model = SAMBERTAcousticModel(cfg.acoustic_model)
    ac_state = init_acoustic_state(ac_model, cfg, jax.random.PRNGKey(0))
    ac_step = make_jitted_acoustic_step(ac_model, cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(cfg, 2, tph=8, tfrm=32).items()
        if k != "frame_lengths"
    }
    ac_state, _ = ac_step(ac_state, batch, jax.random.PRNGKey(1))
    ac_ckpt = CheckpointManager(str(tmp_path / "acoustic"), cfg.audio)
    ac_ckpt.save(1, jax.device_get(ac_state))

    # --- train vocoder (mel_only) for 1 step and checkpoint
    voc_model = HiFiGAN(cfg.vocoder)
    voc_state = init_vocoder_state(voc_model, cfg, jax.random.PRNGKey(2), mel_frames=8)
    voc_step = make_jitted_vocoder_step(voc_model, cfg)
    mel = jnp.asarray(rng.standard_normal((2, 80, 8)), jnp.float32)
    wav = jnp.asarray(rng.standard_normal((2, 1, 8 * 256)) * 0.1, jnp.float32)
    voc_state, _ = voc_step(voc_state, mel, wav)
    voc_ckpt = CheckpointManager(str(tmp_path / "vocoder"), cfg.audio)
    voc_ckpt.save(1, jax.device_get(voc_state))

    # --- restore fresh states and build the pipeline (the inference.py path)
    ac_fresh = init_acoustic_state(ac_model, cfg, jax.random.PRNGKey(9))
    ac_restored, step = ac_ckpt.restore(ac_fresh)
    assert step == 1
    voc_fresh = init_vocoder_state(voc_model, cfg, jax.random.PRNGKey(9), mel_frames=8)
    voc_restored, _ = voc_ckpt.restore(voc_fresh)
    gen_params = {"params": voc_restored.g_params["params"]["generator"]}
    pipe = TTSPipeline(cfg, ac_restored.params, gen_params)

    wav_out = pipe.synthesize("你好世界")
    assert wav_out.ndim == 1 and wav_out.shape[0] > 0
    assert np.isfinite(wav_out).all()

    # restored params actually drive the output: a random-weight pipeline of
    # the same shapes produces different audio
    from sambert_hifigan_tpu.pipeline import build_pipeline_from_random_init

    other = build_pipeline_from_random_init(cfg, seed=123)
    wav_other = other.synthesize("你好世界")
    if wav_other.shape == wav_out.shape:
        assert not np.allclose(wav_other, wav_out)

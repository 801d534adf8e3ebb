"""Full SAM-BERT acoustic model tests.

Ports reference tests/test_acoustic_model.py (train vs inference mode,
prediction-dict schema and shapes 61-145, non-zero outputs 245-265) and
tests/test_acoustic_model_with_losses.py (full train step: forward -> loss ->
grad; every parameter receives gradient 112-118; optimizer steps stay finite
233-299).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sambert_hifigan_tpu.config import (
    AcousticModelConfig,
    DecoderConfig,
    EncoderConfig,
    FrontendConfig,
    VarianceAdaptorConfig,
)
from sambert_hifigan_tpu.losses.acoustic import acoustic_loss
from sambert_hifigan_tpu.models.acoustic_model import (
    SAMBERTAcousticModel,
    acoustic_inference,
)

TINY = AcousticModelConfig(
    d_model=32,
    n_mels=80,
    encoder=EncoderConfig(n_layers=2, n_heads=4, d_ff=64),
    decoder=DecoderConfig(n_layers=2, n_heads=4, d_ff=64, max_len=256),
    variance_adaptor=VarianceAdaptorConfig(),
)

B, TPH, MAXF = 2, 10, 40


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    ph = jnp.asarray(rng.integers(4, 300, (B, TPH)), jnp.int32)
    tone = jnp.asarray(rng.integers(0, 10, (B, TPH)), jnp.int32)
    bound = jnp.asarray(rng.integers(0, 5, (B, TPH)), jnp.int32)
    dur = jnp.asarray(rng.integers(1, 4, (B, TPH)), jnp.int32)
    mel = jnp.asarray(rng.standard_normal((B, MAXF, 80)), jnp.float32)
    pitch = jnp.asarray(rng.uniform(80, 600, (B, MAXF)), jnp.float32)
    energy = jnp.asarray(rng.uniform(0, 1, (B, MAXF)), jnp.float32)
    return ph, tone, bound, dur, mel, pitch, energy


@pytest.fixture(scope="module")
def model_params():
    model = SAMBERTAcousticModel(TINY)
    ph, tone, bound, dur, mel, pitch, energy = _batch()
    params = model.init(
        jax.random.PRNGKey(0), ph, tone, bound, mel, dur, pitch, energy
    )
    return model, params


class TestTrainingForward:
    def test_shapes_and_schema(self, model_params):
        model, params = model_params
        ph, tone, bound, dur, mel, pitch, energy = _batch()
        out = model.apply(params, ph, tone, bound, mel, dur, pitch, energy)
        assert out.mel_pred.shape == (B, MAXF, 80)
        assert out.frame_mask.shape == (B, MAXF)
        assert set(out.predictions) == {
            "log_dur_pred", "dur", "pitch_tok", "pitch_frm", "energy_tok",
            "energy_frm",
        }
        np.testing.assert_array_equal(
            np.asarray(out.predictions["dur"]), np.asarray(dur)
        )
        assert np.isfinite(np.asarray(out.mel_pred)).all()
        assert np.abs(np.asarray(out.mel_pred)).sum() > 0

    def test_full_train_step_every_param_gets_grad(self, model_params):
        model, params = model_params
        ph, tone, bound, dur, mel, pitch, energy = _batch()

        def loss_fn(p):
            out = model.apply(
                p, ph, tone, bound, mel, dur, pitch, energy,
                deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(7)},
            )
            total, d = acoustic_loss(
                out.mel_pred, mel,
                out.predictions["log_dur_pred"], dur,
                out.predictions["pitch_frm"], pitch,
                out.predictions["energy_frm"], energy,
                mel_mask=out.frame_mask,
            )
            return total, d

        (total, d), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        assert np.isfinite(float(total))
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        zero_grads = [
            jax.tree_util.keystr(k) for k, v in flat if float(jnp.abs(v).sum()) == 0.0
        ]
        assert zero_grads == [], f"params with zero grad: {zero_grads}"

    def test_three_optimizer_steps_stay_finite(self, model_params):
        # (reference: tests/test_acoustic_model_with_losses.py:233-299)
        import optax

        model, params = model_params
        ph, tone, bound, dur, mel, pitch, energy = _batch()
        opt = optax.adamw(1e-4)
        opt_state = opt.init(params)

        @jax.jit
        def step(p, s, key):
            def loss_fn(p):
                out = model.apply(
                    p, ph, tone, bound, mel, dur, pitch, energy,
                    deterministic=False, rngs={"dropout": key},
                )
                total, _ = acoustic_loss(
                    out.mel_pred, mel,
                    out.predictions["log_dur_pred"], dur,
                    out.predictions["pitch_frm"], pitch,
                    out.predictions["energy_frm"], energy,
                    mel_mask=out.frame_mask,
                )
                return total

            loss, g = jax.value_and_grad(loss_fn)(p)
            updates, s = opt.update(g, s, p)
            return optax.apply_updates(p, updates), s, loss

        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(3):
            key, sub = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, sub)
            losses.append(float(loss))
        assert all(np.isfinite(l) for l in losses), losses


class TestInference:
    def test_inference_shapes_and_masking(self, model_params):
        model, params = model_params
        ph, tone, bound, *_ = _batch(3)
        out = acoustic_inference(model, params, ph, tone, bound, max_frames=MAXF)
        assert out.mel_pred.shape == (B, MAXF, 80)
        m = np.asarray(out.frame_mask)
        mel = np.asarray(out.mel_pred)
        # frames beyond the predicted total are zeroed
        assert np.abs(mel[~m]).sum() == 0.0
        assert np.isfinite(mel).all()

    def test_inference_durations_at_least_one(self, model_params):
        model, params = model_params
        ph, tone, bound, *_ = _batch(4)
        out = acoustic_inference(model, params, ph, tone, bound, max_frames=MAXF)
        assert (np.asarray(out.predictions["dur"]) >= 1).all()


class TestParamCount:
    def test_default_config_matches_reference(self):
        """15,715,411 params at default config (BASELINE.md, measured from
        reference models/acoustic_model.py:99-179)."""
        model = SAMBERTAcousticModel(AcousticModelConfig())
        ph = jnp.zeros((1, 4), jnp.int32)
        mel = jnp.zeros((1, 8, 80))
        dur = jnp.full((1, 4), 2, jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ph, ph, ph, mel, dur)
        n = sum(x.size for x in jax.tree.leaves(params))
        assert n == 15_715_411, n

"""Variance adaptor tests.

Ports reference contracts: quantization boundaries (tests/test_pitch_predictor.py:
94-126), expansion totals (129-152), teacher-forcing duration passthrough
(tests/test_variance_adaptor.py:88), predictor mask fill, prediction-dict schema.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sambert_hifigan_tpu.config import VarianceAdaptorConfig
from sambert_hifigan_tpu.models.variance_adaptor import (
    VarianceAdaptor,
    VariancePredictor,
    quantize_energy,
    quantize_pitch,
)

D = 32
CFG = VarianceAdaptorConfig()


def _rand(seed, *shape):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


class TestQuantization:
    def test_pitch_boundaries(self):
        # min -> bin 0, max -> bin 255, clamping out-of-range
        vals = jnp.asarray([80.0, 600.0, 50.0, 700.0, 340.0])
        bins = np.asarray(quantize_pitch(vals, 256, 80.0, 600.0))
        assert bins[0] == 0
        assert bins[1] == 255
        assert bins[2] == 0  # clamped below
        assert bins[3] == 255  # clamped above
        assert 0 < bins[4] < 255

    def test_energy_boundaries(self):
        vals = jnp.asarray([0.0, 1.0, -0.5, 2.0, 0.5])
        bins = np.asarray(quantize_energy(vals, 256, 0.0, 1.0))
        assert bins[0] == 0
        # energy has the +1e-8 denominator, so max lands on 254 after
        # truncation (reference: models/variance_adaptor.py:505-508 has the
        # same truncation math; 1.0/(1+1e-8)*255 = 254.999... -> 254)
        assert bins[1] in (254, 255)
        assert bins[2] == 0
        assert bins[3] == bins[1]

    def test_pitch_truncation_matches_torch_long(self):
        # .long() truncates toward zero (reference: variance_adaptor.py:352)
        torch = pytest.importorskip("torch")
        vals = np.linspace(80, 600, 37).astype(np.float32)
        ours = np.asarray(quantize_pitch(jnp.asarray(vals), 256, 80.0, 600.0))
        v = torch.clamp(torch.from_numpy(vals), 80.0, 600.0)
        v = (v - 80.0) / (600.0 - 80.0)
        want = torch.clamp((v * 255).long(), 0, 255).numpy()
        np.testing.assert_array_equal(ours, want)


class TestVariancePredictor:
    def test_shape_and_mask_fill(self):
        model = VariancePredictor(D)
        x = _rand(0, 2, 10, D)
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.shape == (2, 10)
        mask = jnp.ones((2, 10), bool).at[:, 7:].set(False)
        out_m = np.asarray(model.apply(params, x, mask))
        assert (out_m[:, 7:] == -1e9).all()
        np.testing.assert_allclose(out_m[:, :7], np.asarray(out)[:, :7], atol=1e-6)

    def test_dropout_active_in_training(self):
        model = VariancePredictor(D, dropout=0.5)
        x = _rand(0, 2, 10, D)
        params = model.init(jax.random.PRNGKey(0), x)
        a = model.apply(
            params, x, None, False, rngs={"dropout": jax.random.PRNGKey(1)}
        )
        b = model.apply(
            params, x, None, False, rngs={"dropout": jax.random.PRNGKey(2)}
        )
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestVarianceAdaptor:
    @pytest.fixture(scope="class")
    def model_params(self):
        model = VarianceAdaptor(D, CFG)
        henc = _rand(0, 2, 8, D)
        dur = jnp.asarray(np.random.default_rng(1).integers(1, 4, (2, 8)), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), henc, 32, dur)
        return model, params

    def test_teacher_forcing_duration_passthrough(self, model_params):
        # dur == dur_gt under teacher forcing
        model, params = model_params
        henc = _rand(0, 2, 8, D)
        dur_gt = jnp.asarray([[1, 2, 3, 1, 2, 3, 1, 2]] * 2, jnp.int32)
        out = model.apply(params, henc, 32, dur_gt)
        np.testing.assert_array_equal(np.asarray(out.predictions["dur"]), np.asarray(dur_gt))
        assert int(out.total_frames[0]) == 15

    def test_prediction_dict_schema(self, model_params):
        model, params = model_params
        henc = _rand(0, 2, 8, D)
        dur_gt = jnp.full((2, 8), 2, jnp.int32)
        out = model.apply(params, henc, 32, dur_gt)
        assert set(out.predictions) == {
            "log_dur_pred", "dur", "pitch_tok", "pitch_frm", "energy_tok",
            "energy_frm",
        }
        assert out.predictions["log_dur_pred"].shape == (2, 8)
        assert out.predictions["pitch_frm"].shape == (2, 32)
        assert out.hvar.shape == (2, 32, D)

    def test_inference_durations_positive(self, model_params):
        model, params = model_params
        henc = _rand(3, 2, 8, D)
        out = model.apply(params, henc, 64)
        dur = np.asarray(out.predictions["dur"])
        assert (dur >= 1).all()  # clamp(round(exp(.)), min=1)

    def test_inference_padded_phonemes_emit_no_frames(self, model_params):
        model, params = model_params
        henc = _rand(3, 2, 8, D)
        pmask = jnp.ones((2, 8), bool).at[:, 5:].set(False)
        out = model.apply(params, henc, 64, None, None, None, pmask)
        dur = np.asarray(out.predictions["dur"])
        assert (dur[:, 5:] == 0).all()

    def test_pitch_frame_expansion_follows_duration(self, model_params):
        model, params = model_params
        henc = _rand(0, 1, 8, D)
        dur_gt = jnp.asarray([[3, 1, 2, 1, 1, 1, 1, 2]], jnp.int32)
        out = model.apply(params, henc, 16, dur_gt)
        pf = np.asarray(out.predictions["pitch_frm"])[0]
        pt = np.asarray(out.predictions["pitch_tok"])[0]
        # first phoneme repeated 3x
        np.testing.assert_allclose(pf[:3], pt[0], atol=1e-6)
        np.testing.assert_allclose(pf[3], pt[1], atol=1e-6)

    def test_hvar_masked_beyond_total(self, model_params):
        model, params = model_params
        henc = _rand(0, 1, 8, D)
        dur_gt = jnp.full((1, 8), 1, jnp.int32)  # 8 frames of 16
        out = model.apply(params, henc, 16, dur_gt)
        h = np.asarray(out.hvar)
        assert np.abs(h[0, 8:]).sum() == 0.0

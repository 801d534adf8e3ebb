"""LR schedules, EMA, and gradient accumulation (training/optim.py).

The reference trains with constant rates and no parameter averaging
(reference: demo_ablation_modes.py:71-78); these are the production knobs the
TPU framework adds on top.  Schedule/EMA math is tested pure (no compiles);
the accumulation semantics are pinned on a toy optax problem (exact
equivalence) and on ONE tiny vocoder GAN program (integration smoke).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from sambert_hifigan_tpu.config import ConfigError, TrainStageConfig, validate_config
from sambert_hifigan_tpu.training.optim import (
    build_optimizer,
    current_lr,
    ema_update,
    inference_params,
    make_lr_schedule,
    maybe_init_ema,
)


class TestSchedules:
    def test_constant_default(self):
        tr = TrainStageConfig(learning_rate=3e-4)
        s = make_lr_schedule(tr)
        assert float(s(0)) == pytest.approx(3e-4)
        assert float(s(10_000)) == pytest.approx(3e-4)

    def test_exponential_staircase(self):
        tr = TrainStageConfig(
            learning_rate=2e-4,
            lr_schedule="exponential",
            lr_decay_gamma=0.5,
            lr_decay_steps=100,
        )
        s = make_lr_schedule(tr)
        assert float(s(0)) == pytest.approx(2e-4)
        assert float(s(99)) == pytest.approx(2e-4)  # staircase: flat within the bucket
        assert float(s(100)) == pytest.approx(1e-4)
        assert float(s(200)) == pytest.approx(5e-5)

    def test_warmup_cosine_shape(self):
        tr = TrainStageConfig(
            learning_rate=1e-3,
            lr_schedule="warmup_cosine",
            warmup_steps=10,
            lr_total_steps=100,
            lr_end_ratio=0.1,
        )
        s = make_lr_schedule(tr)
        assert float(s(0)) == pytest.approx(0.0, abs=1e-9)
        assert float(s(10)) == pytest.approx(1e-3)   # peak at end of warmup
        assert float(s(5)) == pytest.approx(5e-4)    # linear ramp
        assert float(s(100)) == pytest.approx(1e-4)  # floor = peak * end_ratio
        assert float(s(55)) < 1e-3                   # strictly decaying after peak

    def test_warmup_composes_with_exponential(self):
        tr = TrainStageConfig(
            learning_rate=1e-3,
            lr_schedule="exponential",
            lr_decay_gamma=0.5,
            lr_decay_steps=100,
            warmup_steps=10,
        )
        s = make_lr_schedule(tr)
        assert float(s(5)) == pytest.approx(5e-4)
        # post-warmup, the exponential schedule runs on (step - warmup)
        assert float(s(10)) == pytest.approx(1e-3)
        assert float(s(110)) == pytest.approx(5e-4)

    def test_d_lr_override(self):
        tr = TrainStageConfig(learning_rate=2e-4)
        assert float(make_lr_schedule(tr, base_lr=4e-4)(0)) == pytest.approx(4e-4)

    def test_current_lr_counts_applied_updates(self):
        tr = TrainStageConfig(
            learning_rate=1e-3,
            lr_schedule="exponential",
            lr_decay_gamma=0.5,
            lr_decay_steps=1,
            accumulate_steps=4,
        )
        # 8 micro-steps = 2 applied updates -> gamma^2
        assert float(current_lr(tr, jnp.asarray(8))) == pytest.approx(2.5e-4)

    def test_unknown_schedule_raises(self):
        with pytest.raises(ConfigError):
            make_lr_schedule(TrainStageConfig(lr_schedule="linear"))

    def test_validate_config_rejects_bad_knobs(self):
        from sambert_hifigan_tpu.config import TTSConfig, TrainingConfig

        base = TTSConfig()
        for bad in (
            TrainStageConfig(lr_schedule="bogus"),
            TrainStageConfig(ema_decay=1.5),
            TrainStageConfig(accumulate_steps=0),
        ):
            cfg = dataclasses.replace(
                base, training=TrainingConfig(acoustic=bad)
            )
            with pytest.raises(ConfigError):
                validate_config(cfg)


class TestEMA:
    def test_update_math(self):
        ema = {"w": jnp.asarray([1.0, 2.0])}
        params = {"w": jnp.asarray([3.0, 4.0])}
        out = ema_update(ema, params, 0.9)
        np.testing.assert_allclose(out["w"], [1.2, 2.2], rtol=1e-6)

    def test_maybe_init(self):
        params = {"w": jnp.ones((2,))}
        assert maybe_init_ema(TrainStageConfig(ema_decay=0.0), params) is None
        ema = maybe_init_ema(TrainStageConfig(ema_decay=0.99), params)
        np.testing.assert_allclose(ema["w"], params["w"])

    def test_inference_params_prefers_ema(self):
        p, e = {"w": 1}, {"w": 2}
        assert inference_params(p, None) is p
        assert inference_params(p, e) is e


class TestAccumulation:
    """optax.MultiSteps wiring: k accumulated micro-grads == one combined
    update, and the schedule advances per APPLIED update."""

    def _quadratic_grads(self, params, batch):
        # grad of 0.5 * mean((w - batch)^2) wrt w
        return {"w": params["w"] - jnp.mean(batch)}

    def test_two_micro_steps_equal_one_combined(self):
        tr_acc = TrainStageConfig(
            learning_rate=1e-2, accumulate_steps=2, gradient_clip=None,
            weight_decay=0.0,
        )
        tr_one = dataclasses.replace(tr_acc, accumulate_steps=1)
        opt_acc = build_optimizer(tr_acc)
        opt_one = build_optimizer(tr_one)

        params = {"w": jnp.asarray(1.0)}
        b1, b2 = jnp.asarray([0.0, 2.0]), jnp.asarray([4.0, 6.0])

        # accumulate path: two micro-batches
        s = opt_acc.init(params)
        p_acc = params
        for b in (b1, b2):
            up, s = opt_acc.update(self._quadratic_grads(p_acc, b), s, p_acc)
            p_acc = optax.apply_updates(p_acc, up)

        # combined path: grad of the concatenated batch (== mean of the two
        # micro-grads for this loss) applied once
        s1 = opt_one.init(params)
        g = self._quadratic_grads(params, jnp.concatenate([b1, b2]))
        up, _ = opt_one.update(g, s1, params)
        p_one = optax.apply_updates(params, up)

        np.testing.assert_allclose(p_acc["w"], p_one["w"], rtol=1e-6)

    def test_no_update_until_kth_micro_step(self):
        tr = TrainStageConfig(
            learning_rate=1e-2, accumulate_steps=3, gradient_clip=None
        )
        opt = build_optimizer(tr)
        params = {"w": jnp.asarray(1.0)}
        s = opt.init(params)
        up, s = opt.update({"w": jnp.asarray(1.0)}, s, params)
        assert float(jnp.abs(up["w"])) == 0.0  # first micro-step: no movement


class TestVocoderIntegration:
    """One tiny GAN program exercising schedule + EMA + accumulation
    together inside the jitted step."""

    @pytest.fixture(scope="class")
    def setup(self):
        from sambert_hifigan_tpu.config import (
            DiscriminatorConfig,
            GeneratorConfig,
            TTSConfig,
            VocoderConfig,
        )
        from sambert_hifigan_tpu.models.hifigan import HiFiGAN
        from sambert_hifigan_tpu.training.vocoder_trainer import (
            init_vocoder_state,
            make_jitted_vocoder_step,
        )

        tr = dataclasses.replace(
            TTSConfig().training.vocoder,
            lr_schedule="exponential",
            lr_decay_gamma=0.5,
            lr_decay_steps=1,
            ema_decay=0.5,
            accumulate_steps=2,
        )
        cfg = dataclasses.replace(
            TTSConfig(),
            vocoder=VocoderConfig(
                generator=GeneratorConfig(
                    upsample_initial_channel=32,
                    resblock_kernel_sizes=(3,),
                    resblock_dilation_sizes=((1, 3),),
                ),
                discriminator=DiscriminatorConfig(channel_div=16),
                loss_mode="mel_only",  # cheapest graph; EMA/schedule live on G
            ),
        )
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training, vocoder=tr)
        )
        model = HiFiGAN(cfg.vocoder)
        state = init_vocoder_state(model, cfg, jax.random.PRNGKey(0), mel_frames=8)
        step = make_jitted_vocoder_step(model, cfg)
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.standard_normal((2, 80, 8)), jnp.float32)
        wav = jnp.asarray(rng.standard_normal((2, 1, 8 * 256)) * 0.1, jnp.float32)
        return state, step, mel, wav

    @staticmethod
    def _fresh(state):
        # the jitted step donates the state's buffers; each test needs its
        # own copy of the class-scoped initial state
        return jax.tree.map(jnp.copy, state)

    def test_ema_schedule_accumulation_step(self, setup):
        state, step, mel, wav = setup
        state = self._fresh(state)
        g0 = jax.device_get(state.g_params)
        assert state.g_ema_params is not None

        # micro-step 1: accumulation -> params frozen, lr at applied-update 0
        state, m1 = step(state, mel, wav)
        assert float(m1["lr"]) == pytest.approx(2e-4)
        g1 = jax.device_get(state.g_params)
        np.testing.assert_allclose(
            jax.tree.leaves(g0)[0], jax.tree.leaves(g1)[0], rtol=0, atol=0
        )

        # micro-step 2: the accumulated update applies; EMA tracks the move
        state, m2 = step(state, mel, wav)
        g2 = jax.device_get(state.g_params)
        moved = any(
            not np.allclose(a, b)
            for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2))
        )
        assert moved
        ema = jax.device_get(state.g_ema_params)
        # EMA is strictly between the old and new params somewhere
        diffs = [
            np.max(np.abs(np.asarray(e) - np.asarray(p)))
            for e, p in zip(jax.tree.leaves(ema), jax.tree.leaves(g2))
        ]
        assert max(diffs) > 0

        # micro-steps 3+4: one more applied update -> exponential lr halves
        state, _ = step(state, mel, wav)
        state, m4 = step(state, mel, wav)
        assert float(m4["lr"]) == pytest.approx(1e-4)

    def test_generator_inference_params_uses_ema(self, setup):
        from sambert_hifigan_tpu.training.vocoder_trainer import (
            generator_inference_params,
        )

        state, step, mel, wav = setup
        state = self._fresh(state)
        state, _ = step(state, mel, wav)
        state, _ = step(state, mel, wav)
        gp = generator_inference_params(state)
        ema_gen = state.g_ema_params["params"]["generator"]
        assert jax.tree.structure(gp["params"]) == jax.tree.structure(ema_gen)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(gp["params"])[0]),
            np.asarray(jax.tree.leaves(ema_gen)[0]),
        )


def _tiny_acoustic(ema_decay: float):
    from sambert_hifigan_tpu.config import (
        AcousticModelConfig,
        DecoderConfig,
        EncoderConfig,
        TTSConfig,
    )
    from sambert_hifigan_tpu.models.acoustic_model import SAMBERTAcousticModel

    cfg = dataclasses.replace(
        TTSConfig(),
        acoustic_model=AcousticModelConfig(
            d_model=32,
            encoder=EncoderConfig(n_layers=1, n_heads=4, d_ff=64),
            decoder=DecoderConfig(n_layers=1, n_heads=4, d_ff=64, max_len=64),
        ),
    )
    cfg = dataclasses.replace(
        cfg,
        training=dataclasses.replace(
            cfg.training,
            acoustic=dataclasses.replace(
                cfg.training.acoustic, ema_decay=ema_decay
            ),
        ),
    )
    return cfg, SAMBERTAcousticModel(cfg.acoustic_model)


class TestAcousticEMAState:
    def test_init_and_checkpoint_roundtrip(self, tmp_path):
        from sambert_hifigan_tpu.training.acoustic_trainer import (
            acoustic_inference_params,
            init_acoustic_state,
        )
        from sambert_hifigan_tpu.training.checkpoint import CheckpointManager

        cfg, model = _tiny_acoustic(ema_decay=0.9)
        state = init_acoustic_state(model, cfg, jax.random.PRNGKey(0), tph=4,
                                    max_frames=8)
        assert state.ema_params is not None
        assert acoustic_inference_params(state) is state.ema_params

        ckpt = CheckpointManager(str(tmp_path / "ck"), cfg.audio)
        ckpt.save(1, jax.device_get(state))
        fresh = init_acoustic_state(model, cfg, jax.random.PRNGKey(1), tph=4,
                                    max_frames=8)
        restored, step = ckpt.restore(fresh)
        assert step == 1
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(restored.ema_params)[0]),
            np.asarray(jax.tree.leaves(state.ema_params)[0]),
        )


class TestEMACheckpointReconcile:
    """Toggling --ema-decay across a resume must never structure-mismatch:
    enabling EMA on a pre-EMA checkpoint seeds the average from the restored
    params; disabling it drops the stored copy (training/checkpoint.py)."""

    def _init(self, ema_decay, seed=0):
        from sambert_hifigan_tpu.training.acoustic_trainer import (
            init_acoustic_state,
        )

        cfg, model = _tiny_acoustic(ema_decay)
        state = init_acoustic_state(
            model, cfg, jax.random.PRNGKey(seed), tph=4, max_frames=8
        )
        return cfg, state

    def test_enable_ema_on_pre_ema_checkpoint(self, tmp_path):
        from sambert_hifigan_tpu.training.checkpoint import CheckpointManager

        cfg, state = self._init(ema_decay=0.0)
        assert state.ema_params is None
        ckpt = CheckpointManager(str(tmp_path / "ck"), cfg.audio)
        ckpt.save(3, jax.device_get(state))

        _, fresh = self._init(ema_decay=0.9, seed=1)
        restored, step = ckpt.restore(fresh)
        assert step == 3
        # params restored from disk, EMA seeded as a copy of them
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(restored.params)[0]),
            np.asarray(jax.tree.leaves(state.params)[0]),
        )
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(restored.ema_params)[0]),
            np.asarray(jax.tree.leaves(restored.params)[0]),
        )

    def test_disable_ema_drops_stored_copy(self, tmp_path):
        from sambert_hifigan_tpu.training.checkpoint import CheckpointManager

        cfg, state = self._init(ema_decay=0.9)
        assert state.ema_params is not None
        ckpt = CheckpointManager(str(tmp_path / "ck"), cfg.audio)
        ckpt.save(5, jax.device_get(state))

        _, fresh = self._init(ema_decay=0.0, seed=1)
        restored, step = ckpt.restore(fresh)
        assert step == 5
        assert restored.ema_params is None
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(restored.params)[0]),
            np.asarray(jax.tree.leaves(state.params)[0]),
        )

    def test_has_ema_and_cli_style_restore(self, tmp_path):
        """Inference/eval CLIs init with ema=manager.has_ema() so the restore
        target's structure always matches the checkpoint's: an EMA-trained
        checkpoint keeps (and prefers) its averaged copy even though the
        CLI's default config has ema_decay=0."""
        from sambert_hifigan_tpu.training.acoustic_trainer import (
            acoustic_inference_params,
            init_acoustic_state,
        )
        from sambert_hifigan_tpu.training.checkpoint import CheckpointManager

        cfg, state = self._init(ema_decay=0.9)
        ckpt = CheckpointManager(str(tmp_path / "ck"), cfg.audio)
        ckpt.save(7, jax.device_get(state))
        assert ckpt.has_ema() and ckpt.has_ema(step=7)

        # CLI path: config says EMA off, but the checkpoint carries one.
        cli_cfg, model = _tiny_acoustic(ema_decay=0.0)
        fresh = init_acoustic_state(
            model, cli_cfg, jax.random.PRNGKey(1), tph=4, max_frames=8,
            ema=ckpt.has_ema(),
        )
        assert fresh.ema_params is not None
        restored, _ = ckpt.restore(fresh)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(restored.ema_params)[0]),
            np.asarray(jax.tree.leaves(state.ema_params)[0]),
        )
        assert acoustic_inference_params(restored) is restored.ema_params

    def test_has_ema_false_for_pre_ema_checkpoint(self, tmp_path):
        from sambert_hifigan_tpu.training.checkpoint import CheckpointManager

        cfg, state = self._init(ema_decay=0.0)
        ckpt = CheckpointManager(str(tmp_path / "ck"), cfg.audio)
        assert not ckpt.has_ema()  # empty dir
        ckpt.save(2, jax.device_get(state))
        assert not ckpt.has_ema()


class TestRestoreTree:
    """restore_tree(): the optimizer-agnostic CLI restore path — a checkpoint
    trained with ANY optimizer knobs (schedule/EMA/accumulation) loads under
    the default config, because no optimizer state is reconstructed."""

    def test_vocoder_tree_prefers_ema(self, tmp_path):
        import dataclasses

        from sambert_hifigan_tpu.config import (
            DiscriminatorConfig,
            GeneratorConfig,
            TTSConfig,
            VocoderConfig,
        )
        from sambert_hifigan_tpu.models.hifigan import HiFiGAN
        from sambert_hifigan_tpu.training.checkpoint import CheckpointManager
        from sambert_hifigan_tpu.training.vocoder_trainer import (
            generator_params_from_tree,
            init_vocoder_state,
        )

        cfg = dataclasses.replace(
            TTSConfig(),
            vocoder=VocoderConfig(
                generator=GeneratorConfig(
                    upsample_initial_channel=32,
                    resblock_kernel_sizes=(3,),
                    resblock_dilation_sizes=((1,),),
                ),
                discriminator=DiscriminatorConfig(
                    mpd_periods=(2,), msd_scales=1, channel_div=32
                ),
            ),
        )
        # non-default knobs: EMA + accumulation (MultiSteps-wrapped opt state)
        cfg = dataclasses.replace(
            cfg,
            training=dataclasses.replace(
                cfg.training,
                vocoder=dataclasses.replace(
                    cfg.training.vocoder, ema_decay=0.9, accumulate_steps=2
                ),
            ),
        )
        state = init_vocoder_state(
            HiFiGAN(cfg.vocoder), cfg, jax.random.PRNGKey(0), mel_frames=8
        )
        ckpt = CheckpointManager(str(tmp_path / "ck"), cfg.audio)
        ckpt.save(9, jax.device_get(state))

        tree, step = ckpt.restore_tree()
        assert step == 9
        ema_sel = generator_params_from_tree(tree)
        raw_sel = generator_params_from_tree(tree, prefer_ema=False)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(ema_sel)[0]),
            np.asarray(
                jax.tree.leaves(
                    {"params": state.g_ema_params["params"]["generator"]}
                )[0]
            ),
        )
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(raw_sel)[0]),
            np.asarray(
                jax.tree.leaves({"params": state.g_params["params"]["generator"]})[0]
            ),
        )

    def test_acoustic_tree_falls_back_to_raw(self, tmp_path):
        from sambert_hifigan_tpu.training.acoustic_trainer import (
            acoustic_params_from_tree,
            init_acoustic_state,
        )
        from sambert_hifigan_tpu.training.checkpoint import CheckpointManager

        cfg, model = _tiny_acoustic(ema_decay=0.0)
        state = init_acoustic_state(model, cfg, jax.random.PRNGKey(0), tph=4,
                                    max_frames=8)
        ckpt = CheckpointManager(str(tmp_path / "ck"), cfg.audio)
        ckpt.save(1, jax.device_get(state))
        tree, _ = ckpt.restore_tree()
        sel = acoustic_params_from_tree(tree)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(sel)[0]),
            np.asarray(jax.tree.leaves(state.params)[0]),
        )

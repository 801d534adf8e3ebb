"""Checkpoint/resume tests: roundtrip fidelity, latest-step selection,
mel-fingerprint enforcement, GC of old checkpoints."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sambert_hifigan_tpu.config import AudioConfig, ConfigError
from sambert_hifigan_tpu.training.checkpoint import CheckpointManager
from sambert_hifigan_tpu.training.train_state import AcousticTrainState


def _state(seed=0):
    rng = np.random.default_rng(seed)
    params = {
        "params": {
            "layer": {
                "kernel": jnp.asarray(rng.standard_normal((4, 8)), jnp.float32),
                "bias": jnp.asarray(rng.standard_normal(8), jnp.float32),
            }
        }
    }
    return AcousticTrainState(
        params=params,
        opt_state={"mu": jax.tree.map(jnp.zeros_like, params)},
        step=jnp.asarray(7, jnp.int32),
    )


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), AudioConfig())
        state = _state()
        mgr.save(7, state)
        restored, step = mgr.restore(_state(seed=1))
        assert step == 7
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_latest_step(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), AudioConfig())
        assert mgr.latest_step() is None
        mgr.save(5, _state())
        mgr.save(10, _state(1))
        assert mgr.latest_step() == 10
        _, step = mgr.restore(_state(), step=5)
        assert step == 5

    def test_mel_fingerprint_mismatch_refuses_resume(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), AudioConfig())
        mgr.save(3, _state())
        drifted = CheckpointManager(str(tmp_path), AudioConfig(hop_length=128))
        with pytest.raises(ConfigError, match="mel"):
            drifted.restore(_state())

    def test_background_save_roundtrip(self, tmp_path):
        """background=True snapshots on-device and writes on a thread; the
        checkpoint is complete and exact after wait()."""
        mgr = CheckpointManager(str(tmp_path), AudioConfig())
        state = _state()
        mgr.save(7, state, background=True)
        mgr.wait()
        restored, step = mgr.restore(_state(seed=1))
        assert step == 7
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_background_save_serializes_with_next_save(self, tmp_path):
        """A second save waits out the in-flight one — no interleaving, the
        latest step always lands."""
        mgr = CheckpointManager(str(tmp_path), AudioConfig())
        mgr.save(1, _state(0), background=True)
        mgr.save(2, _state(1), background=True)
        mgr.wait()
        assert mgr.all_steps() == [1, 2]

    def test_bf16_precision_halves_opt_state_and_restores(self, tmp_path):
        """--save-precision bf16: optimizer leaves are stored bf16 (half the
        bytes), params stay f32 exact; restore() upcasts back to the target's
        f32 structure within bf16 tolerance."""
        mgr = CheckpointManager(str(tmp_path), AudioConfig())
        rng = np.random.default_rng(3)
        state = _state()
        state = dataclasses.replace(
            state,
            opt_state={"mu": jax.tree.map(
                lambda x: jnp.asarray(rng.standard_normal(x.shape), jnp.float32),
                state.params,
            )},
        )
        mgr.save(7, state, precision="bf16")
        # raw tree view: opt leaves bf16, params f32
        raw, _ = mgr.restore_tree()
        raw_opt_leaf = jax.tree.leaves(raw["opt_state"])[0]
        raw_param_leaf = jax.tree.leaves(raw["params"])[0]
        assert raw_opt_leaf.dtype == jnp.bfloat16
        assert raw_param_leaf.dtype == jnp.float32
        # structural restore into an f32 target upcasts
        restored, step = mgr.restore(_state(seed=1))
        assert step == 7
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
            assert b.dtype == jnp.float32
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=8e-3, atol=8e-3)

    def test_aborted_save_dir_is_recovered(self, tmp_path):
        """A killed background save can leave step_N/state committed with no
        meta.json; the dir must not block a later save at the same step
        (orbax refuses to overwrite a committed state)."""
        mgr = CheckpointManager(str(tmp_path), AudioConfig())
        orphan = tmp_path / "step_000000007" / "state"
        orphan.mkdir(parents=True)
        (orphan / "junk").write_text("partial")
        assert mgr.latest_step() is None  # meta-less dir is invisible
        mgr.save(7, _state())
        restored, step = mgr.restore(_state(seed=1))
        assert step == 7
        for a, b in zip(jax.tree.leaves(_state()), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bf16_restore_into_abstract_target(self, tmp_path):
        """restore() accepts abstract (ShapeDtypeStruct) targets for
        bf16-saved checkpoints too (the cast helper must not call .astype on
        abstract leaves)."""
        mgr = CheckpointManager(str(tmp_path), AudioConfig())
        state = _state()
        mgr.save(7, state, precision="bf16")
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
        )
        restored, step = mgr.restore(abstract)
        assert step == 7
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for b in jax.tree.leaves(restored.opt_state):
            assert b.dtype == jnp.float32  # upcast back to the target dtype

    def test_gc_keeps_latest_n(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), AudioConfig(), keep=2)
        for s in (1, 2, 3, 4):
            mgr.save(s, _state(s))
        assert mgr.all_steps() == [3, 4]

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

    def test_gc_keeps_latest_n(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), AudioConfig(), keep=2)
        for s in (1, 2, 3, 4):
            mgr.save(s, _state(s))
        assert mgr.all_steps() == [3, 4]

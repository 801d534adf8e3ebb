"""Static-shape length regulator tests.

Ports reference tests/test_length_regulator.py contracts (exact repeat
semantics 70-106, zero-duration 109-127, variable-length padding 44-67) and
adds a direct equivalence check against torch.repeat_interleave.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sambert_hifigan_tpu.ops.length_regulator import (
    gather_frames,
    length_regulate,
    regulate_indices,
)

torch = pytest.importorskip("torch")


class TestExactSemantics:
    def test_repeat_pattern(self):
        # dur [[2, 3, 1]] -> h1 h1 h2 h2 h2 h3
        h = jnp.asarray(np.arange(3, dtype=np.float32)[None, :, None] + 1.0)  # [1,3,1]
        dur = jnp.asarray([[2, 3, 1]])
        out, mask, total = length_regulate(h, dur, max_frames=8)
        np.testing.assert_array_equal(
            np.asarray(out)[0, :, 0], [1, 1, 2, 2, 2, 3, 0, 0]
        )
        np.testing.assert_array_equal(
            np.asarray(mask)[0], [1, 1, 1, 1, 1, 1, 0, 0]
        )
        assert int(total[0]) == 6

    def test_zero_duration_skipped(self):
        # (reference: tests/test_length_regulator.py:109-127)
        h = jnp.asarray(np.arange(4, dtype=np.float32)[None, :, None] + 1.0)
        dur = jnp.asarray([[2, 0, 3, 0]])
        out, mask, total = length_regulate(h, dur, max_frames=6)
        np.testing.assert_array_equal(np.asarray(out)[0, :, 0], [1, 1, 3, 3, 3, 0])
        assert int(total[0]) == 5

    def test_all_zero_durations(self):
        h = jnp.ones((1, 3, 4))
        dur = jnp.zeros((1, 3), jnp.int32)
        out, mask, total = length_regulate(h, dur, max_frames=4)
        assert int(total[0]) == 0
        assert not bool(mask.any())
        np.testing.assert_array_equal(np.asarray(out), np.zeros((1, 4, 4)))

    def test_negative_durations_clamped(self):
        # (reference clamps dur >= 0, models/variance_adaptor.py:217)
        h = jnp.ones((1, 2, 2))
        dur = jnp.asarray([[-3, 2]])
        out, mask, total = length_regulate(h, dur, max_frames=4)
        assert int(total[0]) == 2

    def test_matches_torch_repeat_interleave(self):
        rng = np.random.default_rng(0)
        for trial in range(5):
            tph = int(rng.integers(3, 12))
            h = rng.standard_normal((tph, 7)).astype(np.float32)
            dur = rng.integers(0, 6, tph)
            expected = (
                torch.repeat_interleave(
                    torch.from_numpy(h), torch.from_numpy(dur), dim=0
                )
                .numpy()
            )
            max_frames = int(dur.sum()) + 3
            out, mask, total = length_regulate(
                jnp.asarray(h)[None], jnp.asarray(dur)[None], max_frames
            )
            got = np.asarray(out)[0][: int(total[0])]
            np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_batch_padding(self):
        # different totals in one batch -> shared max_frames, per-sample mask
        h = jnp.ones((2, 3, 4))
        dur = jnp.asarray([[2, 2, 2], [1, 1, 1]])
        out, mask, total = length_regulate(h, dur, max_frames=8)
        assert list(np.asarray(total)) == [6, 3]
        assert np.asarray(mask).sum(axis=1).tolist() == [6, 3]

    def test_overflow_truncated_to_bucket(self):
        # totals beyond max_frames are clipped by the mask (bucket semantics)
        h = jnp.ones((1, 2, 2))
        dur = jnp.asarray([[5, 5]])
        out, mask, total = length_regulate(h, dur, max_frames=6)
        assert int(total[0]) == 10  # true total still reported
        assert int(np.asarray(mask).sum()) == 6

    def test_shared_indices_scalar_gather(self):
        dur = jnp.asarray([[2, 1, 3]])
        idx, mask, total = regulate_indices(dur, 8)
        scalars = jnp.asarray([[10.0, 20.0, 30.0]])
        out = gather_frames(scalars, idx, mask)
        np.testing.assert_array_equal(
            np.asarray(out)[0], [10, 10, 20, 30, 30, 30, 0, 0]
        )

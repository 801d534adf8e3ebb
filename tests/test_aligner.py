"""CTC forced aligner (data/aligner.py): Viterbi exactness + learned
alignment recovery on a synthetic corpus.

The duration contract these alignments must satisfy is the LengthRegulator's
(reference: models/variance_adaptor.py:171-269): dur >= 1 per phoneme and
sum(dur) == Tfrm exactly.
"""

import numpy as np
import pytest

from sambert_hifigan_tpu.data.aligner import (
    ctc_durations,
    nonblank_log_posteriors,
    train_ctc_aligner,
    viterbi_durations,
)


class TestViterbi:
    def test_hand_crafted_exact(self):
        lp = np.log(
            np.array(
                [
                    [0.9, 0.05, 0.05],
                    [0.9, 0.05, 0.05],
                    [0.05, 0.9, 0.05],
                    [0.05, 0.9, 0.05],
                    [0.05, 0.9, 0.05],
                    [0.05, 0.05, 0.9],
                ]
            )
        )
        np.testing.assert_array_equal(
            viterbi_durations(lp, np.array([0, 1, 2])), [2, 3, 1]
        )

    def test_sums_to_frames_and_min_one(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            t, k = int(rng.integers(10, 60)), 20
            n = int(rng.integers(2, min(t, 9)))
            lp = np.log(rng.dirichlet(np.ones(k), size=t))
            labels = rng.integers(0, k, n)
            dur = viterbi_durations(lp, labels)
            assert dur.sum() == t
            assert (dur >= 1).all()

    def test_single_label_takes_everything(self):
        lp = np.log(np.full((7, 4), 0.25))
        np.testing.assert_array_equal(viterbi_durations(lp, np.array([2])), [7])

    def test_more_labels_than_frames_raises(self):
        lp = np.zeros((2, 4))
        with pytest.raises(ValueError):
            viterbi_durations(lp, np.array([1, 2, 3]))

    def test_nonblank_renormalization_masks_blank(self):
        # blank is the LAST class (a dedicated index beyond the phoneme
        # vocab; id 0 is a legitimate label because ' ' maps to PAD=0)
        logits = np.zeros((3, 5))
        logits[:, -1] = 100.0  # huge blank mass
        lp = nonblank_log_posteriors(logits)
        assert lp.shape == (3, 4)  # blank column dropped
        np.testing.assert_allclose(np.exp(lp).sum(axis=1), 1.0, atol=1e-9)

    def test_space_in_text_aligns(self):
        """' ' maps to phoneme id 0; the aligner must not confuse it with
        the CTC blank (regression: blank used to BE id 0)."""
        from sambert_hifigan_tpu.data.aligner import blank_id

        assert blank_id(300) == 300  # never a frontend id


class TestLearnedAlignment:
    def test_recovers_synthetic_durations(self):
        """Corpus where each phoneme id has a distinct mel signature: the
        trained aligner must localize boundaries to within ~2 frames."""
        rng = np.random.default_rng(1)
        vocab, n_mels = 32, 80
        protos = rng.standard_normal((vocab, n_mels)).astype(np.float32) * 2
        samples, truths = [], []
        for _ in range(10):
            n = int(rng.integers(4, 8))
            ph = rng.integers(4, vocab, n).astype(np.int32)
            dur = rng.integers(2, 9, n)
            mel = np.concatenate(
                [np.tile(protos[p], (d, 1)) for p, d in zip(ph, dur)]
            )
            mel += 0.3 * rng.standard_normal(mel.shape).astype(np.float32)
            samples.append((mel.astype(np.float32), ph))
            truths.append(dur)
        net, params, losses = train_ctc_aligner(
            samples, vocab_size=vocab, n_mels=n_mels, steps=200,
            d_model=96, n_layers=2, frame_gran=16, label_gran=4, seed=0,
        )
        assert losses[-1] < losses[0] * 0.1  # converged
        errs = []
        for (mel, ph), dur_true in zip(samples, truths):
            dur = ctc_durations(net, params, mel, ph)
            assert dur.sum() == mel.shape[0]
            assert (dur >= 1).all()
            errs.append(np.abs(dur - dur_true).mean())
        # ~2-frame mean boundary error on 2-9-frame segments (threshold
        # includes headroom for training-dynamics jitter across refactors;
        # observed 1.9-2.2 depending on the blank-class layout)
        assert float(np.mean(errs)) < 2.5, errs

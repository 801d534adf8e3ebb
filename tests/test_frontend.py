"""Frontend tests (ports reference tests/test_frontend.py: BOS/EOS,
id ranges, determinism, batch padding)."""

import numpy as np

from sambert_hifigan_tpu.text.frontend import (
    BOS_ID,
    EOS_ID,
    PAD_ID,
    FrontEnd,
    pick_bucket,
)


class TestTextToSequence:
    def setup_method(self):
        self.fe = FrontEnd()

    def test_bos_eos_wrapping(self):
        ph, tone, bound = self.fe.text_to_sequence("你好")
        assert ph[0] == BOS_ID and ph[-1] == EOS_ID
        assert tone[0] == 0 and tone[-1] == 0
        assert bound[0] == 1 and bound[-1] == 3
        assert len(ph) == len(tone) == len(bound) == 4

    def test_id_ranges(self):
        ph, tone, bound = self.fe.text_to_sequence("你好世界abc123")
        assert all(0 <= p < 300 for p in ph)
        assert all(0 <= t < 10 for t in tone)
        assert all(0 <= b < 5 for b in bound)
        # content chars land in [4, vocab)
        assert all(p >= 4 for p in ph[1:-1])

    def test_deterministic(self):
        a = self.fe.text_to_sequence("今天天气真好")
        b = self.fe.text_to_sequence("今天天气真好")
        assert a == b

    def test_char_formula(self):
        # ord(c) % (vocab-4) + 4 (reference: models/frontend.py:89)
        ph, tone, _ = self.fe.text_to_sequence("A")
        assert ph[1] == (ord("A") % 296) + 4
        assert tone[1] == (ord("A") % 9) + 1

    def test_space_maps_to_pad(self):
        ph, tone, _ = self.fe.text_to_sequence("a b")
        assert ph[2] == PAD_ID and tone[2] == 0

    def test_empty_text(self):
        # (reference: models/frontend.py:148-150)
        assert self.fe.text_to_sequence("") == ([BOS_ID, EOS_ID], [0, 0], [1, 3])
        assert self.fe.text_to_sequence("   ") == ([BOS_ID, EOS_ID], [0, 0], [1, 3])

    def test_single_char_boundary(self):
        _, _, bound = self.fe.text_to_sequence("好")
        assert bound == [1, 4, 3]

    def test_boundary_positions(self):
        _, _, bound = self.fe.text_to_sequence("abcd")
        assert bound == [1, 1, 2, 2, 3, 3]


class TestBatchForward:
    def test_padding_and_mask(self):
        fe = FrontEnd()
        feat = fe.batch_forward(["你好", "今天天气真好"])
        assert feat.ph_ids.shape == (2, 8)  # longest = 6 chars + BOS/EOS
        assert feat.lengths.tolist() == [4, 8]
        mask = feat.phoneme_mask
        assert mask[0].sum() == 4 and mask[1].sum() == 8
        # padding is 0 in every stream (reference: models/frontend.py:242-247)
        assert (feat.ph_ids[0, 4:] == 0).all()
        assert (feat.tone_ids[0, 4:] == 0).all()
        assert (feat.boundary_ids[0, 4:] == 0).all()

    def test_pad_to_bucket(self):
        fe = FrontEnd()
        feat = fe("你好", pad_to=32)
        assert feat.ph_ids.shape == (1, 32)
        assert feat.lengths[0] == 4

    def test_batch_size_repeat(self):
        fe = FrontEnd()
        feat = fe("abc", batch_size=3)
        assert feat.ph_ids.shape[0] == 3
        assert (feat.ph_ids[0] == feat.ph_ids[2]).all()


def test_pick_bucket():
    assert pick_bucket(5, (32, 64)) == 32
    assert pick_bucket(33, (32, 64)) == 64
    import pytest

    with pytest.raises(ValueError):
        pick_bucket(100, (32, 64))

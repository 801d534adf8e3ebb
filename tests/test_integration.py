"""Cross-module integration tests.

Ports reference tests/test_integration_frontend_embedding.py (text -> H0 via
config) and tests/test_integration_phoneme_bert.py (embedding -> encoder with
gradient flow), plus the DEBUG_SHAPES observability contract
(reference: test_shape_logging.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sambert_hifigan_tpu.config import default_config
from sambert_hifigan_tpu.models.encoder import BERTEncoder
from sambert_hifigan_tpu.models.phoneme_embedding import PhonemeEmbedding
from sambert_hifigan_tpu.text.frontend import FrontEnd


class TestFrontendToEmbedding:
    def test_text_to_h0(self):
        cfg = default_config()
        fe = cfg.acoustic_model.frontend
        frontend = FrontEnd(fe.vocab_size, fe.tone_size, fe.boundary_size)
        feat = frontend.batch_forward(["你好世界", "今天天气真好"])
        emb = PhonemeEmbedding(
            fe.vocab_size, fe.tone_size, fe.boundary_size, cfg.acoustic_model.d_model
        )
        params = emb.init(
            jax.random.PRNGKey(0),
            jnp.asarray(feat.ph_ids),
            jnp.asarray(feat.tone_ids),
            jnp.asarray(feat.boundary_ids),
        )
        h0 = emb.apply(
            params,
            jnp.asarray(feat.ph_ids),
            jnp.asarray(feat.tone_ids),
            jnp.asarray(feat.boundary_ids),
        )
        assert h0.shape == (2, feat.ph_ids.shape[1], 256)
        assert np.isfinite(np.asarray(h0)).all()
        # identical padding rows get identical embeddings
        pad_rows = np.asarray(h0)[0, feat.lengths[0]:]
        if pad_rows.shape[0] > 1:
            np.testing.assert_allclose(pad_rows[0], pad_rows[1], atol=1e-6)


class TestEmbeddingToEncoder:
    def test_h0_to_henc_and_grad_flow(self):
        cfg = default_config()
        fe = cfg.acoustic_model.frontend
        d = 32
        emb = PhonemeEmbedding(fe.vocab_size, fe.tone_size, fe.boundary_size, d)
        from sambert_hifigan_tpu.config import EncoderConfig

        enc = BERTEncoder(d, EncoderConfig(n_layers=2, n_heads=4, d_ff=64))
        rng = np.random.default_rng(0)
        ph = jnp.asarray(rng.integers(4, fe.vocab_size, (2, 12)), jnp.int32)
        tone = jnp.asarray(rng.integers(0, fe.tone_size, (2, 12)), jnp.int32)
        bound = jnp.asarray(rng.integers(0, fe.boundary_size, (2, 12)), jnp.int32)
        pe = emb.init(jax.random.PRNGKey(0), ph, tone, bound)
        h0 = emb.apply(pe, ph, tone, bound)
        penc = enc.init(jax.random.PRNGKey(1), h0)

        def loss(pe_, penc_):
            h = emb.apply(pe_, ph, tone, bound)
            out = enc.apply(penc_, h)
            return jnp.mean(jnp.square(out))

        g_emb, g_enc = jax.grad(loss, argnums=(0, 1))(pe, penc)
        assert all(
            np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g_emb)
        )
        # gradient reaches the embedding tables through the encoder
        assert float(jnp.abs(g_emb["params"]["ph_emb"]).sum()) > 0

    def test_eval_deterministic(self):
        from sambert_hifigan_tpu.config import EncoderConfig

        enc = BERTEncoder(32, EncoderConfig(n_layers=2, n_heads=4, d_ff=64, dropout=0.5))
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 10, 32)), jnp.float32)
        params = enc.init(jax.random.PRNGKey(0), x)
        a = enc.apply(params, x)  # deterministic=True default
        b = enc.apply(params, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDebugShapes:
    def test_trace_shape_respects_env(self, monkeypatch, capsys):
        from sambert_hifigan_tpu.utils import debug

        monkeypatch.setenv("DEBUG_SHAPES", "0")
        debug.trace_shape("x", jnp.ones((2, 3)))
        assert capsys.readouterr().out == ""
        monkeypatch.setenv("DEBUG_SHAPES", "1")
        debug.trace_shape("x", jnp.ones((2, 3)))
        out = capsys.readouterr().out
        assert "[trace-shape] x" in out and "(2, 3)" in out

    def test_assert_shape(self):
        from sambert_hifigan_tpu.utils.debug import assert_rank, assert_shape

        x = jnp.ones((2, 5, 8))
        assert_shape(x, (None, 5, 8), "x")
        assert_rank(x, 3, "x")
        with pytest.raises(AssertionError):
            assert_shape(x, (None, 4, 8), "x")
        with pytest.raises(AssertionError):
            assert_rank(x, 2, "x")

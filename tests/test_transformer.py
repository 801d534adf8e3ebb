"""Transformer block parity vs torch nn.TransformerEncoderLayer /
nn.TransformerDecoderLayer with copied weights (eval mode, dropout 0).

This pins the post-norm residual placement, packed-QKV math, LayerNorm eps,
and causal/padding mask conventions that the BERT encoder and PNCA decoder
are built from (reference: models/bert_encoder.py:52-66,
models/ar_decoder.py:72-80).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sambert_hifigan_tpu.models.transformer import (
    MultiHeadAttention,
    TransformerDecoderLayer,
    TransformerEncoderLayer,
    causal_mask,
    sinusoidal_positional_encoding,
)

torch = pytest.importorskip("torch")

D, H, FF = 32, 4, 64


def _rand(seed, *shape):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def _mha_params_from_torch(mha):
    ipw = mha.in_proj_weight.detach().numpy()  # [3d, d]
    ipb = mha.in_proj_bias.detach().numpy()
    opw = mha.out_proj.weight.detach().numpy()  # [d, d]
    opb = mha.out_proj.bias.detach().numpy()
    d = ipw.shape[1]
    return {
        "wq": jnp.asarray(ipw[:d].T),
        "wk": jnp.asarray(ipw[d : 2 * d].T),
        "wv": jnp.asarray(ipw[2 * d :].T),
        "bq": jnp.asarray(ipb[:d]),
        "bk": jnp.asarray(ipb[d : 2 * d]),
        "bv": jnp.asarray(ipb[2 * d :]),
        "wo": jnp.asarray(opw.T),
        "bo": jnp.asarray(opb),
    }


def _linear_params(lin):
    return {
        "kernel": jnp.asarray(lin.weight.detach().numpy().T),
        "bias": jnp.asarray(lin.bias.detach().numpy()),
    }


def _norm_params(norm):
    return {
        "scale": jnp.asarray(norm.weight.detach().numpy()),
        "bias": jnp.asarray(norm.bias.detach().numpy()),
    }


class TestMHAParity:
    def test_self_attention(self):
        t_mha = torch.nn.MultiheadAttention(D, H, dropout=0.0, batch_first=True)
        t_mha.eval()
        x = _rand(0, 2, 10, D)
        ours = MultiHeadAttention(D, H, 0.0)
        params = {"params": _mha_params_from_torch(t_mha)}
        got = np.asarray(ours.apply(params, jnp.asarray(x), jnp.asarray(x)))
        want = t_mha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x))[0]
        np.testing.assert_allclose(got, want.detach().numpy(), rtol=1e-4, atol=1e-5)

    def test_causal_mask_parity(self):
        t_mha = torch.nn.MultiheadAttention(D, H, dropout=0.0, batch_first=True)
        t_mha.eval()
        x = _rand(1, 2, 8, D)
        mask_t = torch.triu(torch.ones(8, 8), diagonal=1).bool()
        ours = MultiHeadAttention(D, H, 0.0)
        params = {"params": _mha_params_from_torch(t_mha)}
        got = np.asarray(
            ours.apply(params, jnp.asarray(x), jnp.asarray(x), causal_mask(8))
        )
        want = t_mha(
            torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
            attn_mask=mask_t,
        )[0]
        np.testing.assert_allclose(got, want.detach().numpy(), rtol=1e-4, atol=1e-5)

    def test_key_padding_mask_parity(self):
        t_mha = torch.nn.MultiheadAttention(D, H, dropout=0.0, batch_first=True)
        t_mha.eval()
        x = _rand(2, 2, 8, D)
        kpm = np.zeros((2, 8), bool)
        kpm[0, 5:] = True
        kpm[1, 6:] = True
        ours = MultiHeadAttention(D, H, 0.0)
        params = {"params": _mha_params_from_torch(t_mha)}
        got = np.asarray(
            ours.apply(
                params, jnp.asarray(x), jnp.asarray(x),
                None, jnp.asarray(kpm),
            )
        )
        want = t_mha(
            torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
            key_padding_mask=torch.from_numpy(kpm),
        )[0]
        np.testing.assert_allclose(got, want.detach().numpy(), rtol=1e-4, atol=1e-5)


class TestEncoderLayerParity:
    def test_matches_torch(self):
        t_layer = torch.nn.TransformerEncoderLayer(
            D, H, FF, dropout=0.0, activation="relu", batch_first=True,
            norm_first=False,
        )
        t_layer.eval()
        x = _rand(3, 2, 12, D)
        params = {
            "params": {
                "self_attn": _mha_params_from_torch(t_layer.self_attn),
                "norm1": _norm_params(t_layer.norm1),
                "norm2": _norm_params(t_layer.norm2),
                "ffn": {
                    "linear1": _linear_params(t_layer.linear1),
                    "linear2": _linear_params(t_layer.linear2),
                },
            }
        }
        ours = TransformerEncoderLayer(D, H, FF, 0.0)
        got = np.asarray(ours.apply(params, jnp.asarray(x)))
        want = t_layer(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestDecoderLayerParity:
    def _params(self, t_layer):
        return {
            "params": {
                "self_attn": _mha_params_from_torch(t_layer.self_attn),
                "cross_attn": _mha_params_from_torch(t_layer.multihead_attn),
                "norm1": _norm_params(t_layer.norm1),
                "norm2": _norm_params(t_layer.norm2),
                "norm3": _norm_params(t_layer.norm3),
                "ffn": {
                    "linear1": _linear_params(t_layer.linear1),
                    "linear2": _linear_params(t_layer.linear2),
                },
            }
        }

    def test_matches_torch_with_causal_mask(self):
        t_layer = torch.nn.TransformerDecoderLayer(
            D, H, FF, dropout=0.0, activation="relu", batch_first=True,
        )
        t_layer.eval()
        tgt = _rand(4, 2, 9, D)
        mem = _rand(5, 2, 15, D)
        mask_t = torch.triu(torch.ones(9, 9), diagonal=1).bool()
        ours = TransformerDecoderLayer(D, H, FF, 0.0)
        got = np.asarray(
            ours.apply(
                self._params(t_layer), jnp.asarray(tgt), jnp.asarray(mem),
                causal_mask(9),
            )
        )
        want = (
            t_layer(torch.from_numpy(tgt), torch.from_numpy(mem), tgt_mask=mask_t)
            .detach()
            .numpy()
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_decode_step_matches_full_forward(self):
        """KV-cache incremental decoding == full-sequence forward (eval)."""
        t_layer = torch.nn.TransformerDecoderLayer(
            D, H, FF, dropout=0.0, activation="relu", batch_first=True
        )
        t_layer.eval()
        params = self._params(t_layer)
        ours = TransformerDecoderLayer(D, H, FF, 0.0)
        tgt = jnp.asarray(_rand(6, 2, 7, D))
        mem = jnp.asarray(_rand(7, 2, 11, D))
        full = ours.apply(params, tgt, mem, causal_mask(7))

        bound = ours.bind(params)
        mem_k, mem_v = bound.precompute_memory_kv(mem)
        cache = bound.self_attn.init_cache(2, 7)
        steps = []
        for t in range(7):
            out_t, cache = bound.decode_step(
                tgt[:, t, :], cache, jnp.int32(t), mem_k, mem_v
            )
            steps.append(out_t)
        incremental = jnp.stack(steps, axis=1)
        np.testing.assert_allclose(
            np.asarray(incremental), np.asarray(full), rtol=1e-4, atol=1e-5
        )


class TestPositionalEncoding:
    def test_matches_reference_formula(self):
        pe = np.asarray(sinusoidal_positional_encoding(100, 16))
        pos, i = 7, 3
        div = np.exp(2 * i * (-np.log(10000.0) / 16))
        assert abs(pe[pos, 2 * i] - np.sin(pos * div)) < 1e-5
        assert abs(pe[pos, 2 * i + 1] - np.cos(pos * div)) < 1e-5

    def test_causal_mask_pattern(self):
        # (reference: tests/test_ar_decoder.py:191-212)
        m = np.asarray(causal_mask(4))
        expected = np.array(
            [
                [0, 1, 1, 1],
                [0, 0, 1, 1],
                [0, 0, 0, 1],
                [0, 0, 0, 0],
            ],
            dtype=bool,
        )
        np.testing.assert_array_equal(m, expected)

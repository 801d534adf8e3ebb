"""Parity tests for the conv primitives against torch.nn.functional.

These pin down the padding/stride/dilation/groups arithmetic that every model
component builds on (generator upsampling chain, MRF dilated stacks, MSD
grouped strided convs, MPD 2-D convs, variance-adaptor predictors).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sambert_hifigan_tpu.ops.conv import (
    avg_pool1d,
    conv1d,
    conv2d,
    conv_transpose1d,
    get_padding,
    leaky_relu,
    reflect_pad_time,
    weight_norm_kernel,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _np(seed, *shape):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


class TestConv1d:
    @pytest.mark.parametrize(
        "cin,cout,k,stride,pad,dil,groups",
        [
            (80, 512, 7, 1, 3, 1, 1),      # generator conv_pre
            (256, 256, 3, 1, 2, 2, 1),     # dilated MRF-style
            (256, 256, 11, 1, 25, 5, 1),   # k=11 dil=5
            (128, 128, 41, 2, 20, 1, 4),   # MSD grouped strided
            (128, 256, 41, 2, 20, 1, 16),
            (256, 256, 3, 1, 1, 1, 1),     # predictor conv
        ],
    )
    def test_matches_torch(self, cin, cout, k, stride, pad, dil, groups):
        x = _np(0, 2, 100, cin)  # [B, T, C]
        w = _np(1, cout, cin // groups, k)  # torch layout [out, in/groups, k]
        b = _np(2, cout)
        ours = np.asarray(
            conv1d(
                jnp.asarray(x),
                jnp.asarray(w.transpose(2, 1, 0)),  # -> [k, in/groups, out]
                jnp.asarray(b),
                stride=stride,
                padding=pad,
                dilation=dil,
                groups=groups,
            )
        )
        theirs = (
            F.conv1d(
                torch.from_numpy(x.transpose(0, 2, 1)),
                torch.from_numpy(w),
                torch.from_numpy(b),
                stride=stride,
                padding=pad,
                dilation=dil,
                groups=groups,
            )
            .numpy()
            .transpose(0, 2, 1)
        )
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


class TestConvTranspose1d:
    @pytest.mark.parametrize(
        "cin,cout,k,stride",
        [(512, 256, 16, 8), (256, 128, 16, 8), (128, 64, 4, 2), (64, 32, 4, 2)],
    )
    def test_matches_torch_generator_config(self, cin, cout, k, stride):
        # Generator upsampling: padding = (k - u) // 2
        # (reference: models/hifigan.py:196-203)
        pad = (k - stride) // 2
        x = _np(0, 2, 37, cin)
        w = _np(1, cin, cout, k)  # torch ConvTranspose1d layout [in, out, k]
        b = _np(2, cout)
        # effective-conv form: flip kernel axis, [k, in, out]
        w_eff = w[:, :, ::-1].transpose(2, 0, 1).copy()
        ours = np.asarray(
            conv_transpose1d(
                jnp.asarray(x), jnp.asarray(w_eff), jnp.asarray(b),
                stride=stride, padding=pad,
            )
        )
        theirs = (
            F.conv_transpose1d(
                torch.from_numpy(x.transpose(0, 2, 1)),
                torch.from_numpy(w),
                torch.from_numpy(b),
                stride=stride,
                padding=pad,
            )
            .numpy()
            .transpose(0, 2, 1)
        )
        assert ours.shape == theirs.shape
        assert ours.shape[1] == 37 * stride  # exact upsample-length contract
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


class TestConv2d:
    def test_matches_torch_mpd_config(self):
        # MPD conv: kernel (5, 1), stride (3, 1), padding (2, 0)
        # (reference: models/hifigan.py:484-493)
        x = _np(0, 2, 50, 11, 32)  # [B, H, W, C]
        w = _np(1, 128, 32, 5, 1)  # torch [out, in, kh, kw]
        b = _np(2, 128)
        ours = np.asarray(
            conv2d(
                jnp.asarray(x),
                jnp.asarray(w.transpose(2, 3, 1, 0)),  # -> [kh, kw, in, out]
                jnp.asarray(b),
                stride=(3, 1),
                padding=(2, 0),
            )
        )
        theirs = (
            F.conv2d(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(w),
                torch.from_numpy(b),
                stride=(3, 1),
                padding=(2, 0),
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


class TestAvgPool:
    @pytest.mark.parametrize("t", [100, 101, 22050])
    def test_matches_torch(self, t):
        x = _np(0, 2, t, 1)
        ours = np.asarray(avg_pool1d(jnp.asarray(x), 4, 2, 2))
        theirs = (
            F.avg_pool1d(torch.from_numpy(x.transpose(0, 2, 1)), 4, 2, 2)
            .numpy()
            .transpose(0, 2, 1)
        )
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


class TestWeightNorm:
    def test_matches_torch_weight_norm(self):
        w = _np(0, 64, 32, 5)  # torch conv layout [out, in, k]
        wt = torch.from_numpy(w)
        g_t = torch.linalg.vector_norm(wt, dim=(1, 2), keepdim=True)  # dim=0 norm
        v = w.transpose(2, 1, 0)  # our layout [k, in, out]
        g = np.asarray(g_t.squeeze().numpy())  # [out]
        ours = np.asarray(weight_norm_kernel(jnp.asarray(g), jnp.asarray(v)))
        # at init, w = g * v/||v|| == v
        np.testing.assert_allclose(ours, v, rtol=1e-5, atol=1e-5)
        # and scaling g by 2 doubles the kernel
        ours2 = np.asarray(weight_norm_kernel(jnp.asarray(2 * g), jnp.asarray(v)))
        np.testing.assert_allclose(ours2, 2 * v, rtol=1e-5, atol=1e-5)


class TestFoldedConv:
    @pytest.mark.parametrize(
        "c,k,d,fold,t",
        [
            (32, 3, 1, 4, 128),
            (32, 11, 5, 4, 256),   # MRF k=11 dil=5 at C=32
            (64, 7, 3, 2, 128),
            (32, 3, 5, 4, 64),
            (16, 11, 1, 8, 64),
        ],
    )
    def test_exactness_vs_conv1d(self, c, k, d, fold, t):
        from sambert_hifigan_tpu.ops.conv import folded_conv1d

        rng = np.random.default_rng(c + k)
        x = jnp.asarray(rng.standard_normal((2, t, c)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, c, c)), jnp.float32)
        b = jnp.asarray(rng.standard_normal(c), jnp.float32)
        p = get_padding(k, d)
        plain = np.asarray(conv1d(x, w, b, padding=p, dilation=d))
        folded = np.asarray(
            folded_conv1d(x, w, b, padding=p, dilation=d, fold=fold)
        )
        np.testing.assert_allclose(folded, plain, rtol=1e-4, atol=1e-4)

    def test_fold_one_is_identity_path(self):
        from sambert_hifigan_tpu.ops.conv import folded_conv1d

        x = jnp.ones((1, 16, 8))
        w = jnp.ones((3, 8, 8))
        np.testing.assert_allclose(
            np.asarray(folded_conv1d(x, w, padding=1, fold=1)),
            np.asarray(conv1d(x, w, padding=1)),
        )

    def test_indivisible_t_pads_and_trims(self):
        """T that is not a multiple of fold*stride is right-zero-padded and
        the output trimmed — exact, because no valid output tap reads past
        T + padding - 1 (the conv's own implicit zero pad)."""
        from sambert_hifigan_tpu.ops.conv import folded_conv1d

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 10, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 8, 8)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(folded_conv1d(x, w, padding=1, fold=4)),
            np.asarray(conv1d(x, w, padding=1)),
            rtol=1e-5, atol=1e-5,
        )

    @pytest.mark.parametrize(
        "cin,cout,k,s,g,fold,t",
        [
            # the MSD ladder shapes (incl. the odd pooled lengths)
            (128, 128, 41, 2, 4, 4, 512),
            (128, 256, 41, 2, 16, 8, 257),
            (256, 512, 41, 4, 16, 4, 129),
            (512, 1024, 41, 1, 16, 2, 128),
            # stride + dilation + groups together, odd T
            (6, 10, 5, 3, 2, 4, 101),
        ],
    )
    def test_exactness_grouped_strided(self, cin, cout, k, s, g, fold, t):
        """The generalized fold (stride/groups) is element-exact vs conv1d —
        the transform the MSD discriminator trains through."""
        from sambert_hifigan_tpu.ops.conv import folded_conv1d

        rng = np.random.default_rng(cin + cout + k)
        d = 2 if s == 3 else 1
        p = get_padding(k, d)
        x = jnp.asarray(rng.standard_normal((2, t, cin)), jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((k, cin // g, cout)) * 0.1, jnp.float32
        )
        b = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        plain = np.asarray(
            conv1d(x, w, b, stride=s, padding=p, dilation=d, groups=g)
        )
        folded = np.asarray(
            folded_conv1d(
                x, w, b, stride=s, padding=p, dilation=d, groups=g, fold=fold
            )
        )
        assert folded.shape == plain.shape
        np.testing.assert_allclose(folded, plain, rtol=1e-4, atol=1e-4)

    def test_grouped_strided_grads_match(self):
        """Autodiff through the folded formulation produces the same w/x
        gradients as the plain conv (the property the GAN train step needs)."""
        from sambert_hifigan_tpu.ops.conv import folded_conv1d

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, 64, 16)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((41, 4, 32)) * 0.1, jnp.float32)

        def loss_plain(w_, x_):
            return jnp.sum(jnp.square(conv1d(x_, w_, stride=2, padding=20, groups=4)))

        def loss_fold(w_, x_):
            return jnp.sum(jnp.square(folded_conv1d(
                x_, w_, stride=2, padding=20, groups=4, fold=4)))

        gw_p, gx_p = jax.grad(loss_plain, argnums=(0, 1))(w, x)
        gw_f, gx_f = jax.grad(loss_fold, argnums=(0, 1))(w, x)
        np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_p), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_p), rtol=2e-4, atol=2e-4)


class TestChainFoldedConv:
    """chain_folded_conv1d: the folded-in -> folded-out conv that keeps the
    whole MSD ladder in pseudo-channel layout (zero inter-layer relayouts)."""

    @pytest.mark.parametrize(
        "t,cin,cout,k,s,p,g,r_in,r_out,d",
        [
            # the full-size MSD ladder with its chained r schedule
            (512, 1, 128, 15, 1, 7, 1, 4, 4, 1),
            (512, 128, 128, 41, 2, 20, 4, 4, 4, 1),
            (256, 128, 256, 41, 2, 20, 16, 4, 8, 1),
            (128, 256, 512, 41, 4, 20, 16, 8, 4, 1),
            (100, 512, 1024, 41, 4, 20, 16, 4, 2, 1),
            (25, 1024, 1024, 41, 1, 20, 16, 2, 2, 1),
            (25, 1024, 1024, 5, 1, 2, 1, 2, 2, 1),
            (25, 1024, 1, 3, 1, 1, 1, 2, 8, 1),
            # odd pooled lengths (MSD 2x/4x scales give T/2 + 1)
            (257, 1, 128, 15, 1, 7, 1, 4, 4, 1),
            (129, 128, 128, 41, 2, 20, 4, 4, 4, 1),
            # dilation for generality
            (200, 64, 64, 3, 1, 2, 1, 4, 4, 2),
        ],
    )
    def test_exactness_vs_conv1d(self, t, cin, cout, k, s, p, g, r_in, r_out, d):
        from sambert_hifigan_tpu.ops.conv import (
            chain_folded_conv1d,
            conv_out_len,
            fold_time,
            unfold_time,
        )

        rng = np.random.default_rng(t + cin + cout)
        x = jnp.asarray(rng.standard_normal((2, t, cin)) * 0.3, jnp.float32)
        w = jnp.asarray(
            rng.standard_normal((k, cin // g, cout)) * 0.1, jnp.float32
        )
        b = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        ref = np.asarray(
            conv1d(x, w, b, stride=s, padding=p, dilation=d, groups=g)
        )
        y_f = chain_folded_conv1d(
            fold_time(x, r_in), w, b, t_in=t, r_in=r_in, r_out=r_out,
            stride=s, padding=p, dilation=d, groups=g,
        )
        got = np.asarray(unfold_time(y_f, r_out, conv_out_len(t, k, s, p, d)))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_tail_phases_masked_to_zero(self):
        """Dead phases of the tail block must be zero so downstream chained
        convs read exactly the implicit zero padding (bias would otherwise
        leak in)."""
        from sambert_hifigan_tpu.ops.conv import chain_folded_conv1d, fold_time

        rng = np.random.default_rng(1)
        t, cin, cout, r = 10, 4, 8, 4  # t_out = 10, nb_out = 3, rem = 2
        x = jnp.asarray(rng.standard_normal((1, t, cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, cin, cout)), jnp.float32)
        b = jnp.asarray(np.full(cout, 7.0), jnp.float32)  # loud bias
        y_f = chain_folded_conv1d(
            fold_time(x, r), w, b, t_in=t, r_in=r, r_out=r, padding=1
        )
        tail = np.asarray(y_f)[0, -1].reshape(cout, r)
        np.testing.assert_array_equal(tail[:, 2:], 0.0)
        assert np.all(np.abs(tail[:, :2]) > 0)

    def test_chained_two_layers_match_sequential(self):
        """Layer 2 consumes layer 1's folded output directly — the property
        that removes all inter-conv transposes from the MSD ladder."""
        from sambert_hifigan_tpu.ops.conv import (
            chain_folded_conv1d,
            conv_out_len,
            fold_time,
            unfold_time,
        )

        rng = np.random.default_rng(2)
        t = 101
        x = jnp.asarray(rng.standard_normal((2, t, 8)) * 0.3, jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((41, 2, 16)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((41, 4, 32)) * 0.1, jnp.float32)
        ref1 = conv1d(x, w1, stride=2, padding=20, groups=4)
        t1 = conv_out_len(t, 41, 2, 20)
        ref2 = np.asarray(conv1d(ref1, w2, stride=2, padding=20, groups=4))
        t2 = conv_out_len(t1, 41, 2, 20)
        h = chain_folded_conv1d(
            fold_time(x, 4), w1, t_in=t, r_in=4, r_out=4,
            stride=2, padding=20, groups=4,
        )
        h = chain_folded_conv1d(
            h, w2, t_in=t1, r_in=4, r_out=8, stride=2, padding=20, groups=4
        )
        got = np.asarray(unfold_time(h, 8, t2))
        np.testing.assert_allclose(got, ref2, rtol=1e-4, atol=1e-5)

    def test_grads_match_plain_conv(self):
        from sambert_hifigan_tpu.ops.conv import chain_folded_conv1d, fold_time

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, 64, 16)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((41, 4, 32)) * 0.1, jnp.float32)

        def loss_plain(w_, x_):
            return jnp.sum(jnp.square(conv1d(x_, w_, stride=2, padding=20, groups=4)))

        def loss_chain(w_, x_):
            return jnp.sum(jnp.square(chain_folded_conv1d(
                fold_time(x_, 4), w_, t_in=64, r_in=4, r_out=4,
                stride=2, padding=20, groups=4,
            )))

        gw_p, gx_p = jax.grad(loss_plain, argnums=(0, 1))(w, x)
        gw_c, gx_c = jax.grad(loss_chain, argnums=(0, 1))(w, x)
        np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_p), rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_p), rtol=2e-4, atol=2e-4)

    def test_fold_unfold_roundtrip(self):
        from sambert_hifigan_tpu.ops.conv import fold_time, unfold_time

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((3, 13, 5)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(unfold_time(fold_time(x, 4), 4, 13)), np.asarray(x)
        )

    def test_rejects_bad_ratio(self):
        from sambert_hifigan_tpu.ops.conv import chain_folded_conv1d, fold_time

        x = fold_time(jnp.ones((1, 32, 4)), 8)
        w = jnp.ones((3, 4, 4))
        with pytest.raises(ValueError):
            chain_folded_conv1d(x, w, t_in=32, r_in=8, r_out=2, stride=2, padding=1)


class TestFoldedConvTranspose:
    @pytest.mark.parametrize(
        "cin,cout,k,u",
        [(512, 256, 16, 8), (256, 128, 16, 8), (128, 64, 4, 2), (64, 32, 4, 2)],
    )
    def test_exactness_vs_conv_transpose(self, cin, cout, k, u):
        from sambert_hifigan_tpu.ops.conv import (
            conv_transpose1d,
            folded_conv_transpose1d,
        )

        p = (k - u) // 2
        rng = np.random.default_rng(cin + k)
        x = jnp.asarray(rng.standard_normal((2, 19, cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, cin, cout)), jnp.float32)
        b = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        a = np.asarray(conv_transpose1d(x, w, b, stride=u, padding=p))
        f = np.asarray(folded_conv_transpose1d(x, w, b, stride=u, padding=p))
        assert f.shape == (2, 19 * u, cout)
        np.testing.assert_allclose(f, a, rtol=1e-4, atol=1e-4)

    def test_length_contract_violation_raises(self):
        from sambert_hifigan_tpu.ops.conv import folded_conv_transpose1d

        with pytest.raises(ValueError):
            folded_conv_transpose1d(
                jnp.ones((1, 10, 8)), jnp.ones((5, 8, 8)), stride=2, padding=0
            )


class TestMisc:
    def test_leaky_relu_matches_torch(self):
        x = _np(0, 128)
        np.testing.assert_allclose(
            np.asarray(leaky_relu(jnp.asarray(x), 0.1)),
            F.leaky_relu(torch.from_numpy(x), 0.1).numpy(),
            atol=1e-7,
        )

    def test_reflect_pad_matches_torch(self):
        x = _np(0, 2, 10, 1)
        ours = np.asarray(reflect_pad_time(jnp.asarray(x), 3, axis=1))
        theirs = (
            F.pad(torch.from_numpy(x.transpose(0, 2, 1)), (0, 3), mode="reflect")
            .numpy()
            .transpose(0, 2, 1)
        )
        np.testing.assert_allclose(ours, theirs)

    def test_get_padding(self):
        assert get_padding(3, 1) == 1
        assert get_padding(3, 5) == 5
        assert get_padding(11, 5) == 25
        assert get_padding(7, 1) == 3

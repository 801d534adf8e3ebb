"""HiFi-GAN vocoder, TPU-native.

Re-implements the reference's generator + discriminators
(reference: models/hifigan.py) with the same observable behavior:

  Generator: conv_pre(80->512, k7) -> 4x [LeakyReLU(0.1) -> ConvTranspose1d
  (strides 8,8,2,2; kernels 16,16,4,4; channels 512->256->128->64->32) -> MRF]
  -> LeakyReLU -> conv_post(->1, k7) -> tanh.  MRF averages 3 parallel
  ResBlocks (k = 3,7,11; dilations (1,3,5), each dilated conv followed by a
  dilation-1 conv, residual after each pair).  Exact length contract:
  T_wav = Tfrm * prod(upsample_rates) = Tfrm * hop_length
  (reference: tests/test_hifigan_generator.py:40-99, 129-143).

  Quirks preserved on purpose (SURVEY.md section 7.3.7): the generator does
  NOT use weight norm at construction (reference: models/hifigan.py:177-222),
  while both discriminators do (307-321, 481-493); the MSD 4x scale applies
  the same AvgPool1d(4,2,2) twice (427-434); MRF outputs are averaged over
  blocks, not summed (124-131).

TPU design: everything is channel-last [B, T, C]; the ConvTranspose is an
lhs-dilated conv that XLA maps onto the MXU; the full generator is one fused
jitted program with static shapes (no Python loops over time).
"""

from __future__ import annotations

import math
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import GeneratorConfig, VocoderConfig
from ..ops.conv import (
    avg_pool1d,
    conv_out_len,
    fold_time,
    get_padding,
    leaky_relu,
    reflect_pad_time,
    unfold_time,
)
from .layers import Conv1d, Conv2d, ConvTranspose1d

LRELU_SLOPE = 0.1


def _auto_fold(channels: int) -> int:
    """Channel-fold factor filling the MXU's 128 lanes for small-C stages
    (exact call-time transform, ops/conv.py:folded_conv1d; measured ~1.5x on
    the C<=64 MRF stages on v5e)."""
    return max(1, min(4, 128 // channels))


class ResBlock(nn.Module):
    """Dilated residual stack (reference: models/hifigan.py:26-86).

    For each dilation d in `dilation`:
      x = x + conv2_{dil=1}(lrelu(conv1_{dil=d}(lrelu(x))))
    """

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fold = _auto_fold(self.channels)
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(
                self.channels,
                self.channels,
                self.kernel_size,
                dilation=d,
                padding=get_padding(self.kernel_size, d),
                fold=fold,
                dtype=self.dtype,
                name=f"conv1_{i}",
            )(xt)
            xt = leaky_relu(xt, LRELU_SLOPE)
            xt = Conv1d(
                self.channels,
                self.channels,
                self.kernel_size,
                dilation=1,
                padding=get_padding(self.kernel_size, 1),
                fold=fold,
                dtype=self.dtype,
                name=f"conv2_{i}",
            )(xt)
            x = x + xt
        return x


class MRF(nn.Module):
    """Multi-receptive-field block: parallel ResBlocks, AVERAGED
    (reference: models/hifigan.py:89-131)."""

    channels: int
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = None
        for i, (k, dil) in enumerate(
            zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
        ):
            y = ResBlock(
                self.channels, k, tuple(dil), dtype=self.dtype, name=f"resblock_{i}"
            )(x)
            out = y if out is None else out + y
        return out / len(self.resblock_kernel_sizes)


class HiFiGANGenerator(nn.Module):
    """mel [B, n_mels, Tfrm] -> wav [B, 1, Tfrm * hop]
    (reference: models/hifigan.py:134-261).

    External layout matches the reference ([B, C, T]); internally channel-last.
    """

    config: GeneratorConfig = GeneratorConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = jnp.swapaxes(mel, 1, 2)  # [B, T, n_mels]
        x = Conv1d(
            cfg.n_mels,
            cfg.upsample_initial_channel,
            7,
            padding=3,
            dtype=self.dtype,
            name="conv_pre",
        )(x)
        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            cin = cfg.upsample_initial_channel // (2**i)
            cout = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(
                cin,
                cout,
                k,
                stride=u,
                padding=(k - u) // 2,
                dtype=self.dtype,
                name=f"up_{i}",
            )(x)
            x = MRF(
                cout,
                cfg.resblock_kernel_sizes,
                cfg.resblock_dilation_sizes,
                dtype=self.dtype,
                name=f"mrf_{i}",
            )(x)
        x = leaky_relu(x, LRELU_SLOPE)
        final_channels = cfg.upsample_initial_channel // (
            2 ** len(cfg.upsample_rates)
        )
        x = Conv1d(
            final_channels, 1, 7, padding=3, dtype=self.dtype, name="conv_post"
        )(x)
        wav = jnp.tanh(x.astype(jnp.float32))
        return jnp.swapaxes(wav, 1, 2)  # [B, 1, T_wav]


# MSD ladder conv specs: (cin, cout, kernel, stride, groups, pad)
# (reference: models/hifigan.py:307-321); conv_post appended by _msd_ladder.
_MSD_SPECS = (
    (1, 128, 15, 1, 1, 7),
    (128, 128, 41, 2, 4, 20),
    (128, 256, 41, 2, 16, 20),
    (256, 512, 41, 4, 16, 20),
    (512, 1024, 41, 4, 16, 20),
    (1024, 1024, 41, 1, 16, 20),
    (1024, 1024, 5, 1, 1, 2),
)


def _msd_ladder(channel_div: int) -> List[Tuple[int, int, int, int, int, int]]:
    """The 8 conv specs (7 ladder + conv_post) at a given channel divisor."""
    scale = lambda c: c if c == 1 else max(1, c // channel_div)  # noqa: E731
    out = []
    for cin, cout, k, s, g, p in _MSD_SPECS:
        cin, cout = scale(cin), scale(cout)
        g = math.gcd(g, math.gcd(cin, cout))
        out.append((cin, cout, k, s, g, p))
    out.append((scale(1024), 1, 3, 1, 1, 1))
    return out


def _pow2_floor(x: int) -> int:
    p = 1
    while p * 2 <= x:
        p *= 2
    return p


def _chain_schedule(
    specs, fold_max: int, r_wave: int = 4
) -> List[Tuple[int, int]]:
    """Per-conv (r_in, r_out) fold factors for the chained folded ladder.

    r_out targets min(fold_max, 128 // Cg_out) output phases (fill the MXU's
    128 lanes per group) and is forced up to ceil(r_in / stride) so that the
    chain constraint r_out*stride % r_in == 0 holds; all values are powers of
    two (strides in the ladder are 1/2/4), so the constraint reduces to a
    max().
    """
    r = r_wave
    sched = []
    for cin, cout, k, s, g, p in specs:
        cg_out = max(1, cout // g)
        want = _pow2_floor(max(1, min(fold_max, 128 // cg_out)))
        need = max(1, -(-r // s))
        sched.append((r, max(want, _pow2_floor(2 * need - 1))))
        r = sched[-1][1]
    return sched


def msd_fmap_true_counts(
    t_wav: int, batch: int, channel_div: int = 1, fold_max: int = 8,
    n_scales: int = 3,
) -> List[List[int]]:
    """TRUE element counts of every MSD feature map in 'compute' fmap layout.

    Chained-folded fmaps carry zero tail padding in BOTH real and fake maps,
    so the exact FM term is sum(|f - r|) / true_count — these are the
    true_counts (batch * C * t_true per layer; None where the map is exact
    and a plain mean is already correct).  Used by the jitted GAN step
    (training/vocoder_trainer.py) with losses/vocoder.feature_matching_loss.
    """
    specs = _msd_ladder(channel_div)
    counts: List[List[int]] = []
    t_scale = t_wav
    for s_i in range(n_scales):
        if s_i > 0:
            t_scale = avg_pool_out_len(t_scale)
        per: List[int] = []
        t = t_scale
        for li, (cin, cout, k, s, g, p) in enumerate(specs[:-1]):
            t = conv_out_len(t, k, s, p)
            # only the chained layers (conv_0..conv_5) are folded/padded;
            # the dense tail (conv_6) and the logits are exact in compute
            # layout, so a plain mean is already correct there
            folded = fold_max > 1 and li < 6
            per.append(batch * cout * t if folded else None)
        per.append(None)  # conv_post fmap (logits) is exact
        counts.append(per)
    return counts


def avg_pool_out_len(t: int) -> int:
    """Output length of the MSD pooling ladder's AvgPool1d(4, 2, 2)."""
    return (t + 2 * 2 - 4) // 2 + 1


class ScaleDiscriminator(nn.Module):
    """Single-scale waveform critic (reference: models/hifigan.py:286-353).

    Returns (logits [B, 1, T'], 8 feature maps) — 7 conv features + conv_post.
    With fmap_layout="torch" (default) feature maps are channel-FIRST
    ([B, C, T]), matching the reference arity/shape contracts in the loss
    tests.  fmap_layout="compute" returns them in the internal chained-folded
    layout ([B, ceil(T/r), C*r] pseudo-channels, zero tail padding) — a fixed
    permutation + zero-pad of the same elements, which elementwise losses
    consume exactly via msd_fmap_true_counts, skipping every unfold transpose
    inside the jitted GAN step.
    """

    use_spectral_norm: bool = False
    channel_div: int = 1
    # Cap on the chained ladder's per-conv fold factors
    # (ops/conv.py:chain_folded_conv1d): the grouped k=41 convs expose only
    # C_out/groups = 16..64 MXU lanes per group and dominate the GAN train
    # step; packing min(fold_max, 128 // Cg_out) output phases into the
    # channel axis fills the lanes at 1.0-2.3x the FLOPs — element-exact,
    # parameters unchanged — and the chained layout removes all inter-conv
    # relayouts.  0/1 disables (plain reference-shaped convs).
    fold_max: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, fmap_layout: str = "torch"
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        specs = _msd_ladder(self.channel_div)
        *ladder, post = specs
        fmaps: List[jnp.ndarray] = []
        if self.fold_max > 1:
            # Chained folded ladder over conv_0..conv_5: fold the waveform
            # once (free reshape at C=1), keep every grouped-k41 activation
            # in pseudo-channel layout, unfold ONCE before the dense tail.
            # conv_6/conv_post stay plain: their chained kernels would be
            # dense [k_f, 2048, 2048] tensors REBUILT in-graph every step
            # with 2-wide-minor-dim transposes — profiled at ~100 ms/step of
            # pure kernel construction, dwarfing the one unfold they avoid.
            # The grouped convs' per-group kernels are small (Cg <= 64), so
            # their construction is noise.  All wave-layout moves are
            # reshapes, never size-1 transposes — a [B, T, 1] swapaxes form
            # trips a TPU fusion cost-model CHECK (jellyfish TransformWindow).
            chained_n = 6  # conv_0 .. conv_5 (the small/grouped kernels)
            sched = _chain_schedule(ladder[:chained_n], self.fold_max)
            b, _, t = x.shape
            h = fold_time(x.reshape(b, t, 1), sched[0][0])
            # Keep the wave reshape out of the first conv's fusion: the TPU
            # fusion cost model CHECK-fails window-transforming a fused
            # [B, T, 1] producer (jellyfish fusion_util TransformWindow).
            h = jax.lax.optimization_barrier(h)
            for i, ((cin, cout, k, s, g, p), (r_in, r_out)) in enumerate(
                zip(ladder[:chained_n], sched)
            ):
                h = Conv1d(
                    cin, cout, k, stride=s, groups=g, padding=p,
                    weight_norm=not self.use_spectral_norm,
                    spectral_norm=self.use_spectral_norm,
                    chain=(r_in, r_out), dtype=self.dtype, name=f"conv_{i}",
                )(h, chain_t_in=t)
                t = conv_out_len(t, k, s, p)
                h = leaky_relu(h, LRELU_SLOPE)
                if fmap_layout == "torch":
                    fmaps.append(jnp.swapaxes(unfold_time(h, r_out, t), 1, 2))
                else:
                    fmaps.append(h)
            h = unfold_time(h, sched[-1][1], t)  # the ladder's ONE relayout
            for i in range(chained_n, len(ladder)):
                cin, cout, k, s, g, p = ladder[i]
                h = Conv1d(
                    cin, cout, k, stride=s, groups=g, padding=p,
                    weight_norm=not self.use_spectral_norm,
                    spectral_norm=self.use_spectral_norm,
                    dtype=self.dtype, name=f"conv_{i}",
                )(h)
                t = conv_out_len(t, k, s, p)
                h = leaky_relu(h, LRELU_SLOPE)
                fmaps.append(jnp.swapaxes(h, 1, 2) if fmap_layout == "torch" else h)
            cin, cout, k, s, g, p = post
            h = Conv1d(
                cin, cout, k, padding=p,
                weight_norm=not self.use_spectral_norm,
                spectral_norm=self.use_spectral_norm,
                dtype=self.dtype, name="conv_post",
            )(h)
            t = conv_out_len(t, k, s, p)
            out = h.reshape(b, 1, t)  # [B, t, 1] -> [B, 1, t], pure reshape
            fmaps.append(out)
            return out, fmaps
        # Plain path (reference-shaped convs, fold disabled)
        b, _, t = x.shape
        h = x.reshape(b, t, 1)
        for i, (cin, cout, k, s, g, p) in enumerate(ladder):
            h = Conv1d(
                cin, cout, k, stride=s, groups=g, padding=p,
                weight_norm=not self.use_spectral_norm,
                spectral_norm=self.use_spectral_norm,
                dtype=self.dtype, name=f"conv_{i}",
            )(h)
            h = leaky_relu(h, LRELU_SLOPE)
            fmaps.append(jnp.swapaxes(h, 1, 2) if fmap_layout == "torch" else h)
        cin, cout, k, s, g, p = post
        h = Conv1d(
            cin, cout, k, padding=p,
            weight_norm=not self.use_spectral_norm,
                spectral_norm=self.use_spectral_norm,
            dtype=self.dtype, name="conv_post",
        )(h)
        out = jnp.swapaxes(h, 1, 2)
        fmaps.append(out)
        return out, fmaps


class MultiScaleDiscriminator(nn.Module):
    """MSD: 3 critics at 1x / 2x / 4x (reference: models/hifigan.py:356-447).

    The 4x branch applies AvgPool1d(4, 2, 2) twice, exactly as the reference
    does (models/hifigan.py:427-434).
    """

    use_spectral_norm: bool = False
    channel_div: int = 1
    n_scales: int = 3  # config msd_scales; 3 = the reference's 1x/2x/4x
    fold_max: int = 8  # see ScaleDiscriminator.fold_max
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, fmap_layout: str = "torch"
    ) -> Tuple[List[jnp.ndarray], List[List[jnp.ndarray]]]:
        outputs, fmaps_list = [], []
        bsz = x.shape[0]
        # [B, 1, T] <-> [B, T, 1] via reshape, never a size-1 transpose
        # (the transpose form trips a TPU fusion cost-model CHECK).
        xt = x.reshape(bsz, x.shape[2], 1)
        scales = [xt]
        for _ in range(self.n_scales - 1):
            scales.append(avg_pool1d(scales[-1], 4, 2, 2))
        for i, xs in enumerate(scales):
            out, fmaps = ScaleDiscriminator(
                self.use_spectral_norm, channel_div=self.channel_div,
                fold_max=self.fold_max, dtype=self.dtype, name=f"disc_{i}"
            )(xs.reshape(bsz, 1, xs.shape[1]), fmap_layout)
            outputs.append(out)
            fmaps_list.append(fmaps)
        return outputs, fmaps_list


class PeriodDiscriminator(nn.Module):
    """Period-p critic: reflect-pad T to a multiple of p, reshape to
    [B, 1, T/p, p], 5 Conv2d (k=(5,1), stride=(3,1)) + conv_post
    (reference: models/hifigan.py:450-542).  Channel ladder
    [32, 128, 512, 1024, 1024, 1] is asserted by reference
    tests/test_multi_period_discriminator.py:195-202."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    use_spectral_norm: bool = False
    channel_div: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, fmap_layout: str = "torch"
    ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        # fmap_layout="compute" keeps feature maps channel-LAST ([B, H, W, C],
        # the conv layout) — a pure transpose of the torch-layout maps, which
        # the elementwise FM/LSGAN means are invariant to; skipping the
        # 6-per-critic relayouts matters inside the jitted GAN step.
        torch_maps = fmap_layout == "torch"
        b, c, t = x.shape
        if t % self.period != 0:
            pad = self.period - (t % self.period)
            x = reflect_pad_time(x, pad, axis=2)
            t = t + pad
        # [B, 1, T] -> [B, T/p, p, 1] (channel-last 2D)
        h = x.reshape(b, c, t // self.period, self.period)
        h = h.transpose(0, 2, 3, 1)
        div = self.channel_div
        scale = lambda ch: ch if ch == 1 else max(1, ch // div)  # noqa: E731
        channels = [(1, 32), (32, 128), (128, 512), (512, 1024)]
        fmaps: List[jnp.ndarray] = []
        for i, (cin, cout) in enumerate(channels):
            h = Conv2d(
                scale(cin), scale(cout), (self.kernel_size, 1),
                stride=(self.stride, 1),
                padding=(get_padding(self.kernel_size, 1), 0),
                weight_norm=not self.use_spectral_norm,
                spectral_norm=self.use_spectral_norm,
                dtype=self.dtype, name=f"conv_{i}",
            )(h)
            h = leaky_relu(h, LRELU_SLOPE)
            fmaps.append(h.transpose(0, 3, 1, 2) if torch_maps else h)
        h = Conv2d(
            scale(1024), scale(1024), (self.kernel_size, 1), stride=(1, 1),
            padding=(2, 0),
            weight_norm=not self.use_spectral_norm,
                spectral_norm=self.use_spectral_norm, dtype=self.dtype, name="conv_4",
        )(h)
        h = leaky_relu(h, LRELU_SLOPE)
        fmaps.append(h.transpose(0, 3, 1, 2) if torch_maps else h)
        h = Conv2d(
            scale(1024), 1, (3, 1), stride=(1, 1), padding=(1, 0),
            weight_norm=not self.use_spectral_norm,
                spectral_norm=self.use_spectral_norm, dtype=self.dtype, name="conv_post",
        )(h)
        out = h.transpose(0, 3, 1, 2)  # [B, 1, H, W] (tiny; exact both modes)
        fmaps.append(out)
        return out, fmaps


class MultiPeriodDiscriminator(nn.Module):
    """MPD over periods (2, 3, 5, 7, 11) (reference: models/hifigan.py:545-615)."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    use_spectral_norm: bool = False
    channel_div: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, fmap_layout: str = "torch"
    ) -> Tuple[List[jnp.ndarray], List[List[jnp.ndarray]]]:
        outputs, fmaps_list = [], []
        for p in self.periods:
            out, fmaps = PeriodDiscriminator(
                p, use_spectral_norm=self.use_spectral_norm,
                channel_div=self.channel_div,
                dtype=self.dtype, name=f"disc_p{p}",
            )(x, fmap_layout)
            outputs.append(out)
            fmaps_list.append(fmaps)
        return outputs, fmaps_list


class HiFiGAN(nn.Module):
    """Facade owning generator + MSD + MPD (reference: models/hifigan.py:618-800).

    `__call__(mel)` generates; `discriminate(wav_real, wav_fake)` returns the
    reference's 8-tuple (msd_real_out, msd_real_feat, msd_fake_out,
    msd_fake_feat, mpd_real_out, mpd_real_feat, mpd_fake_out, mpd_fake_feat).
    """

    config: VocoderConfig = VocoderConfig()
    dtype: jnp.dtype = jnp.float32

    def get_config(self) -> dict:
        """Introspection parity (reference: models/hifigan.py get_config)."""
        import dataclasses

        return dataclasses.asdict(self.config)

    def setup(self):
        self.generator = HiFiGANGenerator(self.config.generator, dtype=self.dtype)
        self.msd = MultiScaleDiscriminator(
            self.config.discriminator.msd_use_spectral_norm,
            channel_div=self.config.discriminator.channel_div,
            n_scales=self.config.discriminator.msd_scales,
            fold_max=self.config.discriminator.msd_fold_max,
            dtype=self.dtype,
        )
        self.mpd = MultiPeriodDiscriminator(
            tuple(self.config.discriminator.mpd_periods),
            self.config.discriminator.mpd_use_spectral_norm,
            channel_div=self.config.discriminator.channel_div,
            dtype=self.dtype,
        )

    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        return self.generator(mel)

    def generate(self, mel: jnp.ndarray) -> jnp.ndarray:
        return self.generator(mel)

    def init_all(self, mel: jnp.ndarray) -> jnp.ndarray:
        """Touch every submodule so `model.init(key, mel, method='init_all')`
        creates generator AND discriminator params in one pass."""
        wav = self.generator(mel)
        self.discriminate(wav, wav)
        return wav

    def discriminate(
        self,
        wav_real: jnp.ndarray,
        wav_fake: jnp.ndarray,
        fmap_layout: str = "torch",
    ):
        """fmap_layout="compute" returns feature maps in the discriminators'
        internal layouts (chained-folded for MSD, channel-last for MPD) —
        exact permutations/zero-pads of the torch-layout maps, consumed by the
        jitted GAN step together with msd_fmap_true_counts so no unfold
        transposes run in training.  Logits are layout-exact in both modes."""
        msd_real_out, msd_real_feat = self.msd(wav_real, fmap_layout)
        msd_fake_out, msd_fake_feat = self.msd(wav_fake, fmap_layout)
        mpd_real_out, mpd_real_feat = self.mpd(wav_real, fmap_layout)
        mpd_fake_out, mpd_fake_feat = self.mpd(wav_fake, fmap_layout)
        return (
            msd_real_out, msd_real_feat,
            msd_fake_out, msd_fake_feat,
            mpd_real_out, mpd_real_feat,
            mpd_fake_out, mpd_fake_feat,
        )

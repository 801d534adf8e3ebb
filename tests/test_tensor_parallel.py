"""Tensor-parallel numerical equivalence.

The shape-rule TP path (parallel/sharding_rules.py) shards every rank>=2
parameter whose output dim divides the 'model' axis; XLA inserts the matching
collectives during partitioning.  Partitioning must not change the math: a
train step on a data=4 x model=2 mesh has to reproduce the single-device
step's metrics AND updated parameters on the same global batch (up to fp
reassociation).  This mirrors the DP equivalence test in test_training.py
for the 'model' axis (the reference has no distributed code at all —
first-class absence, SURVEY.md section 2.4 row I-1).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sambert_hifigan_tpu.config import (
    AcousticModelConfig,
    DecoderConfig,
    DiscriminatorConfig,
    EncoderConfig,
    GeneratorConfig,
    TTSConfig,
    VocoderConfig,
)
from sambert_hifigan_tpu.models.acoustic_model import SAMBERTAcousticModel
from sambert_hifigan_tpu.models.hifigan import HiFiGAN
from sambert_hifigan_tpu.parallel.mesh import create_mesh, shard_batch
from sambert_hifigan_tpu.parallel.sharding_rules import (
    shard_tree,
    tp_sharding_for_leaf,
)
from sambert_hifigan_tpu.training.acoustic_trainer import (
    init_acoustic_state,
    make_jitted_acoustic_step,
)
from sambert_hifigan_tpu.training.vocoder_trainer import (
    init_vocoder_state,
    make_jitted_vocoder_step,
)

TINY_ACOUSTIC = AcousticModelConfig(
    d_model=32,
    encoder=EncoderConfig(n_layers=1, n_heads=4, d_ff=64),
    decoder=DecoderConfig(n_layers=1, n_heads=4, d_ff=64, max_len=128),
)
TINY_VOC = VocoderConfig(
    generator=GeneratorConfig(
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    ),
    # 2 MPD periods + 2 MSD scales: the equivalence under test is an
    # aggregate-metric property of the partitioned/bf16 GAN step, not of
    # the 8-way fan-out (test_training.py keeps the full 8-tuple contract);
    # halving the stack halves the XLA:CPU compile that dominates this file.
    discriminator=DiscriminatorConfig(
        mpd_periods=(2, 3), msd_scales=2, channel_div=16
    ),
)


def _cfg():
    # f32 train steps: these tests assert partitioning does not change the
    # MATH, so the bf16 default's cross-shard reassociation noise is excluded
    # (mixed precision has its own coverage in test_mixed_precision.py).
    base = TTSConfig()
    training = dataclasses.replace(
        base.training,
        acoustic=dataclasses.replace(base.training.acoustic, mixed_precision=False),
        vocoder=dataclasses.replace(base.training.vocoder, mixed_precision=False),
    )
    return dataclasses.replace(
        base, acoustic_model=TINY_ACOUSTIC, vocoder=TINY_VOC, training=training
    )


def _acoustic_batch(b=4, tph=6, maxf=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "ph_ids": jnp.asarray(rng.integers(4, 300, (b, tph)), jnp.int32),
        "tone_ids": jnp.asarray(rng.integers(0, 10, (b, tph)), jnp.int32),
        "boundary_ids": jnp.asarray(rng.integers(0, 5, (b, tph)), jnp.int32),
        "dur_gt": jnp.asarray(rng.integers(1, 3, (b, tph)), jnp.int32),
        "mel_gt": jnp.asarray(rng.standard_normal((b, maxf, 80)), jnp.float32),
        "pitch_gt": jnp.asarray(rng.uniform(80, 600, (b, maxf)), jnp.float32),
        "energy_gt": jnp.asarray(rng.uniform(0, 1, (b, maxf)), jnp.float32),
        "phoneme_mask": jnp.ones((b, tph), bool),
        "pitch_mask": jnp.asarray(rng.random((b, maxf)) > 0.3),
    }


def test_shape_rule_actually_shards():
    """The tiny config's matrices (out dims 32/64/...) must trigger the rule,
    otherwise the equivalence tests below would only test replication."""
    mesh = create_mesh(data=4, model=2)
    cfg = _cfg()
    model = SAMBERTAcousticModel(cfg.acoustic_model)
    state = init_acoustic_state(model, cfg, jax.random.PRNGKey(0), tph=6, max_frames=16)
    leaves = jax.tree.leaves(state.params)
    sharded = [
        x for x in leaves
        if tp_sharding_for_leaf(x, mesh).spec != jax.sharding.PartitionSpec()
    ]
    assert len(sharded) > 10, "shape rule sharded almost nothing"


def test_acoustic_tp_matches_single_device():
    """TP step reproduces single-device metrics for TWO consecutive steps
    (step-2 metrics are computed from the step-1-updated params, so they
    verify the update itself without leaf-wise Adam sign-flip fragility —
    see the vocoder test's docstring)."""
    cfg = _cfg()
    model = SAMBERTAcousticModel(cfg.acoustic_model)
    batch = _acoustic_batch()
    batch2 = _acoustic_batch(seed=9)
    rngk = jax.random.PRNGKey(5)
    rngk2 = jax.random.PRNGKey(6)

    state = init_acoustic_state(model, cfg, jax.random.PRNGKey(0), tph=6, max_frames=16)
    snap = jax.device_get(state)

    step1 = make_jitted_acoustic_step(model, cfg)
    s1, m1 = step1(state, batch, rngk)
    _, m1b = step1(s1, batch2, rngk2)

    mesh = create_mesh(data=4, model=2)
    state_tp = shard_tree(jax.tree.map(jnp.asarray, snap), mesh)
    # same init (sharding is layout, not values)
    for a, b in zip(jax.tree.leaves(snap.params), jax.tree.leaves(state_tp.params)):
        np.testing.assert_array_equal(a, np.asarray(b))

    step_tp = make_jitted_acoustic_step(model, cfg)  # shardings inferred
    s2, m2 = step_tp(state_tp, shard_batch(batch, mesh), rngk)
    _, m2b = step_tp(s2, shard_batch(batch2, mesh), rngk2)

    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=2e-3
    )
    np.testing.assert_allclose(
        float(m1b["total_loss"]), float(m2b["total_loss"]), rtol=1e-3
    )
    np.testing.assert_allclose(
        float(m1b["grad_norm"]), float(m2b["grad_norm"]), rtol=5e-3
    )


def test_vocoder_tp_matches_single_device():
    """TP GAN step reproduces the single-device metrics for TWO consecutive
    steps.  In the DEFAULT suite (not slow): this is the regression gate for
    the r02 model-parallel vocoder deadlock.  (Updated params are NOT compared leaf-wise: Adam's step-1 update
    is lr * g / (|g| + eps), so a near-zero gradient's fp-reassociation noise
    flips the update's sign — step-2 metrics computed FROM the updated params
    are the robust equivalence signal.)"""
    cfg = dataclasses.replace(_cfg(), vocoder=dataclasses.replace(TINY_VOC, loss_mode="adv_mel_fm"))
    model = HiFiGAN(cfg.vocoder)
    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.standard_normal((4, 80, 8)), jnp.float32)
    wav = jnp.asarray(rng.standard_normal((4, 1, 8 * 256)) * 0.1, jnp.float32)
    mel2 = jnp.asarray(rng.standard_normal((4, 80, 8)), jnp.float32)
    wav2 = jnp.asarray(rng.standard_normal((4, 1, 8 * 256)) * 0.1, jnp.float32)

    state = init_vocoder_state(model, cfg, jax.random.PRNGKey(0), mel_frames=8)
    snap = jax.device_get(state)
    step1 = make_jitted_vocoder_step(model, cfg)
    s1, m1 = step1(state, mel, wav)
    _, m1b = step1(s1, mel2, wav2)

    mesh = create_mesh(data=4, model=2)
    state_tp = shard_tree(jax.tree.map(jnp.asarray, snap), mesh)
    step_tp = make_jitted_vocoder_step(model, cfg)
    s2, m2 = step_tp(state_tp, *shard_batch((mel, wav), mesh))
    _, m2b = step_tp(s2, *shard_batch((mel2, wav2), mesh))

    for k in ("gen_loss", "disc_loss", "gen_mel_loss", "gen_fm_loss"):
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=3e-4, err_msg=k
        )
        np.testing.assert_allclose(
            float(m1b[k]), float(m2b[k]), rtol=2e-3, err_msg=f"step2:{k}"
        )


def _collective_counts(compiled_text):
    import re

    kinds = ("all-reduce", "all-gather", "all-to-all",
             "collective-permute", "reduce-scatter")
    return {
        k: len(re.findall(rf"%{k}(?:-start)?[.\d]*? = ", compiled_text))
        or len(re.findall(rf"\b{k}(?:-start)?\(", compiled_text))
        for k in kinds
    }


def test_collective_inventory_of_partitioned_gan_step():
    """Audit the collectives XLA's partitioner emits for the GAN train step
    (VERDICT r03 item 9; expected set documented in docs/architecture.md):

    * dp-only (data=8): gradient all-reduces over the data axis; NO
      all-to-all and no collective-permute.  (The XLA:CPU partitioner also
      emits batch-axis all-gathers around the discriminators' leaky-relu
      backward fusions — present identically with the plain fold_max=0
      ladder, i.e. a lowering artifact of this emulation backend, not of the
      chained-folded layout; see docs/architecture.md.)
    * dp x tp (data=4, model=2): adds weight all-gathers (shape-rule TP
      stores parameters sharded; the partitioner gathers each weight at its
      use site — ZeRO-3-like storage sharding) and a small bounded set of
      all-to-alls from regrouping grouped-conv gradients on the model axis.
      The r02 CPU-emulation deadlock lived in exactly these all-to-alls;
      this pins their population so growth is a visible diff, not a surprise.
    """
    cfg = dataclasses.replace(
        _cfg(), vocoder=dataclasses.replace(TINY_VOC, loss_mode="adv_mel_fm")
    )
    model = HiFiGAN(cfg.vocoder)
    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.standard_normal((4, 80, 8)), jnp.float32)
    wav = jnp.asarray(rng.standard_normal((4, 1, 8 * 256)) * 0.1, jnp.float32)
    state = init_vocoder_state(model, cfg, jax.random.PRNGKey(0), mel_frames=8)
    snap = jax.device_get(state)

    # dp-only: all 8 devices on 'data'
    mesh_dp = create_mesh(data=8, model=1)
    state_dp = shard_tree(jax.tree.map(jnp.asarray, snap), mesh_dp)
    step_dp = make_jitted_vocoder_step(model, cfg)
    mel8 = jnp.concatenate([mel, mel])
    wav8 = jnp.concatenate([wav, wav])
    hlo_dp = step_dp.lower(
        state_dp, *shard_batch((mel8, wav8), mesh_dp)
    ).compile().as_text()
    dp = _collective_counts(hlo_dp)
    assert dp["all-to-all"] == 0, dp
    assert dp["collective-permute"] == 0, dp
    assert dp["all-reduce"] > 0, dp  # the gradient psums

    # dp x tp
    mesh_tp = create_mesh(data=4, model=2)
    state_tp = shard_tree(jax.tree.map(jnp.asarray, snap), mesh_tp)
    step_tp = make_jitted_vocoder_step(model, cfg)
    hlo_tp = step_tp.lower(
        state_tp, *shard_batch((mel, wav), mesh_tp)
    ).compile().as_text()
    tp = _collective_counts(hlo_tp)
    assert tp["all-reduce"] > 0, tp
    assert tp["all-gather"] > 0, tp  # TP weight gathers at use sites
    # the bounded model-axis regrouping set (measured 4 on this program);
    # anything larger means the partitioner started moving activations
    assert tp["all-to-all"] <= 6, tp
    assert tp["reduce-scatter"] == 0, tp

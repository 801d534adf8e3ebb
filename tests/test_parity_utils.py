"""Small reference-parity crumbs: weight-norm fold/unfold, get_config
introspection, and the optional TensorBoard metrics mirror."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from sambert_hifigan_tpu.config import DiscriminatorConfig, VocoderConfig
from sambert_hifigan_tpu.models.hifigan import HiFiGAN, ScaleDiscriminator
from sambert_hifigan_tpu.models.layers import (
    apply_weight_norm,
    remove_weight_norm,
)


def test_remove_weight_norm_preserves_output_and_structure():
    """Folding g*v/||v|| into v must not change the module's output (the
    reference's remove_weight_norm contract, hifigan.py:263-271), and the
    folded tree must load into the same module (structure preserved)."""
    model = ScaleDiscriminator(channel_div=16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1, 256)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out0, fmaps0 = model.apply(params, x)

    folded = remove_weight_norm(params)
    out1, fmaps1 = model.apply(folded, x)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=1e-5, atol=1e-6)
    # after folding, v IS the effective kernel: parametrization is identity
    leaves0 = jax.tree_util.tree_structure(params)
    leaves1 = jax.tree_util.tree_structure(folded)
    assert leaves0 == leaves1

    # re-applying weight norm keeps the output too
    resplit = apply_weight_norm(folded)
    out2, _ = model.apply(resplit, x)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out2),
                               rtol=1e-5, atol=1e-6)


def test_get_config_introspection():
    cfg = VocoderConfig(discriminator=DiscriminatorConfig(channel_div=16))
    model = HiFiGAN(cfg)
    d = model.get_config()
    assert d["discriminator"]["channel_div"] == 16
    assert d["generator"]["upsample_initial_channel"] == cfg.generator.upsample_initial_channel

    from sambert_hifigan_tpu.config import AcousticModelConfig
    from sambert_hifigan_tpu.models.acoustic_model import SAMBERTAcousticModel
    from sambert_hifigan_tpu.models.encoder import BERTEncoder

    am = SAMBERTAcousticModel(AcousticModelConfig())
    assert am.get_config()["d_model"] == 256
    enc = BERTEncoder()
    assert enc.get_config()["n_layers"] == enc.config.n_layers


def test_metrics_writer_tensorboard_mirror(tmp_path):
    """tensorboard=True writes event files next to the canonical JSONL."""
    from sambert_hifigan_tpu.training.metrics import MetricsWriter

    w = MetricsWriter(str(tmp_path), "t", tensorboard=True)
    host = w.write(1, {"loss": jnp.asarray(0.5)})
    w.close()
    assert host["loss"] == 0.5
    rec = json.loads((tmp_path / "t_metrics.jsonl").read_text().splitlines()[0])
    assert rec["step"] == 1 and rec["loss"] == 0.5
    tb_dir = tmp_path / "tb_t"
    assert tb_dir.exists() and any(
        f.name.startswith("events") for f in tb_dir.iterdir()
    ), "no TensorBoard event file written"

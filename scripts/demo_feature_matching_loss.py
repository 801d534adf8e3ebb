#!/usr/bin/env python
"""Per-discriminator feature-matching loss demo
(reference: demo_feature_matching_loss.py).

Runs one adv_mel_fm generator loss computation and prints the total FM loss
plus the 8 per-discriminator contributions (gen_fm_loss_disc_0..7: 3 MSD
scales then 5 MPD periods), showing the logging schema a metrics dashboard
would consume.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

import os as _os

if _os.getenv("SAMBERT_FORCE_CPU"):  # sitecustomize pre-registers the TPU
    jax.config.update("jax_platforms", "cpu")

from sambert_hifigan_tpu.utils.jax_cache import enable as _enable_jax_cache

_enable_jax_cache()  # persistent XLA compile cache (SAMBERT_JAX_CACHE=0 disables)
import jax.numpy as jnp
import numpy as np


def main():
    from sambert_hifigan_tpu.config import TTSConfig
    from sambert_hifigan_tpu.losses.vocoder import vocoder_generator_loss
    from sambert_hifigan_tpu.models.hifigan import HiFiGAN

    cfg = TTSConfig()
    model = HiFiGAN(cfg.vocoder)
    frames = 8
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 80, frames)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel, method=HiFiGAN.init_all)
    wav_fake = model.apply(params, mel)
    wav_real = jnp.asarray(
        rng.standard_normal(wav_fake.shape) * 0.1, jnp.float32
    )
    (
        _, msd_rf, msd_fo, msd_ff, _, mpd_rf, mpd_fo, mpd_ff,
    ) = model.apply(params, wav_real, wav_fake, method=HiFiGAN.discriminate)
    loss, metrics = vocoder_generator_loss(
        wav_real,
        wav_fake,
        cfg.audio,
        loss_mode="adv_mel_fm",
        disc_fake_outputs=list(msd_fo) + list(mpd_fo),
        real_feature_maps=list(msd_rf) + list(mpd_rf),
        fake_feature_maps=list(msd_ff) + list(mpd_ff),
    )
    print(f"total generator loss: {float(loss):.4f}")
    print(f"feature-matching loss (mean over 8 discriminators): "
          f"{float(metrics['gen_fm_loss']):.6f}")
    names = [f"MSD scale {i}" for i in range(3)] + [
        f"MPD period {p}" for p in (2, 3, 5, 7, 11)
    ]
    for i, name in enumerate(names):
        v = float(metrics[f"gen_fm_loss_disc_{i}"])
        print(f"  gen_fm_loss_disc_{i} ({name}): {v:.6f}")


if __name__ == "__main__":
    main()

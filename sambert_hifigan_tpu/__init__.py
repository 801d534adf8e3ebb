"""TPU-native SAM-BERT + HiFi-GAN text-to-speech framework.

A from-scratch JAX/XLA/Pallas rebuild of the two-stage Chinese TTS pipeline in
terrense/TTS-sambert_hifiGAN (text -> SAM-BERT acoustic model -> mel ->
HiFi-GAN vocoder -> waveform), designed TPU-first:

  * static shapes + masks everywhere (bucketed Tph/Tfrm) so the full model
    compiles under jit,
  * a scan-based autoregressive decoder with an HBM-resident KV cache
    (the reference re-encodes the whole prefix per frame,
    reference: models/ar_decoder.py:198-229),
  * channel-last conv layouts and bf16 matmuls for the MXU,
  * data-parallel (+ optional tensor-parallel) training over a
    jax.sharding.Mesh with XLA collectives.
"""

__version__ = "0.1.0"

from .config import (
    AudioConfig,
    TTSConfig,
    default_config,
    load_config,
    validate_config,
    validate_mel_consistency,
)

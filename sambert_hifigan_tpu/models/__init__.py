"""Model zoo (mirrors the reference's models/ package surface,
reference: models/__init__.py:3-7, plus the full-module-path imports its
tests use)."""

from .acoustic_model import (
    AcousticForwardOutput,
    SAMBERTAcousticModel,
    acoustic_inference,
)
from .ar_decoder import PNCAARDecoder, ar_decode, init_decoder_caches
from .encoder import BERTEncoder
from .hifigan import (
    MRF,
    HiFiGAN,
    HiFiGANGenerator,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    PeriodDiscriminator,
    ResBlock,
    ScaleDiscriminator,
)
from .phoneme_embedding import PhonemeEmbedding
from .variance_adaptor import (
    VarianceAdaptor,
    VariancePredictor,
    quantize_energy,
    quantize_pitch,
)

__all__ = [
    "AcousticForwardOutput",
    "SAMBERTAcousticModel",
    "acoustic_inference",
    "PNCAARDecoder",
    "ar_decode",
    "init_decoder_caches",
    "BERTEncoder",
    "MRF",
    "HiFiGAN",
    "HiFiGANGenerator",
    "MultiPeriodDiscriminator",
    "MultiScaleDiscriminator",
    "PeriodDiscriminator",
    "ResBlock",
    "ScaleDiscriminator",
    "PhonemeEmbedding",
    "VarianceAdaptor",
    "VariancePredictor",
    "quantize_energy",
    "quantize_pitch",
]

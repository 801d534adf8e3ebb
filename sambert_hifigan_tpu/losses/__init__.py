from .acoustic import (
    acoustic_loss,
    duration_loss,
    energy_loss,
    mel_l1_loss,
    pitch_loss,
)
from .vocoder import (
    STFT_PARAMS,
    VALID_LOSS_MODES,
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
    mel_reconstruction_loss,
    multi_resolution_stft_loss,
    should_train_discriminator,
    vocoder_discriminator_loss,
    vocoder_generator_loss,
)

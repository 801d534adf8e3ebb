"""TPU compute primitives: DSP (STFT/mel), torch-parity convolutions, and the
static-shape length regulator."""

from .conv import (
    avg_pool1d,
    conv1d,
    conv2d,
    conv_transpose1d,
    folded_conv1d,
    get_padding,
    leaky_relu,
    reflect_pad_time,
    weight_norm_kernel,
)
from .length_regulator import gather_frames, length_regulate, regulate_indices
from .mel import (
    extract_mel,
    extract_mel_from_file,
    log_mel_spectrogram,
    mel_filterbank,
    mel_power_spectrogram,
    resample,
)
from .stft import hann_window, num_stft_frames, stft_magnitude

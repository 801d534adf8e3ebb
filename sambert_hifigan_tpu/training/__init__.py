from .acoustic_trainer import acoustic_train_step, init_acoustic_state, make_acoustic_optimizer, make_jitted_acoustic_step
from .checkpoint import CheckpointManager
from .metrics import MetricsWriter
from .train_state import AcousticTrainState, VocoderTrainState
from .vocoder_trainer import init_vocoder_state, make_jitted_vocoder_step, make_vocoder_optimizers, vocoder_train_step

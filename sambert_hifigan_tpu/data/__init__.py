from .audio import load_mel, load_wav, save_mel, save_wav
from .dataset import TTSDataset, collate_acoustic, read_metadata, synthetic_batch, vocoder_batches_from_dataset
from .features import extract_energy, extract_f0, uniform_durations

from . import audio, index, preprocessing, synthetic  # noqa: F401
from .dataset import AudioStore, SpeakerDataset, dataset_from_config  # noqa: F401

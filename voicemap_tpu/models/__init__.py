from .classifier import SpeakerClassifier  # noqa: F401
from .encoder import ConvEncoder  # noqa: F401
from .siamese import SiameseNet  # noqa: F401

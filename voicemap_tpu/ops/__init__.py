from . import distance, melspec, preprocess, sampling  # noqa: F401

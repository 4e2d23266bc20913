from . import nshot  # noqa: F401

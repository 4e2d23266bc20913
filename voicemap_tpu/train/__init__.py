from . import losses, metrics, steps  # noqa: F401
from .loop import fit  # noqa: F401
from .state import TrainState, init_state, make_optimizer  # noqa: F401

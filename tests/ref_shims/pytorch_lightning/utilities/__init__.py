from . import distributed  # noqa: F401
from .distributed import rank_zero_only  # noqa: F401

from .config import TrackerConfig
from .flags import FailFlag
from .checkpoint import save_state, load_state

__all__ = ["TrackerConfig", "FailFlag", "save_state", "load_state"]

from .config import TrackerConfig
from .dynamic import DynamicParams
from .flags import FailFlag
from .checkpoint import save_state, load_state

__all__ = ["TrackerConfig", "DynamicParams", "FailFlag", "save_state", "load_state"]

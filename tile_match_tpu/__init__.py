"""tile_match_tpu — a TPU-native (JAX/XLA/Pallas) tile-matching environment
engine with the capabilities of ``tile-match-gym`` (reference at
/root/reference), rebuilt from scratch as pure functional, batched,
shardable array programs.
"""

from .config import EnvConfig, TILE_TYPES
from .state import EnvState, StepInfo, action_table

__version__ = "0.1.0"

__all__ = [
    "EnvConfig",
    "EnvState",
    "StepInfo",
    "TILE_TYPES",
    "action_table",
]

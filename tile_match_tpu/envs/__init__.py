"""Environment APIs: Gymnasium single-env adapter + native batched env."""

from .gym_env import TileMatchEnv
from .batched import BatchedTileMatchEnv

__all__ = ["TileMatchEnv", "BatchedTileMatchEnv"]

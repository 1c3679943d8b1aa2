"""Grid-literal test helpers (counterpart of the reference's tests/utils.py).

For users migrating reference-style tests: build boards from literal arrays,
probe for 3-runs, wipe coordinates, list special locations.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def create_alternating_array(height: int, width: int) -> np.ndarray:
    """[2, H, W] checkerboard of colours 1/2, all-normal kinds."""
    r = np.arange(height)[:, None]
    c = np.arange(width)[None, :]
    colour = 2 - ((r % 2) == (c % 2)).astype(np.int32)
    return np.stack([colour, np.ones_like(colour)])


def contains_threes(board: np.ndarray) -> bool:
    """Any horizontal/vertical 3-run of equal non-zero colour?"""
    colour = np.asarray(board)[0]
    h = (
        (colour[:, :-2] == colour[:, 1:-1])
        & (colour[:, 1:-1] == colour[:, 2:])
        & (colour[:, :-2] != 0)
    )
    v = (
        (colour[:-2, :] == colour[1:-1, :])
        & (colour[1:-1, :] == colour[2:, :])
        & (colour[:-2, :] != 0)
    )
    return bool(h.any() or v.any())


def wipe_coords(board: np.ndarray, coords: List[Tuple[int, int]]) -> None:
    for r, c in coords:
        board[:, r, c] = 0


def get_special_locations(board: np.ndarray) -> List[Tuple[int, int]]:
    kind = np.asarray(board)[1]
    return [
        (int(r), int(c))
        for r, c in np.argwhere((kind != 0) & (kind != 1))
    ]

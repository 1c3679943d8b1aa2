"""ANSI string rendering of boards (`tile_match_env.py:127-143` equivalent),
as a pure function usable for debugging batched envs too."""

from __future__ import annotations

import numpy as np

_KIND_GLYPH = {-1: "O", 0: ".", 1: " ", 2: "|", 3: "-", 4: "*"}


def board_to_string(board: np.ndarray, colour_offset: int = 1) -> str:
    """Human-readable grid: colour digit + special glyph per cell."""
    board = np.asarray(board)
    colour, kind = board[0], board[1]
    R, C = colour.shape
    lines = [" " + "-" * (C * 3 + 1)]
    for r in range(R):
        cells = []
        for c in range(C):
            g = _KIND_GLYPH.get(int(kind[r, c]), "?")
            cells.append(f"{int(colour[r, c])}{g}")
        lines.append("| " + " ".join(cells) + " |")
    lines.append(" " + "-" * (C * 3 + 1))
    return "\n".join(lines)

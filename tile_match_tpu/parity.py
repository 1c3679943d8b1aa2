"""Bit-exact numpy-RNG parity mode.

The reference consumes a single ``np.random.Generator`` stream sequentially
across generate/re-roll/shuffle/refill (`board.py:97, 116, 129, 239`).
Threefry cannot reproduce that bit stream, so parity mode keeps the *driver*
on the host — issuing exactly the same numpy RNG calls in exactly the same
order — while every board transform runs through the same jitted kernels as
the native engine (SURVEY §7 "ship both": numpy_parity for golden tests,
counter-based PRNG for production).

``ParityEngine.move``/``generate_board`` mirror ``Board.move``
(`board.py:330-395`) and ``Board.generate_board`` (`board.py:95-112`)
call-for-call at the RNG level.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from .config import EnvConfig
from .state import action_table
from .ops.board_ops import (
    apply_refill,
    apply_reroll_rows,
    apply_shuffle,
    gravity,
    swap_cells,
)
from .ops.classify import process_colour_lines
from .ops.combination import combination_match
from .ops.effective import effective_mask
from .ops.lines import first_line_info, get_colour_lines
from .ops.resolve import resolve_colour_matches


@functools.lru_cache(maxsize=None)
def _kernels(cfg: EnvConfig):
    """Per-config jitted kernel bundle for the host driver."""

    @jax.jit
    def k_effective(colour, kind):
        return effective_mask(cfg, colour, kind)

    @jax.jit
    def k_swap(colour, kind, c1, c2):
        return swap_cells(colour, kind, c1, c2)

    @jax.jit
    def k_comb(colour, kind, c1, c2):
        colour, kind, act, _ovf = combination_match(cfg, colour, kind, c1, c2)
        # eliminations = flat_size - count_nonzero(kind) (`board.py:362`)
        n_empty = (kind == 0).sum()
        colour, kind = gravity(colour, kind)
        return colour, kind, act, n_empty

    @jax.jit
    def k_resolve_once(colour, kind):
        ls = get_colour_lines(cfg, colour, kind)
        m = process_colour_lines(cfg, colour, ls)
        had = m.count > 0
        colour, kind, act, new, _ovf = resolve_colour_matches(cfg, colour, kind, m)
        # eliminations counted before gravity (`board.py:374`)
        n_empty = (kind == 0).sum()
        colour, kind = gravity(colour, kind)
        return colour, kind, act, new, had, n_empty

    @jax.jit
    def k_refill(colour, kind, grid):
        return apply_refill(colour, kind, grid)

    @jax.jit
    def k_first_line(colour):
        return first_line_info(cfg, colour)

    @jax.jit
    def k_shuffle(colour, kind, perm):
        return apply_shuffle(colour, kind, perm)

    @jax.jit
    def k_reroll(colour, bound, grid):
        return apply_reroll_rows(colour, bound, grid)

    return {
        "effective": k_effective,
        "swap": k_swap,
        "comb": k_comb,
        "resolve_once": k_resolve_once,
        "refill": k_refill,
        "first_line": k_first_line,
        "shuffle": k_shuffle,
        "reroll": k_reroll,
    }


class ParityEngine:
    """Host-driven engine with reference-identical numpy RNG consumption."""

    def __init__(self, cfg: EnvConfig, np_random: np.random.Generator):
        self.cfg = cfg
        self.np_random = np_random
        self.k = _kernels(cfg)
        # one live [2, R, C] buffer; colour/kind are views into it, so
        # reference-style in-place mutation (``env.board.board[0] = ...``,
        # as in the reference's own tests) is fully supported.
        self._board = np.zeros((2, cfg.num_rows, cfg.num_cols), np.int32)
        self._board[1] = 1
        c1, c2 = action_table(cfg)
        self._c1, self._c2 = c1, c2
        self.num_specials_activated = 0
        self.num_new_specials = 0

    def reseed(self, seed: int) -> None:
        """`tile_match_env.py:79-82`: replace the board's generator."""
        self.np_random = np.random.default_rng(seed)

    # -- helpers ------------------------------------------------------------
    @property
    def colour(self) -> np.ndarray:
        return self._board[0]

    @property
    def kind(self) -> np.ndarray:
        return self._board[1]

    def _set(self, colour, kind):
        self._board[0] = np.asarray(colour)
        self._board[1] = np.asarray(kind)

    def effective_mask(self) -> np.ndarray:
        return np.asarray(self.k["effective"](self.colour, self.kind))

    def possible_move(self) -> bool:
        return bool(self.effective_mask().any())

    def _draw_grid(self, n_cells):
        return self.np_random.integers(
            1, self.cfg.num_colours + 1, int(n_cells)
        ).astype(np.int32)

    def _refill(self):
        """`board.py:231-241`: draw exactly num_zeros values, fill row-major."""
        empty = (self.colour == 0) & (self.kind == 0)
        n = int(empty.sum())
        if n > 0:
            grid = np.zeros_like(self.colour)
            grid[empty] = self._draw_grid(n)
            self._set(*self.k["refill"](self.colour, self.kind, grid))

    def _shuffle(self):
        """`board.py:114-118`."""
        perm = np.arange(self.cfg.flat_size)
        self.np_random.shuffle(perm)
        self._set(
            *self.k["shuffle"](self.colour, self.kind, perm.astype(np.int32))
        )

    def _line_info(self):
        has, top = self.k["first_line"](self.colour)
        return bool(has), int(top)

    def _remove_colour_lines(self, top_row):
        """`board.py:120-131`: re-roll rows 0..top+1 until no lines remain."""
        has = True
        top = top_row
        while has:
            bound = min(self.cfg.num_rows - 1, top + 1)
            vals = self._draw_grid((bound + 1) * self.cfg.num_cols)
            grid = np.zeros_like(self.colour)
            grid[: bound + 1, :] = vals.reshape(bound + 1, self.cfg.num_cols)
            self._board[0] = np.asarray(self.k["reroll"](self.colour, bound, grid))
            has, top = self._line_info()

    def _playability_loop(self, has_lines, top):
        """Shared regenerate/playability loop (`board.py:102-109, 381-391`)."""
        shuffled = False
        while (not self.possible_move()) or has_lines:
            if has_lines:
                self._remove_colour_lines(top)
            else:
                shuffled = True
                self._shuffle()
            has_lines, top = self._line_info()
        return shuffled

    # -- public API ---------------------------------------------------------
    def generate_board(self):
        """`board.py:95-112`."""
        self._board[1] = 1
        self._board[0] = self._draw_grid(self.cfg.flat_size).reshape(
            self.cfg.num_rows, self.cfg.num_cols
        )
        has, top = self._line_info()
        self._playability_loop(has, top)

    def move(self, coord1, coord2):
        """`board.py:330-395`. Returns the reference's stats tuple."""
        cfg = self.cfg
        self.num_specials_activated = 0
        self.num_new_specials = 0
        num_eliminations = 0
        is_comb = False
        shuffled = False

        a = self._coords_to_action(coord1, coord2)
        if a is None:
            raise ValueError(f"Invalid move: {coord1}, {coord2}")
        if not self.effective_mask()[a]:
            return 0, False, 0, 0, False

        self._set(
            *self.k["swap"](
                self.colour,
                self.kind,
                np.asarray(coord1, np.int32),
                np.asarray(coord2, np.int32),
            )
        )

        k1 = self.kind[coord1[0], coord1[1]]
        k2 = self.kind[coord2[0], coord2[1]]
        if (k1 not in (0, 1) and k2 not in (0, 1)) or k1 < 0 or k2 < 0:
            is_comb = True
            colour, kind, act, n_empty = self.k["comb"](
                self.colour,
                self.kind,
                np.asarray(coord1, np.int32),
                np.asarray(coord2, np.int32),
            )
            self._set(colour, kind)
            self.num_specials_activated += int(act)
            num_eliminations += int(n_empty)
            self._refill()

        while True:
            colour, kind, act, new, had, n_empty = self.k["resolve_once"](
                self.colour, self.kind
            )
            if not bool(had):
                break
            self._set(colour, kind)
            self.num_specials_activated += int(act)
            self.num_new_specials += int(new)
            num_eliminations += int(n_empty)
            self._refill()

        num_eliminations += self.num_new_specials

        shuffled = self._playability_loop(False, 0)
        return (
            num_eliminations,
            is_comb,
            self.num_new_specials,
            self.num_specials_activated,
            shuffled,
        )

    def _coords_to_action(self, coord1, coord2):
        m = (
            (self._c1[:, 0] == coord1[0])
            & (self._c1[:, 1] == coord1[1])
            & (self._c2[:, 0] == coord2[0])
            & (self._c2[:, 1] == coord2[1])
        )
        idx = np.nonzero(m)[0]
        return int(idx[0]) if len(idx) else None

    @property
    def board(self) -> np.ndarray:
        """The live [2, R, C] buffer (mutations are honoured)."""
        return self._board

"""Host driver exposing the native (threefry) engine with the same surface as
``ParityEngine`` so the Gymnasium adapter can swap RNG modes."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnvConfig
from ..engine import engine_move, generate_board
from ..ops.effective import effective_mask
from ..state import action_table


@functools.lru_cache(maxsize=None)
def _fns(cfg: EnvConfig):
    gen = jax.jit(lambda key: generate_board(cfg, key))
    eff = jax.jit(lambda col, kn: effective_mask(cfg, col, kn))

    @jax.jit
    def mv(col, kn, key, c1, c2, e, cur_mask):
        return engine_move(cfg, col, kn, key, c1, c2, e, cur_mask)

    return gen, eff, mv


class ThreefryDriver:
    def __init__(self, cfg: EnvConfig, seed):
        self.cfg = cfg
        self.key = jax.random.PRNGKey(0 if seed is None else seed)
        self._board = np.zeros((2, cfg.num_rows, cfg.num_cols), np.int32)
        self._board[1] = 1
        self._gen, self._eff, self._mv = _fns(cfg)
        c1, c2 = action_table(cfg)
        self._c1, self._c2 = c1, c2

    def reseed(self, seed: int) -> None:
        self.key = jax.random.PRNGKey(seed)

    @property
    def colour(self) -> np.ndarray:
        return self._board[0]

    @property
    def kind(self) -> np.ndarray:
        return self._board[1]

    def generate_board(self) -> None:
        colour, kind, key, _mask, _gave_up = self._gen(self.key)
        self._board[0] = np.asarray(colour)
        self._board[1] = np.asarray(kind)
        self.key = key

    def effective_mask(self) -> np.ndarray:
        return np.asarray(self._eff(self.colour, self.kind))

    def possible_move(self) -> bool:
        return bool(self.effective_mask().any())

    def move(self, coord1, coord2):
        m = (
            (self._c1[:, 0] == coord1[0])
            & (self._c1[:, 1] == coord1[1])
            & (self._c2[:, 0] == coord2[0])
            & (self._c2[:, 1] == coord2[1])
        )
        idx = np.nonzero(m)[0]
        if not len(idx):
            raise ValueError(f"Invalid move: {coord1}, {coord2}")
        cur_mask = self.effective_mask()
        eff = bool(cur_mask[int(idx[0])])
        (
            colour, kind, key, elim, comb, new, act, shuf, _post, _trunc,
            _trips,
        ) = self._mv(
            self.colour,
            self.kind,
            self.key,
            jnp.asarray(coord1, jnp.int32),
            jnp.asarray(coord2, jnp.int32),
            eff,
            jnp.asarray(cur_mask),
        )
        self._board[0] = np.asarray(colour)
        self._board[1] = np.asarray(kind)
        self.key = key
        return int(elim), bool(comb), int(new), int(act), bool(shuf)

    @property
    def board(self) -> np.ndarray:
        """The live [2, R, C] buffer (mutations are honoured)."""
        return self._board

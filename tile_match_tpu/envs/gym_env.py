"""Gymnasium-compatible single-environment adapter.

Drop-in replacement for the reference ``TileMatchEnv``
(`tile_match_env.py:14-150`): same constructor signature, same Dict
observation contract, same info dict, same reward (raw elimination count),
same step/reset/raise protocol.  Two RNG modes:

* ``rng_mode="numpy"`` (default): the numpy-parity engine — bit-exact
  trajectories vs the reference under the same seed.
* ``rng_mode="threefry"``: the device-native engine (counter-based RNG);
  same distribution of behaviour, different stream.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import List, Optional, Tuple, Union

import numpy as np

import gymnasium as gym
from gymnasium.spaces import Box, Discrete

from ..config import EnvConfig
from ..parity import ParityEngine
from ..state import action_table


class TileMatchEnv(gym.Env):
    metadata = {"render_modes": ["string", "human", "rgb_array"], "render_fps": 2}

    def __init__(
        self,
        num_rows: int,
        num_cols: int,
        num_colours: int,
        num_moves: int,
        colourless_specials: List[str],
        colour_specials: List[str],
        seed: Optional[int] = 1,
        render_mode: str = "string",
        rng_mode: str = "numpy",
    ) -> None:
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.num_colours = num_colours
        self.colourless_specials = list(colourless_specials)
        self.colour_specials = list(colour_specials)
        self.num_moves = num_moves
        self.num_colour_specials = len(self.colour_specials)
        self.num_colourless_specials = len(self.colourless_specials)
        self.render_mode = render_mode
        self.rng_mode = rng_mode

        self.cfg = EnvConfig.create(
            num_rows, num_cols, num_colours, num_moves,
            colourless_specials, colour_specials,
        )
        self.seed = seed

        if rng_mode == "numpy":
            self.engine = ParityEngine(self.cfg, np.random.default_rng(seed))
        elif rng_mode == "threefry":
            from ._threefry_driver import ThreefryDriver  # lazy

            self.engine = ThreefryDriver(self.cfg, seed)
        else:
            raise ValueError(f"unknown rng_mode: {rng_mode}")

        self.renderer = None
        if render_mode == "string":
            self._colour_map = np.random.default_rng(seed).choice(
                range(105, 230), size=self.num_colours + 1, replace=False
            )
        elif render_mode in ("human", "rgb_array"):
            from ..rendering.pygame_renderer import Renderer  # lazy

            self.renderer = Renderer(
                num_rows,
                num_cols,
                num_colours,
                num_moves,
                render_fps=self.metadata["render_fps"],
                render_mode=render_mode,
            )

        # observation/action spaces — identical bounds to
        # `tile_match_env.py:52-77`.
        obs_low = np.array(
            [
                np.zeros((num_rows, num_cols), dtype=np.int32),
                np.full(
                    (num_rows, num_cols),
                    -self.num_colourless_specials,
                    dtype=np.int32,
                ),
            ]
        )
        obs_high = np.array(
            [
                np.full((num_rows, num_cols), num_colours, dtype=np.int32),
                np.full(
                    (num_rows, num_cols),
                    self.num_colour_specials + 2,
                    dtype=np.int32,
                ),
            ]
        )
        self.num_actions = self.cfg.num_actions
        c1, c2 = action_table(self.cfg)
        self._action_to_coords = tuple(
            (tuple(int(v) for v in a), tuple(int(v) for v in b))
            for a, b in zip(c1, c2)
        )
        self._board_observation_space = Box(
            low=obs_low,
            high=obs_high,
            shape=(2, num_rows, num_cols),
            dtype=np.int32,
            seed=seed,
        )
        self._moves_left_observation_space = Discrete(num_moves + 1, seed=seed)
        self.observation_space = gym.spaces.Dict(
            {
                "board": self._board_observation_space,
                "num_moves_left": self._moves_left_observation_space,
            }
        )
        self.action_space = Discrete(self.num_actions, seed=seed)
        self.timer = None

    # -- protocol ------------------------------------------------------------
    def set_seed(self, seed: int) -> None:
        self.action_space.seed(seed)
        self.observation_space.seed(seed)
        self.engine.reseed(seed)

    def reset(
        self, seed: Optional[int] = None, options: Optional[dict] = None
    ) -> Tuple[dict, dict]:
        if seed is not None:
            self.set_seed(seed)
        # gym.Env bookkeeping (sets self.np_random); the engine keeps its own
        # generator so trajectories are unaffected.
        super().reset(seed=seed)
        self.engine.generate_board()
        self.timer = 0
        return self._get_obs(), {
            "effective_actions": self._get_effective_actions()
        }

    def step(self, action: int) -> Tuple[dict, int, bool, bool, dict]:
        if self.timer is None or self.timer >= self.num_moves:
            raise Exception("You must call reset before calling step")
        coord1, coord2 = self._action_to_coords[action]
        (
            num_eliminations,
            is_comb,
            num_new_specials,
            num_specials_activated,
            shuffled,
        ) = self.engine.move(coord1, coord2)
        self.timer += 1
        done = self.timer == self.num_moves
        info = {
            "is_combination_match": bool(is_comb),
            "num_new_specials": int(num_new_specials),
            "num_specials_activated": int(num_specials_activated),
            "shuffled": bool(shuffled),
            "effective_actions": self._get_effective_actions(),
        }
        return self._get_obs(), int(num_eliminations), done, False, info

    def _get_obs(self) -> dict:
        return OrderedDict(
            [
                ("board", self.engine.board),
                ("num_moves_left", self.num_moves - self.timer),
            ]
        )

    def _get_effective_actions(self) -> List[int]:
        if self.timer == self.num_moves:
            return []
        return [int(i) for i in np.nonzero(self.engine.effective_mask())[0]]

    # -- rendering -----------------------------------------------------------
    def render(self) -> Union[None, np.ndarray]:
        if self.render_mode == "string":
            board = self.engine.board
            colour = (
                lambda cid, ch: "\033[48;5;16m"
                + f"\033[38;5;{self._colour_map[cid]}m{ch}\033[0m"
            )
            width = board.shape[2]
            print(" " + "-" * (width * 2 + 1))
            for r in range(board.shape[1]):
                print("| ", end="\033[48;5;16m")
                for c in range(width):
                    print(colour(board[0, r, c], board[1, r, c]), end="\033[48;5;16m ")
                    print("\033[0m", end="")
                print("|", end="\n")
            print(" " + "-" * (width * 2 + 1))
            return None
        return self.renderer.render(self.engine.board, self.num_moves - self.timer)

    def close(self) -> None:
        if self.renderer is not None:
            self.renderer.close()

    # convenience for parity with reference examples accessing env.board
    @property
    def board(self):
        return self.engine

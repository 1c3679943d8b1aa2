"""Drop-in migration compatibility: reference-style usage patterns.

The reference's own tests mutate ``env.board.board`` in place and re-query
(`tests/test_env.py:91-121` pattern); examples access ``env.board.board``
directly (`examples/qrdqn.py:51`).  Our engines expose a live buffer so these
patterns keep working — verified differentially against the reference env.
"""

import numpy as np
import pytest

from tests.helpers import (
    contains_threes,
    create_alternating_array,
    get_special_locations,
    wipe_coords,
)
from tests.oracle import get_ref_env_module
from tile_match_tpu.envs.gym_env import TileMatchEnv

SPECIALS = (["cookie"], ["bomb", "vertical_laser", "horizontal_laser"])


@pytest.mark.parametrize("rng_mode", ["numpy", "threefry"])
@pytest.mark.parametrize("seed", [3, 11])
def test_in_place_board_mutation(rng_mode, seed):
    ref = get_ref_env_module().TileMatchEnv(5, 6, 4, 4, *SPECIALS, seed=seed)
    ours = TileMatchEnv(5, 6, 4, 4, *SPECIALS, seed=seed, rng_mode=rng_mode)
    ref.reset()
    ours.reset()

    rng = np.random.default_rng(seed)
    for trial in range(6):
        colour = rng.integers(1, 5, size=(5, 6)).astype(np.int32)
        kind = np.ones((5, 6), np.int32)
        if trial >= 2:
            r, c = rng.integers(0, 5), rng.integers(0, 6)
            k = int(rng.choice([2, 3, 4, -1]))
            kind[r, c] = k
            if k == -1:
                colour[r, c] = 0
        # reference-style in-place mutation on BOTH envs
        ref.board.board[0] = colour
        ref.board.board[1] = kind
        ours.board.board[0] = colour
        ours.board.board[1] = kind
        assert ours._get_effective_actions() == ref._get_effective_actions()


def test_helpers_roundtrip():
    b = create_alternating_array(4, 5)
    assert not contains_threes(b)
    b[0, 1, :3] = 3
    assert contains_threes(b)
    wipe_coords(b, [(1, 0), (1, 1)])
    assert (b[:, 1, 0] == 0).all()
    b[1, 2, 2] = 4
    assert get_special_locations(b) == [(2, 2)]

"""The reference's literal golden episode, hard-coded.

Port of the exact 4-move episode at seed 3 from the reference's own
integration test (`/root/reference/tests/test_env.py:5-88`) plus its
effective-action sweep test (`:91-121`).  Unlike ``test_golden_episodes.py``
(whose expectations were *recorded* by our parity engine), the arrays below
are the upstream project's published expected values, so this test is
independent of both the reference mount and our own recording machinery.
"""

import numpy as np
import pytest

from tile_match_tpu.envs.gym_env import TileMatchEnv

pytestmark = pytest.mark.smoke


def test_env_step_literal_golden():
    env = TileMatchEnv(
        3, 5, 3, 4, ["cookie"], ["bomb", "vertical_laser", "horizontal_laser"],
        seed=3,
    )
    obs, info = env.reset()
    assert list(info["effective_actions"]) == [4, 6, 8]

    next_obs, reward, done, _, info = env.step(6)
    assert np.array_equal(
        next_obs["board"],
        np.array(
            [
                [[2, 3, 1, 2, 1], [2, 2, 3, 1, 2], [3, 2, 1, 2, 3]],
                [[1, 1, 1, 1, 1], [1, 1, 1, 1, 1], [1, 1, 1, 1, 1]],
            ]
        ),
    )
    assert next_obs["num_moves_left"] == 3
    assert reward == 6
    assert not done
    assert info["is_combination_match"] is False
    assert info["num_new_specials"] == 0
    assert info["num_specials_activated"] == 0
    assert info["shuffled"] is False
    assert list(info["effective_actions"]) == [3, 10, 16, 17, 18]

    next_obs, reward, done, _, info = env.step(16)
    assert np.array_equal(
        next_obs["board"],
        np.array(
            [
                [[2, 3, 1, 3, 2], [2, 2, 1, 2, 1], [3, 1, 3, 3, 2]],
                [[1, 1, 1, 1, 1], [1, 1, 1, 1, 1], [1, 1, 1, 1, 1]],
            ]
        ),
    )
    assert next_obs["num_moves_left"] == 2
    assert reward == 18
    assert not done
    assert info["is_combination_match"] is False
    assert info["num_new_specials"] == 1
    assert info["num_specials_activated"] == 1
    assert info["shuffled"] is False
    assert list(info["effective_actions"]) == [16, 17, 18, 19]

    next_obs, reward, done, _, info = env.step(19)
    assert np.array_equal(
        next_obs["board"],
        np.array(
            [
                [[1, 1, 2, 2, 1], [2, 2, 3, 1, 2], [1, 3, 2, 3, 1]],
                [[1, 1, 1, 1, 1], [1, 1, 1, 1, 1], [1, 3, 4, 1, 1]],
            ]
        ),
    )
    assert next_obs["num_moves_left"] == 1
    assert reward == 18
    assert info["is_combination_match"] is False
    assert info["num_new_specials"] == 2
    assert info["num_specials_activated"] == 0
    assert info["shuffled"] is False
    assert list(info["effective_actions"]) == [1, 2, 4, 7, 15, 17, 19]

    next_obs, reward, done, _, info = env.step(19)
    assert reward == 20
    assert np.array_equal(
        next_obs["board"],
        np.array(
            [
                [[2, 2, 1, 1, 3], [1, 3, 3, 1, 3], [1, 3, 3, 2, 1]],
                [[1, 3, 1, 1, 1], [1, 1, 1, 1, 1], [1, 1, 1, 1, 1]],
            ]
        ),
    )
    assert done
    assert next_obs["num_moves_left"] == 0
    assert info["is_combination_match"] is True
    assert info["num_new_specials"] == 1
    assert info["num_specials_activated"] == 2
    assert info["shuffled"] is False
    assert list(info["effective_actions"]) == []


def test_get_effective_actions_literal_golden():
    """`/root/reference/tests/test_env.py:91-121` with direct board pokes."""
    env = TileMatchEnv(
        5, 5, 4, 4, ["cookie"], ["bomb", "vertical_laser", "horizontal_laser"],
        seed=3,
    )
    env.reset()
    env.board.board[0] = np.array(
        [
            [4, 1, 1, 4, 4],
            [2, 1, 2, 1, 4],
            [3, 3, 1, 2, 1],
            [4, 2, 1, 2, 3],
            [2, 2, 4, 3, 2],
        ]
    )
    env.board.board[1] = np.ones((5, 5), dtype=np.int64)
    assert env._get_effective_actions() == [2, 3, 7, 8, 25, 26, 29, 39]

    env.step(2)

    env.board.board[1, 2, 2] = -1
    env.board.board[0, 2, 2] = 0
    assert env._get_effective_actions() == [3, 7, 12, 29, 30, 39]

    env.board.board[1, 3, 1] = 2
    assert env._get_effective_actions() == [3, 7, 12, 29, 30, 33, 39]

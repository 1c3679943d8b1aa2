"""Golden-episode regression (standalone parity oracle).

Fixtures in golden_episodes.json were recorded from the numpy-parity engine,
which the differential suite proves bit-exact against the reference — so
these tests pin reference-identical trajectories without needing the
reference mounted.  Analogue of the reference's own golden test
(`tests/test_env.py:5-88`).
"""

import json
import os

import numpy as np
import pytest

from tile_match_tpu.envs.gym_env import TileMatchEnv

_FIXTURE = os.path.join(os.path.dirname(__file__), "golden_episodes.json")
with open(_FIXTURE) as f:
    EPISODES = json.load(f)


@pytest.mark.parametrize("ep_i", range(len(EPISODES)))
def test_golden_episode(ep_i):
    ep = EPISODES[ep_i]
    R, C, K, M, seed = ep["config"]
    env = TileMatchEnv(
        R, C, K, M, ["cookie"], ["bomb", "vertical_laser", "horizontal_laser"],
        seed=seed,
    )
    obs, info = env.reset()
    assert np.array_equal(obs["board"], np.asarray(ep["reset_board"]))
    assert info["effective_actions"] == ep["reset_effective"]
    for step in ep["steps"]:
        obs, reward, done, trunc, info = env.step(step["action"])
        assert reward == step["reward"]
        assert done == step["done"]
        assert np.array_equal(obs["board"], np.asarray(step["board"]))
        want_info = dict(step["info"])
        got_info = dict(info)
        got_info["effective_actions"] = list(map(int, got_info["effective_actions"]))
        assert got_info == want_info

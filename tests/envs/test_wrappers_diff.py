"""Wrapper parity: OneHot/ProportionReward vs reference wrappers, and
agreement between the gym one-hot and the pure batched encoder."""

import numpy as np
import pytest

from tests.oracle import get_ref_env_module

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.envs.gym_env import TileMatchEnv
from tile_match_tpu.wrappers import OneHotWrapper, ProportionRewardWrapper, one_hot_board


def _import_ref_wrappers():
    get_ref_env_module()
    import tile_match_gym.wrappers as ref_wrappers

    return ref_wrappers


SPEC_SETS = [
    (["cookie"], ["vertical_laser", "horizontal_laser", "bomb"]),
    ([], []),
    ([], ["bomb"]),
    (["cookie"], []),
    ([], ["vertical_laser", "horizontal_laser"]),
]


@pytest.mark.parametrize("spec_i", range(len(SPEC_SETS)))
@pytest.mark.parametrize("seed", [0, 3])
def test_one_hot_matches_reference(spec_i, seed):
    rw = _import_ref_wrappers()
    colourless, colour_specials = SPEC_SETS[spec_i]
    ref_env = rw.OneHotWrapper(
        get_ref_env_module().TileMatchEnv(
            4, 5, 3, 6, list(colourless), list(colour_specials), seed=seed
        )
    )
    our_env = OneHotWrapper(
        TileMatchEnv(4, 5, 3, 6, list(colourless), list(colour_specials), seed=seed)
    )
    assert our_env.board_obs_space.shape == ref_env.board_obs_space.shape

    ro, ri = ref_env.reset()
    oo, oi = our_env.reset()
    assert np.array_equal(oo["board"], ro["board"])

    # step through an episode, hitting special-creating moves when possible
    picker = np.random.default_rng(seed)
    done = False
    while not done:
        eff = ri["effective_actions"]
        a = int(picker.choice(eff)) if eff else int(picker.integers(0, ref_env.env.num_actions))
        ro, rr, done, _, ri = ref_env.step(a)
        oo, orr, odone, _, oi = our_env.step(a)
        assert np.array_equal(oo["board"], ro["board"])
        assert oo["num_moves_left"] == ro["num_moves_left"]
        assert orr == rr


def test_proportion_reward():
    rw = _import_ref_wrappers()
    ref_env = rw.ProportionRewardWrapper(
        get_ref_env_module().TileMatchEnv(3, 5, 3, 4, ["cookie"], ["bomb"], seed=3)
    )
    our_env = ProportionRewardWrapper(
        TileMatchEnv(3, 5, 3, 4, ["cookie"], ["bomb"], seed=3)
    )
    ro, ri = ref_env.reset()
    oo, oi = our_env.reset()
    done = False
    while not done:
        a = ri["effective_actions"][0]
        ro, rr, done, _, ri = ref_env.step(a)
        oo, orr, _, _, oi = our_env.step(a)
        assert orr == rr


def test_pure_one_hot_agrees_with_wrapper():
    cfg = EnvConfig.create(4, 5, 3, 6, ["cookie"], ["vertical_laser", "horizontal_laser", "bomb"])
    env = OneHotWrapper(
        TileMatchEnv(4, 5, 3, 6, ["cookie"], ["vertical_laser", "horizontal_laser", "bomb"], seed=5)
    )
    obs, info = env.reset()
    raw = env.env.engine.board
    pure = np.asarray(one_hot_board(cfg, raw))
    assert np.array_equal(pure, obs["board"].astype(np.float32))

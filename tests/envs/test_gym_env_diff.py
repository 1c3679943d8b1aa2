"""Env-level differential parity: our Gymnasium adapter vs reference
TileMatchEnv — exact obs/reward/termination/info across whole episodes."""

import numpy as np
import pytest

from tests.oracle import get_ref_env_module

from tile_match_tpu.envs.gym_env import TileMatchEnv

ALL_SPECIALS = (["cookie"], ["bomb", "vertical_laser", "horizontal_laser"])


def run_diff_episode(R, C, K, moves, colourless, colour_specials, seed, n_episodes=2):
    ref_mod = get_ref_env_module()
    ref = ref_mod.TileMatchEnv(
        R, C, K, moves, list(colourless), list(colour_specials), seed=seed
    )
    ours = TileMatchEnv(
        R, C, K, moves, list(colourless), list(colour_specials), seed=seed
    )
    picker = np.random.default_rng(seed + 777)

    for ep in range(n_episodes):
        ref_obs, ref_info = ref.reset()
        our_obs, our_info = ours.reset()
        assert np.array_equal(our_obs["board"], ref_obs["board"])
        assert our_obs["num_moves_left"] == ref_obs["num_moves_left"]
        assert our_info == ref_info

        done = False
        while not done:
            eff = ref_info["effective_actions"]
            # mix of effective and arbitrary actions
            if picker.random() < 0.8 and eff:
                a = int(picker.choice(eff))
            else:
                a = int(picker.integers(0, ref.num_actions))
            ref_obs, ref_r, ref_done, ref_trunc, ref_info = ref.step(a)
            our_obs, our_r, our_done, our_trunc, our_info = ours.step(a)
            assert np.array_equal(our_obs["board"], ref_obs["board"]), (
                f"ep={ep} action={a}\nref=\n{ref_obs['board']}\nours=\n{our_obs['board']}"
            )
            assert our_obs["num_moves_left"] == ref_obs["num_moves_left"]
            assert our_r == ref_r, f"reward {our_r} vs {ref_r}"
            assert our_done == ref_done
            assert our_trunc == ref_trunc
            assert our_info == ref_info
            done = ref_done


@pytest.mark.parametrize("seed", [1, 2, 3, 7, 11])
def test_episode_diff_all_specials(seed):
    run_diff_episode(3, 5, 3, 4, *ALL_SPECIALS, seed=seed)


@pytest.mark.parametrize("seed", [2, 5])
def test_episode_diff_no_specials(seed):
    run_diff_episode(5, 5, 3, 10, [], [], seed=seed)


@pytest.mark.parametrize("seed", [2])
def test_episode_diff_headline(seed):
    run_diff_episode(10, 10, 4, 12, *ALL_SPECIALS, seed=seed, n_episodes=1)


def test_consecutive_episodes_share_rng_stream():
    # `tile_match_env.py:84-87`: reset without a seed does NOT reseed — the
    # same generator keeps producing; episode 2 depends on episode 1.
    run_diff_episode(4, 4, 3, 5, *ALL_SPECIALS, seed=9, n_episodes=3)


def test_reset_with_seed_matches_reference():
    ref_mod = get_ref_env_module()
    ref = ref_mod.TileMatchEnv(4, 4, 3, 5, ["cookie"], ["bomb"], seed=1)
    ours = TileMatchEnv(4, 4, 3, 5, ["cookie"], ["bomb"], seed=1)
    ro, ri = ref.reset(seed=42)
    oo, oi = ours.reset(seed=42)
    assert np.array_equal(oo["board"], ro["board"])
    assert oi == ri


def test_step_before_reset_raises():
    ours = TileMatchEnv(3, 3, 3, 4, [], [], seed=0)
    with pytest.raises(Exception, match="reset"):
        ours.step(0)


def test_threefry_mode_smoke():
    env = TileMatchEnv(5, 5, 3, 5, *ALL_SPECIALS, seed=0, rng_mode="threefry")
    obs, info = env.reset()
    assert obs["board"].shape == (2, 5, 5)
    assert len(info["effective_actions"]) > 0
    total = 0
    done = False
    while not done:
        a = info["effective_actions"][0]
        obs, r, done, _, info = env.step(a)
        total += r
    assert total > 0
    assert info["effective_actions"] == []


def test_gymnasium_check_env():
    from gymnasium.utils.env_checker import check_env

    env = TileMatchEnv(5, 5, 3, 5, *ALL_SPECIALS, seed=0)
    check_env(env, skip_render_check=True)

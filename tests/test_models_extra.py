"""QR-DQN learner smoke test + headless rgb_array rendering."""

import os

import jax
import numpy as np

from tile_match_tpu.config import EnvConfig


def test_qrdqn_train_step():
    from tile_match_tpu.models.qrdqn import make_qrdqn

    cfg = EnvConfig(4, 4, 3, 5)
    init_fn, train_step, _ = make_qrdqn(
        cfg, batch_size=16, num_quantiles=15, hidden=128
    )
    state = init_fn(jax.random.PRNGKey(0))
    jstep = jax.jit(train_step)
    for i in range(5):
        state, metrics = jstep(state, jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["reward_mean"]) >= 0


def test_rgb_array_render():
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
    from tile_match_tpu.envs.gym_env import TileMatchEnv

    env = TileMatchEnv(
        5, 5, 3, 4, ["cookie"], ["vertical_laser", "horizontal_laser", "bomb"],
        seed=0, render_mode="rgb_array",
    )
    obs, info = env.reset()
    frame = env.render()
    assert frame is not None
    assert frame.ndim == 3 and frame.shape[2] == 3
    assert frame.dtype == np.uint8
    # a couple of steps with specials on board should still render
    env.engine.kind[2, 2] = 4
    env.engine.kind[1, 1] = -1
    env.engine.colour[1, 1] = 0
    frame2 = env.render()
    assert frame2.shape == frame.shape
    assert not np.array_equal(frame, frame2)
    env.close()

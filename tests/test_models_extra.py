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


def test_replay_buffer():
    import jax.numpy as jnp

    from tile_match_tpu.models.replay import replay_add, replay_init, replay_sample

    cfg = EnvConfig(4, 4, 3, 5)
    rb = replay_init(cfg, capacity=10)
    B = 4
    batch = {
        "boards": np.ones((B, 2, 4, 4), np.int32) * 2,
        "moves": np.full((B,), 3, np.int32),
        "actions": np.arange(B, dtype=np.int32),
        "rewards": np.ones((B,), np.float32),
        "dones": np.zeros((B,), bool),
        "next_boards": np.ones((B, 2, 4, 4), np.int32),
        "next_moves": np.full((B,), 2, np.int32),
        "next_eff": np.ones((B, cfg.num_actions), bool),
    }
    rb = replay_add(rb, {k: jnp.asarray(v) for k, v in batch.items()})
    assert int(rb.size) == 4 and int(rb.ptr) == 4
    for _ in range(3):  # wrap the ring
        rb = replay_add(rb, {k: jnp.asarray(v) for k, v in batch.items()})
    assert int(rb.size) == 10 and int(rb.ptr) == 6
    s = replay_sample(rb, jax.random.PRNGKey(0), 8)
    assert s["boards"].shape == (8, 2, 4, 4)
    assert (np.asarray(s["rewards"]) == 1).all()


def test_dqn_replay_training():
    from tile_match_tpu.models.dqn_replay import make_dqn_replay

    cfg = EnvConfig(4, 4, 3, 5)
    init_fn, train_step, _ = make_dqn_replay(
        cfg, env_batch=16, train_batch=32, replay_capacity=512,
        hidden=128, learning_starts=32,
    )
    state = init_fn(jax.random.PRNGKey(0))
    jstep = jax.jit(train_step)
    for i in range(6):
        state, metrics = jstep(state, jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["replay_size"]) == 6 * 16

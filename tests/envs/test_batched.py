"""Batched env: auto-reset, scan rollout, batch consistency with single-env."""

import jax
import jax.numpy as jnp
import numpy as np

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.engine import reset, step
from tile_match_tpu.envs.batched import (
    BatchedTileMatchEnv,
    batched_reset,
    batched_step,
    rollout,
)

CFG = EnvConfig(5, 5, 3, 4)


def test_auto_reset():
    env = BatchedTileMatchEnv(CFG, batch_size=8)
    states, ts = env.reset(jax.random.PRNGKey(0))
    for t in range(CFG.num_moves):
        masks = np.asarray(ts.info.effective_actions)
        acts = jnp.asarray(
            [np.nonzero(m)[0][0] if m.any() else 0 for m in masks], jnp.int32
        )
        states, ts = env.step(states, acts)
    # all episodes ended simultaneously → all were auto-reset
    assert bool(ts.done.all())
    assert (np.asarray(states.timer) == 0).all()
    assert (np.asarray(ts.obs_moves_left) == CFG.num_moves).all()
    # fresh boards have effective moves again
    states, ts2 = env.step(
        states, jnp.zeros((8,), jnp.int32)
    )
    assert (np.asarray(states.timer) == 1).all()


def test_batch_matches_single_env():
    """Each batch lane must evolve exactly like an unbatched env with the
    same key (vmap must not change semantics)."""
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(42), B)
    states, ts = batched_reset(CFG, jax.random.PRNGKey(42), B)
    # lane i of batched_reset uses split key i
    for i in range(B):
        s_i, info_i = jax.jit(lambda k: reset(CFG, k))(keys[i])
        assert np.array_equal(np.asarray(s_i.colour), np.asarray(states.colour[i]))

    masks = np.asarray(ts.info.effective_actions)
    acts = jnp.asarray([np.nonzero(m)[0][0] for m in masks], jnp.int32)
    nstates, nts = batched_step(CFG, states, acts, auto_reset=False)
    sstep = jax.jit(lambda s, a: step(CFG, s, a))
    for i in range(B):
        s_i = jax.tree.map(lambda x: x[i], states)
        n_i, r_i, d_i, _ = sstep(s_i, acts[i])
        assert np.array_equal(np.asarray(n_i.colour), np.asarray(nstates.colour[i]))
        assert float(r_i) == float(nts.reward[i])


def test_scan_rollout():
    states, rewards, dones = jax.jit(
        lambda key: rollout(CFG, key, batch_size=16, num_steps=12)
    )(jax.random.PRNGKey(1))
    rewards = np.asarray(rewards)
    dones = np.asarray(dones)
    assert rewards.shape == (12, 16)
    assert (rewards >= 0).all()
    assert rewards.sum() > 0
    # every episode is CFG.num_moves long → dones at steps 3, 7, 11
    assert dones[3].all() and dones[7].all() and dones[11].all()
    assert not dones[0].any()

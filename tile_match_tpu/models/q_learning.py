"""Tabular Q-learning.

Two implementations with the reference's capability
(`examples/q_learning.py:9-123`):

* ``QLearningAgent`` + ``train``: host-side dict Q-table over hashed
  observations, stepping the Gymnasium adapter — drop-in for the reference
  example (same hyperparameters, epsilon decay, update rule).
* ``train_dense``: fully device-resident variant for tiny boards — the state
  packs into a base-K integer index, the Q-table is a dense [S, A] array, and
  a batch of envs updates it with scatter-adds under one jit per step.
"""

from __future__ import annotations

import functools
import json
import os
import pickle
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

from ..config import EnvConfig
from ..envs.batched import batched_reset, batched_step


class QLearningAgent:
    """Epsilon-greedy tabular agent (`examples/q_learning.py:9-52`)."""

    def __init__(self, lr, epsilon_decay_dur, gamma, num_actions, rng):
        self.lr = lr
        self.epsilon_decay_dur = epsilon_decay_dur
        self.epsilon = 1.0
        self.gamma = gamma
        self.num_actions = num_actions
        self.q_table = defaultdict(
            lambda: np.zeros(self.num_actions, dtype=np.float32)
        )
        self.rng = rng

    def _key(self, obs):
        board, moves = obs["board"], obs["num_moves_left"]
        return tuple(np.asarray(board).flatten().tolist() + [int(moves)])

    def choose_action(self, obs, effective_actions=None):
        s = self._key(obs)
        if self.rng.random() < self.epsilon:
            if effective_actions:
                return int(self.rng.choice(effective_actions))
            return int(self.rng.choice(self.num_actions))
        q = self.q_table[s]
        if effective_actions:
            qs = q[effective_actions]
            return int(
                effective_actions[
                    self.rng.choice(np.flatnonzero(qs == qs.max()))
                ]
            )
        return int(self.rng.choice(np.flatnonzero(q == q.max())))

    def process_transition(self, obs, action, reward, next_obs, done):
        if self.epsilon > 0:
            self.epsilon -= 1.0 / self.epsilon_decay_dur
        s, ns = self._key(obs), self._key(next_obs)
        target = reward + self.gamma * (1 - done) * self.q_table[ns].max()
        self.q_table[s][action] += self.lr * (target - self.q_table[s][action])


def run_episode(agent, env, obs_seen):
    obs, info = env.reset()
    obs_seen[agent._key(obs)] += 1
    total, n_eff = 0.0, 0
    while True:
        action = agent.choose_action(obs)
        next_obs, reward, done, _, info = env.step(action)
        obs_seen[agent._key(next_obs)] += 1
        agent.process_transition(obs, action, reward, next_obs, done)
        n_eff += int(reward > 0)
        total += reward
        if done:
            return total, n_eff, obs_seen
        obs = next_obs


def train(agent, env, num_episodes: int = 1000):
    """`examples/q_learning.py:76-86`."""
    epi_r = np.zeros(num_episodes)
    eff = np.zeros(num_episodes)
    obs_seen = defaultdict(int)
    for i in range(num_episodes):
        r, n, obs_seen = run_episode(agent, env, obs_seen)
        epi_r[i] = r
        eff[i] = n
    return epi_r, eff, obs_seen, agent


def save_results(results, output_dir):
    """`examples/q_learning.py:88-107` layout."""
    os.makedirs(output_dir, exist_ok=True)
    json_results = {
        "epi_r": np.asarray(results["r"]).tolist(),
        "num_effective_actions": np.asarray(results["eff_a"]).tolist(),
        "num_obs_seen": len(results["obs_seen"]),
    }
    with open(os.path.join(output_dir, "results.json"), "w") as f:
        json.dump(json_results, f)
    rest = {k: v for k, v in results.items() if k not in json_results}
    with open(os.path.join(output_dir, "results.pkl"), "wb") as f:
        pickle.dump({k: v for k, v in rest.items() if k != "obs_seen"}, f)


# ---------------------------------------------------------------------------
# Device-resident dense-table variant
# ---------------------------------------------------------------------------
def _pack_state(cfg: EnvConfig, colour, moves_left):
    """Base-K packed state index (colours only; tiny no-special boards)."""
    flat = colour.reshape(colour.shape[0], -1) - 1
    # int32 is ample: train_dense guards the table under 50M entries.
    powers = cfg.num_colours ** jnp.arange(cfg.flat_size, dtype=jnp.int32)
    board_idx = (flat.astype(jnp.int32) * powers[None, :]).sum(-1)
    return board_idx * (cfg.num_moves + 1) + moves_left.astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _dense_fns(cfg: EnvConfig, batch_size: int, lr: float, gamma: float,
               eps_decay: int):
    @jax.jit
    def step_update(qtable, states, mask, key, step_i):
        key, ke, ka = jax.random.split(key, 3)
        s_idx = _pack_state(cfg, states.colour, cfg.num_moves - states.timer)
        q_s = qtable[s_idx]
        eps = jnp.clip(1.0 - step_i / eps_decay, 0.0, 1.0)
        greedy = jnp.argmax(jnp.where(mask, q_s, -jnp.inf), axis=-1)
        logits = jnp.where(mask, 0.0, -jnp.inf)
        rand_a = jax.random.categorical(ka, logits, axis=-1)
        explore = jax.random.uniform(ke, greedy.shape) < eps
        any_eff = mask.any(-1)
        acts = jnp.where(any_eff, jnp.where(explore, rand_a, greedy), 0)
        acts = acts.astype(jnp.int32)

        nstates, ts = batched_step(cfg, states, acts, eff_mask=mask)
        reward = ts.reward / cfg.flat_size
        ns_idx = _pack_state(cfg, nstates.colour, cfg.num_moves - nstates.timer)
        nq_max = jnp.max(
            jnp.where(ts.info.effective_actions, qtable[ns_idx], -jnp.inf),
            axis=-1,
        )
        nq_max = jnp.where(ts.info.effective_actions.any(-1), nq_max, 0.0)
        target = reward + gamma * (1.0 - ts.done) * nq_max
        td = target - qtable[s_idx, acts]
        qtable = qtable.at[s_idx, acts].add(lr * td)
        return qtable, nstates, ts.info.effective_actions, ts.reward, key

    reset_fn = jax.jit(lambda k: batched_reset(cfg, k, batch_size))
    return reset_fn, step_update


def train_dense(
    cfg: EnvConfig,
    num_steps: int = 2000,
    batch_size: int = 64,
    lr: float = 0.25,
    gamma: float = 0.9,
    eps_decay: int = 1000,
    seed: int = 0,
):
    """On-device tabular Q-learning over a dense packed-state table."""
    n_states = (cfg.num_colours**cfg.flat_size) * (cfg.num_moves + 1)
    if n_states > 50_000_000:
        raise ValueError(f"state space too large for dense table: {n_states}")
    reset_fn, step_update = _dense_fns(cfg, batch_size, lr, gamma, eps_decay)
    qtable = jnp.zeros((n_states, cfg.num_actions), jnp.float32)
    key = jax.random.PRNGKey(seed)
    key, kr = jax.random.split(key)
    states, ts = reset_fn(kr)
    mask = ts.info.effective_actions
    rewards = []
    for i in range(num_steps):
        qtable, states, mask, r, key = step_update(
            qtable, states, mask, key, jnp.float32(i * batch_size)
        )
        rewards.append(np.asarray(r).mean())
    return qtable, np.asarray(rewards)

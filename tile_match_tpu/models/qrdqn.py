"""Quantile-Regression DQN — distributional variant of the batched learner.

Direct counterpart of the reference's SB3 QRDQN example
(`examples/qrdqn.py:36-37`: MultiInputPolicy, 75 quantiles): a quantile head
over the same one-hot Dict observation, trained with the quantile Huber
(pinball) loss, fully device-resident like models/dqn.py.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from ..config import EnvConfig
from ..envs.batched import batched_reset, batched_step
from ..state import EnvState
from .dqn import _encode


class QuantileQNetwork(nn.Module):
    num_actions: int
    num_quantiles: int = 75
    hidden: int = 512

    @nn.compact
    def __call__(self, board_planes, moves_left):
        x = board_planes.reshape((board_planes.shape[0], -1))
        ml = (moves_left[:, None].astype(jnp.float32)) / 100.0
        x = jnp.concatenate([x, ml], axis=-1).astype(jnp.bfloat16)
        x = nn.relu(nn.Dense(self.hidden, dtype=jnp.bfloat16)(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=jnp.bfloat16)(x))
        q = nn.Dense(self.num_actions * self.num_quantiles, dtype=jnp.float32)(x)
        return q.reshape(x.shape[0], self.num_actions, self.num_quantiles)


class QRDQNState(NamedTuple):
    params: Any
    target_params: Any
    opt_state: Any
    env_states: EnvState
    obs_planes: jnp.ndarray
    obs_moves: jnp.ndarray
    eff_mask: jnp.ndarray
    step_count: jnp.ndarray


def make_qrdqn(
    cfg: EnvConfig,
    batch_size: int = 256,
    num_quantiles: int = 75,
    lr: float = 3e-4,
    gamma: float = 0.95,
    hidden: int = 512,
    target_period: int = 200,
    eps_start: float = 1.0,
    eps_end: float = 0.05,
    eps_decay_steps: int = 10_000,
    kappa: float = 1.0,
):
    net = QuantileQNetwork(
        num_actions=cfg.num_actions, num_quantiles=num_quantiles, hidden=hidden
    )
    tx = optax.adam(lr)
    taus = (jnp.arange(num_quantiles, dtype=jnp.float32) + 0.5) / num_quantiles

    def init_fn(key) -> QRDQNState:
        key, k_env, k_net = jax.random.split(key, 3)
        env_states, ts = batched_reset(cfg, k_env, batch_size)
        planes, moves = _encode(cfg, env_states)
        params = net.init(k_net, planes, moves)
        return QRDQNState(
            params, params, tx.init(params), env_states, planes, moves,
            ts.info.effective_actions, jnp.int32(0),
        )

    def q_values(params, planes, moves):
        return net.apply(params, planes, moves).mean(-1)

    def act_fn(params, planes, moves, eff_mask, key, epsilon):
        q = q_values(params, planes, moves)
        any_eff = eff_mask.any(axis=-1)
        greedy = jnp.where(
            any_eff, jnp.argmax(jnp.where(eff_mask, q, -jnp.inf), axis=-1), 0
        )
        k_eps, k_rand = jax.random.split(key)
        rand = jnp.where(
            any_eff,
            jax.random.categorical(
                k_rand, jnp.where(eff_mask, 0.0, -jnp.inf), axis=-1
            ),
            0,
        )
        explore = jax.random.uniform(k_eps, greedy.shape) < epsilon
        return jnp.where(explore, rand, greedy).astype(jnp.int32)

    def loss_fn(params, target_params, batch):
        planes, moves, actions, rewards, dones, nplanes, nmoves, neff = batch
        theta = net.apply(params, planes, moves)  # [B, A, Q]
        theta_a = jnp.take_along_axis(
            theta, actions[:, None, None], axis=1
        )[:, 0, :]  # [B, Q]
        ntheta = net.apply(target_params, nplanes, nmoves)
        nq = ntheta.mean(-1)
        na = jnp.argmax(jnp.where(neff, nq, -jnp.inf), axis=-1)
        na = jnp.where(neff.any(-1), na, 0)
        ntheta_a = jnp.take_along_axis(ntheta, na[:, None, None], axis=1)[:, 0, :]
        ntheta_a = jnp.where(neff.any(-1)[:, None], ntheta_a, 0.0)
        target = rewards[:, None] + gamma * (1.0 - dones[:, None]) * ntheta_a
        target = jax.lax.stop_gradient(target)
        # pairwise TD: u[b, i, j] = target_j - theta_i
        u = target[:, None, :] - theta_a[:, :, None]
        huber = jnp.where(
            jnp.abs(u) <= kappa,
            0.5 * u**2,
            kappa * (jnp.abs(u) - 0.5 * kappa),
        )
        rho = jnp.abs(taus[None, :, None] - (u < 0)) * huber / kappa
        return rho.sum(1).mean(), jnp.abs(u).mean()

    def train_step(state: QRDQNState, key):
        key, k_act = jax.random.split(key)
        frac = jnp.clip(state.step_count / eps_decay_steps, 0.0, 1.0)
        epsilon = eps_start + frac * (eps_end - eps_start)
        actions = act_fn(
            state.params, state.obs_planes, state.obs_moves, state.eff_mask,
            k_act, epsilon,
        )
        env_states, ts = batched_step(
            cfg, state.env_states, actions, eff_mask=state.eff_mask
        )
        nplanes, nmoves = _encode(cfg, env_states)
        rewards = ts.reward / cfg.flat_size
        batch = (
            state.obs_planes, state.obs_moves, actions, rewards,
            ts.done.astype(jnp.float32), nplanes, nmoves,
            ts.info.effective_actions,
        )
        (loss, td), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.target_params, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        target_params = jax.tree.map(
            lambda p, t: jnp.where(state.step_count % target_period == 0, p, t),
            params, state.target_params,
        )
        new_state = QRDQNState(
            params, target_params, opt_state, env_states, nplanes, nmoves,
            ts.info.effective_actions, state.step_count + 1,
        )
        return new_state, {"loss": loss, "td_abs": td,
                           "reward_mean": rewards.mean(), "epsilon": epsilon}

    return init_fn, train_step, act_fn

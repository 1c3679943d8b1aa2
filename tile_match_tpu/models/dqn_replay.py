"""DQN with experience replay — the full production training loop.

collect (batched env step) → store (ring buffer) → sample → TD update, all
inside one jitted train step.  Compared to models/dqn.py (online, fresh
transitions only), replay decorrelates updates — the standard DQN recipe the
reference's SB3 example relies on (`examples/qrdqn.py:37`: buffer under the
hood of SB3's QRDQN).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import EnvConfig
from ..envs.batched import batched_reset, batched_step
from ..state import EnvState
from ..wrappers import one_hot_board
from .dqn import QNetwork
from .replay import Replay, replay_add, replay_init, replay_sample


class DQNReplayState(NamedTuple):
    params: Any
    target_params: Any
    opt_state: Any
    env_states: EnvState
    eff_mask: jnp.ndarray
    replay: Replay
    step_count: jnp.ndarray


def _planes_from_boards(cfg, boards):
    return jax.vmap(lambda b: one_hot_board(cfg, b))(boards)


def make_dqn_replay(
    cfg: EnvConfig,
    env_batch: int = 128,
    train_batch: int = 256,
    replay_capacity: int = 50_000,
    lr: float = 3e-4,
    gamma: float = 0.95,
    hidden: int = 512,
    target_period: int = 200,
    eps_start: float = 1.0,
    eps_end: float = 0.05,
    eps_decay_steps: int = 10_000,
    learning_starts: int = 500,
):
    net = QNetwork(num_actions=cfg.num_actions, hidden=hidden)
    tx = optax.adam(lr)

    def init_fn(key) -> DQNReplayState:
        key, k_env, k_net = jax.random.split(key, 3)
        env_states, ts = batched_reset(cfg, k_env, env_batch)
        planes = _planes_from_boards(cfg, ts.obs_board)
        params = net.init(k_net, planes, ts.obs_moves_left)
        return DQNReplayState(
            params=params,
            target_params=params,
            opt_state=tx.init(params),
            env_states=env_states,
            eff_mask=ts.info.effective_actions,
            replay=replay_init(cfg, replay_capacity),
            step_count=jnp.int32(0),
        )

    def act(params, boards, moves, eff_mask, key, epsilon):
        planes = _planes_from_boards(cfg, boards)
        q = net.apply(params, planes, moves)
        any_eff = eff_mask.any(-1)
        greedy = jnp.where(
            any_eff, jnp.argmax(jnp.where(eff_mask, q, -jnp.inf), -1), 0
        )
        ke, kr = jax.random.split(key)
        rand = jnp.where(
            any_eff,
            jax.random.categorical(kr, jnp.where(eff_mask, 0.0, -jnp.inf), axis=-1),
            0,
        )
        explore = jax.random.uniform(ke, greedy.shape) < epsilon
        return jnp.where(explore, rand, greedy).astype(jnp.int32)

    def loss_fn(params, target_params, sample):
        planes = _planes_from_boards(cfg, sample["boards"])
        nplanes = _planes_from_boards(cfg, sample["next_boards"])
        q = net.apply(params, planes, sample["moves"])
        q_a = jnp.take_along_axis(q, sample["actions"][:, None], -1)[:, 0]
        nq = net.apply(target_params, nplanes, sample["next_moves"])
        neff = sample["next_eff"]
        nq_max = jnp.where(
            neff.any(-1), jnp.where(neff, nq, -jnp.inf).max(-1), 0.0
        )
        target = sample["rewards"] + gamma * (
            1.0 - sample["dones"].astype(jnp.float32)
        ) * nq_max
        td = q_a - jax.lax.stop_gradient(target)
        return jnp.mean(optax.huber_loss(td)), jnp.mean(jnp.abs(td))

    def train_step(state: DQNReplayState, key):
        key, k_act, k_samp = jax.random.split(key, 3)
        frac = jnp.clip(state.step_count / eps_decay_steps, 0.0, 1.0)
        epsilon = eps_start + frac * (eps_end - eps_start)

        boards = jnp.stack(
            [state.env_states.colour, state.env_states.kind], axis=1
        )
        moves = cfg.num_moves - state.env_states.timer
        actions = act(state.params, boards, moves, state.eff_mask, k_act, epsilon)
        env_states, ts = batched_step(
            cfg, state.env_states, actions, eff_mask=state.eff_mask
        )
        replay = replay_add(
            state.replay,
            {
                "boards": boards,
                "moves": moves,
                "actions": actions,
                "rewards": ts.reward / cfg.flat_size,
                "dones": ts.done,
                "next_boards": ts.obs_board,
                "next_moves": ts.obs_moves_left,
                "next_eff": ts.info.effective_actions,
            },
        )

        sample = replay_sample(replay, k_samp, train_batch)
        (loss, td), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.target_params, sample
        )
        do_update = replay.size >= learning_starts
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(
            lambda p, u: jnp.where(do_update, p + u, p),
            state.params,
            updates,
        )
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(do_update, new, old)
            if getattr(new, "shape", None) == getattr(old, "shape", None)
            else new,
            opt_state,
            state.opt_state,
        )
        target_params = jax.tree.map(
            lambda p, t: jnp.where(state.step_count % target_period == 0, p, t),
            params,
            state.target_params,
        )
        new_state = DQNReplayState(
            params=params,
            target_params=target_params,
            opt_state=opt_state,
            env_states=env_states,
            eff_mask=ts.info.effective_actions,
            replay=replay,
            step_count=state.step_count + 1,
        )
        metrics = {
            "loss": loss,
            "td_abs": td,
            "reward_mean": (ts.reward / cfg.flat_size).mean(),
            "epsilon": epsilon,
            "replay_size": replay.size,
        }
        return new_state, metrics

    return init_fn, train_step, act

"""Mesh construction and sharded rollout / train-step builders.

Layout strategy ("How to Scale Your Model" recipe): pick a mesh, annotate
shardings on the batch dimension, let XLA insert collectives.  Because envs
are independent, the rollout inserts *no* collectives on the step path — only
the metric reduction (psum over ``dp``) and the learner's gradient
all-reduce ride the ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EnvConfig
from ..envs.batched import TimeStep, batched_reset, batched_step


def make_mesh(
    devices: Optional[Sequence] = None,
    dp: Optional[int] = None,
    tp: int = 1,
    axis_names=("dp", "tp"),
) -> Mesh:
    """A (dp, tp) mesh. Defaults: all devices on dp, tp=1."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names)


def shard_env_batch(states, mesh: Mesh):
    """Place a batched EnvState with the batch dim sharded over ``dp``."""
    sh = NamedSharding(mesh, P("dp"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), states)


def sharded_rollout(
    cfg: EnvConfig,
    mesh: Mesh,
    global_batch: int,
    num_steps: int,
):
    """Build a jitted sharded rollout: envs sharded over dp, replicated over tp.

    Returns fn(key) -> (final_states, per_board_reward, stats):

    * per_board_reward: f32[global_batch], total reward per board — callers
      wanting the scalar sum take ``.sum()``; per-board totals let multichip
      correctness be asserted board by board instead of as one sum.
    * stats: dict with ``steps_done`` (i32 scalar), ``trips_sum`` (f32 scalar,
      cascade trips summed over boards and steps) and ``shard_max_trips``
      (f32[dp]; per dp-shard, the sum over steps of that shard's max-over-its-
      boards cascade trips).  A vmapped ``while_loop`` executes the max trip
      count over the boards it batches, so each shard's *executed* trips per
      step is its own max — ``shard_max_trips`` is therefore the quantity
      that weak-scales: it depends on the per-device batch, not on dp, and
      comparing it across dp at fixed per-device batch substantiates (or
      refutes) linear scaling without real multi-chip hardware.

    The step path inserts no collectives; only the final metric reductions
    cross devices.
    """
    dp = mesh.shape["dp"]
    if global_batch % dp:
        raise ValueError(f"global_batch {global_batch} not divisible by dp={dp}")

    batch_sharding = NamedSharding(mesh, P("dp"))
    replicated = NamedSharding(mesh, P())

    def rollout_fn(key):
        states, ts = batched_reset(cfg, key, global_batch)

        def body(carry, _):
            states, ts, key, rew, trips_sum, shard_max = carry
            key, ka = jax.random.split(key)
            mask = ts.info.effective_actions
            logits = jnp.where(mask, 0.0, -jnp.inf)
            acts = jnp.where(
                mask.any(axis=-1),
                jax.random.categorical(ka, logits, axis=-1),
                0,
            ).astype(jnp.int32)
            states, ts = batched_step(cfg, states, acts, eff_mask=mask)
            trips = ts.info.cascade_trips.astype(jnp.float32)  # [B]
            trips_sum = trips_sum + trips.sum()
            shard_max = shard_max + trips.reshape(dp, -1).max(axis=1)
            return (
                states, ts, key, rew + ts.reward, trips_sum, shard_max,
            ), None

        (states, ts, _, rew, trips_sum, shard_max), _ = jax.lax.scan(
            body,
            (
                states,
                ts,
                key,
                jnp.zeros((global_batch,), jnp.float32),
                jnp.float32(0.0),
                jnp.zeros((dp,), jnp.float32),
            ),
            None,
            length=num_steps,
        )
        stats = {
            "steps_done": jnp.int32(num_steps * global_batch),
            "trips_sum": trips_sum,
            "shard_max_trips": shard_max,
        }
        return states, rew, stats

    # Constrain the env batch to the dp axis; XLA partitions the whole scan.
    def sharded(key):
        states, rew, stats = rollout_fn(key)
        states = jax.lax.with_sharding_constraint(
            states, batch_sharding
        )
        return states, rew, stats

    return jax.jit(
        sharded,
        out_shardings=(
            batch_sharding,
            batch_sharding,
            {
                "steps_done": replicated,
                "trips_sum": replicated,
                "shard_max_trips": replicated,
            },
        ),
    )


def sharded_train_step(cfg: EnvConfig, mesh: Mesh, make_dqn_kwargs=None):
    """Build (init, step) for a DQN train step laid out over a (dp, tp) mesh.

    env states + observations: sharded over dp (data parallel);
    network parameters: hidden dims sharded over tp (tensor parallel),
    replicated over dp — XLA inserts the gradient all-reduce over dp and the
    activation collectives over tp automatically from these shardings.
    """
    from ..models.dqn import make_dqn  # local import to avoid cycle

    kwargs = dict(make_dqn_kwargs or {})
    init_fn, train_step, _ = make_dqn(cfg, **kwargs)

    batch_sh = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    def param_sharding(path, x):
        # shard the large hidden matmuls over tp on their output/input dim
        name = "/".join(str(p) for p in path)
        if x.ndim == 2 and "dense1" in name:
            return NamedSharding(mesh, P(None, "tp"))
        if x.ndim == 2 and "dense2" in name:
            return NamedSharding(mesh, P("tp", None))
        return repl

    def place(state):
        params = jax.tree_util.tree_map_with_path(
            lambda p, x: jax.device_put(x, param_sharding(p, x)), state.params
        )
        target = jax.tree_util.tree_map_with_path(
            lambda p, x: jax.device_put(x, param_sharding(p, x)),
            state.target_params,
        )
        opt_state = jax.tree.map(
            lambda x: jax.device_put(x, repl)
            if getattr(x, "ndim", 0) == 0
            else jax.device_put(x, repl),
            state.opt_state,
        )
        env_states = jax.tree.map(
            lambda x: jax.device_put(x, batch_sh), state.env_states
        )
        return state._replace(
            params=params,
            target_params=target,
            opt_state=opt_state,
            env_states=env_states,
            obs_planes=jax.device_put(state.obs_planes, batch_sh),
            obs_moves=jax.device_put(state.obs_moves, batch_sh),
            eff_mask=jax.device_put(state.eff_mask, batch_sh),
        )

    def init(key):
        return place(init_fn(key))

    jitted_step = jax.jit(train_step)
    return init, jitted_step

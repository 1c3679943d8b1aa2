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

    Returns fn(key) -> (final_states, total_reward, steps_done) with the env
    batch laid out over the mesh; the only cross-device op is the final metric
    reduction.
    """
    dp = mesh.shape["dp"]
    if global_batch % dp:
        raise ValueError(f"global_batch {global_batch} not divisible by dp={dp}")

    batch_sharding = NamedSharding(mesh, P("dp"))
    replicated = NamedSharding(mesh, P())

    def rollout_fn(key):
        states, ts = batched_reset(cfg, key, global_batch)

        def body(carry, _):
            states, ts, key, total = carry
            key, ka = jax.random.split(key)
            mask = ts.info.effective_actions
            logits = jnp.where(mask, 0.0, -jnp.inf)
            acts = jnp.where(
                mask.any(axis=-1),
                jax.random.categorical(ka, logits, axis=-1),
                0,
            ).astype(jnp.int32)
            states, ts = batched_step(cfg, states, acts, eff_mask=mask)
            return (states, ts, key, total + ts.reward.sum()), None

        (states, ts, _, total), _ = jax.lax.scan(
            body,
            (states, ts, key, jnp.float32(0.0)),
            None,
            length=num_steps,
        )
        return states, total, jnp.int32(num_steps * global_batch)

    # Constrain the env batch to the dp axis; XLA partitions the whole scan.
    def sharded(key):
        states, total, n = rollout_fn(key)
        states = jax.lax.with_sharding_constraint(
            states, batch_sharding
        )
        return states, total, n

    return jax.jit(
        sharded,
        out_shardings=(batch_sharding, replicated, replicated),
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

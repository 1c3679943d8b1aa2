"""Batched DQN training — the deep-RL example.

Counterpart of the reference's SB3/QRDQN script (`examples/qrdqn.py:15-67`),
with the whole loop (env batch, masked epsilon-greedy, TD update) compiled
and device-resident; optionally sharded over all available chips.

    python examples/dqn_train.py --steps 2000 [--rows 5 --cols 5] [--sharded]
"""

import argparse
import json

import jax
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=5)
    p.add_argument("--cols", type=int, default=5)
    p.add_argument("--colours", type=int, default=3)
    p.add_argument("--moves", type=int, default=10)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--sharded", action="store_true")
    p.add_argument("--eval-episodes", type=int, default=64)
    args = p.parse_args()

    from tile_match_tpu.config import EnvConfig

    cfg = EnvConfig(args.rows, args.cols, args.colours, args.moves)

    if args.sharded:
        from tile_match_tpu.parallel.sharding import make_mesh, sharded_train_step

        mesh = make_mesh()
        init, step = sharded_train_step(
            cfg, mesh,
            make_dqn_kwargs=dict(batch_size=args.batch, hidden=args.hidden),
        )
        key = jax.random.PRNGKey(0)
        with mesh:
            state = init(key)
            for t in range(args.steps):
                key, k = jax.random.split(key)
                state, metrics = step(state, k)
                if (t + 1) % 200 == 0:
                    print(json.dumps({k_: float(v) for k_, v in metrics.items()}
                                     | {"step": t + 1}))
        return

    from tile_match_tpu.models.dqn import make_dqn, train

    state, history = train(
        cfg, num_steps=args.steps, batch_size=args.batch, hidden=args.hidden,
        log_every=200,
    )
    for h in history:
        print(json.dumps(h))

    # greedy evaluation
    import numpy as np

    from tile_match_tpu.envs.batched import batched_reset, batched_step

    init_fn, _, act_fn = make_dqn(cfg, batch_size=args.eval_episodes,
                                  hidden=args.hidden)
    from tile_match_tpu.models.dqn import _encode

    env_states, ts = jax.jit(
        lambda k: batched_reset(cfg, k, args.eval_episodes)
    )(jax.random.PRNGKey(123))
    mask = ts.info.effective_actions
    total = np.zeros(args.eval_episodes)
    for _ in range(cfg.num_moves):
        planes, moves = _encode(cfg, env_states)
        acts = act_fn(state.params, planes, moves, mask,
                      jax.random.PRNGKey(0), 0.0)
        env_states, ts = jax.jit(
            lambda s, a: batched_step(cfg, s, a, auto_reset=False)
        )(env_states, acts)
        mask = ts.info.effective_actions
        total += np.asarray(ts.reward)
    print(json.dumps({
        "eval_return_mean": float(total.mean() / cfg.flat_size),
        "eval_return_std": float(total.std() / cfg.flat_size),
    }))


if __name__ == "__main__":
    main()

"""Kernel-coverage telemetry: which cascade trips the specials kernel
consumes vs defers, and WHY it defers (VERDICT r4 item 3).

Runs a seeded random-effective rollout on a specials config through the
production fused step with ``with_stats=True`` and aggregates:

* executed trips split into kernel-consumed vs full-machinery;
* per-step defer-reason histogram (ops.pallas_cascade.REASON_* bits,
  counted per board-step that froze with that bit set — a board-step may
  carry several bits).

The distribution drives which closed form to absorb into the kernel next:
a reason that dominates the histogram is the serialization bound
(max-over-batch complex trips) for that config.

Usage:
  python tools/kernel_coverage.py [--config 2|3|4] [--batch 256]
      [--steps 30] [--json COVERAGE.json]
CPU runs use interpret mode (bit-identical); pass nothing else on TPU.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REASON_NAMES = {
    1: "cookie line >=9 or shared >=5",
    2: "extension >=5 (>=4 if no bomb)",
    4: "prim+ext pair outside case table",
    8: "cookie hit (closure)",
    16: "closure unconverged",
    32: "h x v crossing outside case table",
    64: "multi-share / overlapping exts",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=3)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import CONFIGS
    from tile_match_tpu.config import EnvConfig
    from tile_match_tpu.envs.batched import batched_reset
    from tile_match_tpu.envs.fused import batched_step_fused_sp

    R, C, K, MOVES, COLOURLESS, COLOUR_SP = CONFIGS[args.config]
    cfg = EnvConfig.create(
        R, C, K, MOVES, colourless_specials=COLOURLESS,
        colour_specials=COLOUR_SP,
    )
    assert cfg.any_special, "coverage telemetry is for specials configs"
    interpret = jax.default_backend() != "tpu"

    @jax.jit
    def run(key):
        key, k0 = jax.random.split(key)
        states, ts = batched_reset(cfg, k0, args.batch)
        mask = ts.info.effective_actions

        def body(carry, _):
            states, mask, key = carry
            key, ka = jax.random.split(key)
            logits = jnp.where(mask, 0.0, -jnp.inf)
            acts = jnp.where(
                mask.any(-1), jax.random.categorical(ka, logits, axis=-1), 0
            ).astype(jnp.int32)
            states, rew, done, infos, stats = batched_step_fused_sp(
                cfg, states, acts, mask, compute_post_mask=False,
                interpret=interpret, with_stats=True,
            )
            bits = jnp.asarray([1, 2, 4, 8, 16, 32, 64], jnp.int32)
            per_reason = jnp.sum(
                (stats["reasons"][:, None] & bits[None, :]) > 0, axis=0
            )  # [6] boards deferring for each reason this step
            out = {
                "trips": infos.cascade_trips.sum(),
                "full": stats["full_trips"].sum(),
                "rounds": stats["rounds"],
                "max_full": stats["full_trips"].max(),
                "frozen_boards": jnp.sum(stats["reasons"] > 0),
                "per_reason": per_reason,
                # exact-bitmask histogram: which closed form would clear the
                # board-step ENTIRELY (all its reasons must be absorbed)
                "mask_hist": jnp.sum(
                    stats["reasons"][:, None]
                    == jnp.arange(128, dtype=jnp.int32)[None, :],
                    axis=0,
                ),
            }
            return (states, infos.effective_actions, key), out

        (_, _, _), outs = jax.lax.scan(
            body, (states, mask, key), None, length=min(args.steps, MOVES)
        )
        return outs

    outs = jax.device_get(run(jax.random.PRNGKey(0)))
    n_steps = min(args.steps, MOVES)
    total = int(outs["trips"].sum())
    full = int(outs["full"].sum())
    result = {
        "config": args.config,
        "batch": args.batch,
        "steps": n_steps,
        "board_steps": args.batch * n_steps,
        "trips_total": total,
        "trips_full_machinery": full,
        "trips_kernel": total - full,
        "kernel_fraction": round((total - full) / max(total, 1), 4),
        "rounds_total": int(outs["rounds"].sum()),
        "rounds_mean_per_step": round(float(outs["rounds"].mean()), 2),
        "max_full_trips_one_board": int(outs["max_full"].max()),
        "frozen_board_steps": int(outs["frozen_boards"].sum()),
        "defer_reasons": {
            REASON_NAMES[b]: int(outs["per_reason"][:, i].sum())
            for i, b in enumerate([1, 2, 4, 8, 16, 32, 64])
        },
        "mask_hist": {
            str(m): int(outs["mask_hist"][:, m].sum())
            for m in range(128)
            if int(outs["mask_hist"][:, m].sum()) and m
        },
    }
    print(json.dumps(result, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()

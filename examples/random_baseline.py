"""Random-agent baseline sweep over board configurations.

Counterpart of the reference's `examples/random_agent.py:101-142` sweep, but
batched on device: each (rows, cols, colours, moves) config runs thousands of
episodes in a few seconds instead of hours.

    python examples/random_baseline.py [--episodes 3000] [--quick]
"""

import argparse
import json

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.models.random_agent import run_random, save_results

COMBOS = [
    (3, 3, 2, 5), (3, 3, 2, 10),
    (4, 4, 3, 5), (4, 4, 3, 10),
    (5, 5, 3, 5), (5, 5, 3, 10),
    (5, 5, 4, 5), (5, 5, 4, 10),
    (6, 6, 3, 10), (7, 7, 4, 10),
    (8, 8, 4, 10), (9, 9, 5, 10),
    (10, 10, 4, 10), (10, 10, 5, 10),
    (15, 15, 5, 10), (20, 20, 10, 10),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--episodes", type=int, default=3000)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--quick", action="store_true", help="first 4 configs only")
    p.add_argument("--out", type=str, default="results")
    args = p.parse_args()

    combos = COMBOS[:4] if args.quick else COMBOS
    rows = []
    for (R, C, K, M) in combos:
        cfg = EnvConfig.create(R, C, K, M, [], ["vertical_laser"])
        for use_eff in (False, True):
            r, eff = run_random(
                cfg, 0, args.episodes, use_eff, batch_size=args.batch
            )
            out_dir = f"{args.out}/{R}_{C}_{K}_{M}_specials" + (
                "_effective_actions" if use_eff else ""
            )
            save_results((r, eff), out_dir)
            stats = {
                "config": (R, C, K, M),
                "use_effective_actions": use_eff,
                "epi_rewards_mean": float(np.mean(r)),
                "epi_rewards_std": float(np.std(r)),
                "env_eff_a_mean": float(np.mean(eff / M)),
            }
            rows.append(stats)
            print(json.dumps(stats))


if __name__ == "__main__":
    main()

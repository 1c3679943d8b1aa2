"""Interactive / demo episode with rendering.

    python examples/play.py                # ANSI string rendering, random agent
    python examples/play.py --render human # pygame window (needs display)
"""

import argparse

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tile_match_tpu.envs.gym_env import TileMatchEnv


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=8)
    p.add_argument("--cols", type=int, default=8)
    p.add_argument("--colours", type=int, default=4)
    p.add_argument("--moves", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--render", choices=["string", "human", "rgb_array"],
                   default="string")
    args = p.parse_args()

    env = TileMatchEnv(
        args.rows, args.cols, args.colours, args.moves,
        ["cookie"], ["vertical_laser", "horizontal_laser", "bomb"],
        seed=args.seed, render_mode=args.render,
    )
    rng = np.random.default_rng(args.seed)
    obs, info = env.reset()
    env.render()
    total = 0
    done = False
    while not done:
        action = int(rng.choice(info["effective_actions"]))
        obs, reward, done, _, info = env.step(action)
        total += reward
        print(f"action={action} reward={reward} "
              f"specials+={info['num_new_specials']} "
              f"activated={info['num_specials_activated']}")
        env.render()
    print(f"episode return: {total}")
    env.close()


if __name__ == "__main__":
    main()

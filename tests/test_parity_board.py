"""Bit-exact trajectory parity: ParityEngine vs reference Board.

Same seed → same generated boards, same move outcomes, same stats, same RNG
stream across whole episodes (generate → many moves with cascades, specials,
shuffles, refills).  This is the parity oracle demanded by BASELINE.json.
"""

import numpy as np
import pytest

from tests.oracle import get_ref_board_module

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.parity import ParityEngine

SPEC_CONFIGS = {
    "all": (["cookie"], ["vertical_laser", "horizontal_laser", "bomb"]),
    "none": ([], []),
    "lasers": ([], ["vertical_laser", "horizontal_laser"]),
}


def run_episode(R, C, K, spec_key, seed, n_moves=8):
    mod = get_ref_board_module()
    colourless, colour_specials = SPEC_CONFIGS[spec_key]

    ref = mod.Board(R, C, K, list(colourless), list(colour_specials),
                    np.random.default_rng(seed))
    ref.generate_board()

    cfg = EnvConfig.create(R, C, K, 10, colourless, colour_specials)
    ours = ParityEngine(cfg, np.random.default_rng(seed))
    ours.generate_board()

    assert np.array_equal(ours.board, ref.board), (
        f"generate mismatch seed={seed}\nref=\n{ref.board}\nours=\n{ours.board}"
    )

    picker = np.random.default_rng(seed + 10_000)
    for t in range(n_moves):
        # choose the same effective action on both sides (from ref's board)
        eff = [
            i
            for i, (a, b) in enumerate(ref.action_to_coords)
            if mod.is_move_effective(ref.board, a, b)
        ]
        ours_eff = np.nonzero(ours.effective_mask())[0].tolist()
        assert ours_eff == eff, f"effective mismatch t={t}: {ours_eff} vs {eff}"
        if not eff:
            break
        a = int(picker.choice(eff))
        c1, c2 = ref.action_to_coords[a]
        ref_stats = ref.move(c1, c2)
        got_stats = ours.move(c1, c2)
        assert tuple(got_stats) == tuple(ref_stats), (
            f"stats mismatch t={t} action={a}: {got_stats} vs {ref_stats}"
        )
        assert np.array_equal(ours.board, ref.board), (
            f"board mismatch t={t} action={a} seed={seed}\n"
            f"ref=\n{ref.board}\nours=\n{ours.board}"
        )
        # RNG streams must stay aligned too
        assert ours.np_random.bit_generator.state == ref.np_random.bit_generator.state


@pytest.mark.parametrize("seed", range(12))
@pytest.mark.parametrize("spec_key", list(SPEC_CONFIGS))
def test_episode_parity_small(seed, spec_key):
    run_episode(5, 5, 3, spec_key, seed)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("spec_key", list(SPEC_CONFIGS))
def test_episode_parity_medium(seed, spec_key):
    run_episode(8, 8, 4, spec_key, seed + 100)


@pytest.mark.parametrize("seed", [2])
def test_episode_parity_headline_config(seed):
    """BASELINE.json: bit-exact parity at seed=2 on 10x10, 4 colours."""
    run_episode(10, 10, 4, "all", seed, n_moves=15)
    run_episode(10, 10, 4, "none", seed, n_moves=15)


@pytest.mark.parametrize("seed", range(4))
def test_episode_parity_tiny_with_shuffles(seed):
    # 3x3 boards shuffle/regenerate often → exercises the playability loop.
    run_episode(3, 3, 2, "none", seed + 50, n_moves=10)

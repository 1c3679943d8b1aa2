"""Differential test: effective_mask vs reference is_move_effective sweep."""

import functools

import jax
import numpy as np
import pytest

from tests.oracle import get_ref_board_module, make_ref_board

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.ops.effective import effective_mask
from tile_match_tpu.state import action_table


@functools.lru_cache(maxsize=None)
def _jitted(R, C):
    cfg = EnvConfig(num_rows=R, num_cols=C, num_colours=8)
    return cfg, jax.jit(lambda col, kn: effective_mask(cfg, col, kn))


def ref_mask(colour, kind):
    m = get_ref_board_module()
    R, C = colour.shape
    b = make_ref_board(R, C, 8, ["cookie"], ["vertical_laser", "horizontal_laser", "bomb"])
    board = np.stack([colour, kind]).astype(np.int32)
    return np.array(
        [m.is_move_effective(board, a, b_) for a, b_ in b.action_to_coords], dtype=bool
    )


def check(colour, kind=None):
    colour = np.asarray(colour, np.int32)
    if kind is None:
        kind = (colour > 0).astype(np.int32)
    kind = np.asarray(kind, np.int32)
    cfg, fn = _jitted(*colour.shape)
    got = np.asarray(fn(colour, kind))
    want = ref_mask(colour, kind)
    assert got.shape == want.shape
    if not np.array_equal(got, want):
        c1, c2 = action_table(cfg)
        bad = np.nonzero(got != want)[0]
        raise AssertionError(
            f"mismatch at actions {bad}: coords {[(tuple(c1[i]), tuple(c2[i])) for i in bad]}\n"
            f"colour=\n{colour}\nkind=\n{kind}\ngot={got[bad]}, want={want[bad]}"
        )


def test_simple_effective():
    check([[1, 2, 1], [2, 1, 2], [1, 2, 2]])


def test_no_effective():
    check([[1, 2, 1], [2, 1, 2], [1, 2, 1]])


def test_specials_and_cookies():
    colour = np.array([[1, 2, 1, 2], [2, 1, 2, 1], [1, 2, 1, 2]], np.int32)
    kind = np.ones_like(colour)
    kind[0, 0] = 2  # special next to special
    kind[0, 1] = 4
    check(colour, kind)
    kind = np.ones_like(colour)
    kind[1, 2] = -1
    colour2 = colour.copy()
    colour2[1, 2] = 0
    check(colour2, kind)


@pytest.mark.parametrize("seed", range(30))
@pytest.mark.parametrize(
    "shape,colours", [((3, 3), 2), ((3, 5), 3), ((5, 5), 3), ((7, 4), 3), ((10, 10), 4)]
)
def test_fuzz(seed, shape, colours):
    rng = np.random.default_rng(seed * 7919 + shape[0] * 31 + colours)
    colour = rng.integers(1, colours + 1, size=shape).astype(np.int32)
    kind = np.ones(shape, np.int32)
    if seed % 2 == 0:
        for _ in range(int(rng.integers(0, 5))):
            r, c = rng.integers(0, shape[0]), rng.integers(0, shape[1])
            k = int(rng.choice([2, 3, 4, -1]))
            kind[r, c] = k
            if k == -1:
                colour[r, c] = 0
    check(colour, kind)

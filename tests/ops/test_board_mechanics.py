"""Per-mechanic unit tests in the reference's grid-literal style
(SURVEY §4 carry-over): gravity collapse with specials preserved, refill
invariants, effective-mask purity, swap symmetry."""

import jax
import numpy as np

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.ops.board_ops import apply_refill, gravity, swap_cells
from tile_match_tpu.ops.effective import effective_mask

CFG = EnvConfig(4, 3, 4, 10)


def test_gravity_exact_collapse():
    colour = np.array(
        [
            [1, 0, 2],
            [0, 0, 3],
            [2, 0, 0],
            [0, 4, 1],
        ],
        np.int32,
    )
    kind = (colour > 0).astype(np.int32)
    kind[3, 1] = 4  # bomb rides gravity like any tile
    c2, k2 = jax.jit(gravity)(colour, kind)
    # per column, empties float to the top, tiles keep relative order:
    # col0 [1,0,2,0]→[0,0,1,2]; col1 [0,0,0,bomb]→[0,0,0,bomb];
    # col2 [2,3,0,1]→[0,2,3,1]
    assert np.array_equal(
        np.asarray(c2),
        np.array([[0, 0, 0], [0, 0, 2], [1, 0, 3], [2, 4, 1]], np.int32),
    )
    assert np.asarray(k2)[3, 1] == 4  # the bomb stayed at the bottom


def test_gravity_preserves_cookie():
    # cookie (colour 0, kind -1) is NOT an empty cell and must fall
    colour = np.zeros((3, 1), np.int32)
    kind = np.zeros((3, 1), np.int32)
    kind[0, 0] = -1  # cookie at top, empties below
    c2, k2 = jax.jit(gravity)(colour, kind)
    assert np.asarray(k2)[:, 0].tolist() == [0, 0, -1]


def test_refill_only_touches_empty():
    colour = np.array([[0, 2], [0, 0]], np.int32)
    kind = np.array([[-1, 1], [0, 0]], np.int32)  # cookie stays
    grid = np.full((2, 2), 3, np.int32)
    c2, k2 = jax.jit(apply_refill)(colour, kind, grid)
    assert np.asarray(c2).tolist() == [[0, 2], [3, 3]]
    assert np.asarray(k2).tolist() == [[-1, 1], [1, 1]]


def test_effective_mask_purity():
    rng = np.random.default_rng(0)
    colour = rng.integers(1, 4, size=(4, 3)).astype(np.int32)
    kind = np.ones_like(colour)
    before_c, before_k = colour.copy(), kind.copy()
    fn = jax.jit(lambda c, k: effective_mask(CFG, c, k))
    for _ in range(3):  # repeated evaluation must not mutate inputs
        m1 = np.asarray(fn(colour, kind))
    assert np.array_equal(colour, before_c)
    assert np.array_equal(kind, before_k)
    m2 = np.asarray(fn(colour, kind))
    assert np.array_equal(m1, m2)


def test_swap_cells_involution():
    rng = np.random.default_rng(1)
    colour = rng.integers(1, 5, size=(4, 3)).astype(np.int32)
    kind = np.ones_like(colour)
    fn = jax.jit(lambda c, k, a, b: swap_cells(c, k, a, b))
    a = np.array([1, 1], np.int32)
    b = np.array([2, 1], np.int32)
    c1, k1 = fn(colour, kind, a, b)
    c2, k2 = fn(np.asarray(c1), np.asarray(k1), a, b)
    assert np.array_equal(np.asarray(c2), colour)
    assert np.array_equal(np.asarray(k2), kind)

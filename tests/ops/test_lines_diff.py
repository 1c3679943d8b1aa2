"""Differential test: get_colour_lines vs the reference implementation.

Reference oracle: `board.py:149-215`.  Exact list-of-lines equality including
line order and coordinate order.
"""

import numpy as np
import pytest

from tests.oracle import make_ref_board

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.ops.lines import get_colour_lines


def lineset_to_pylist(ls):
    coords = np.asarray(ls.coords)
    length = np.asarray(ls.length)
    count = int(ls.count)
    out = []
    for i in range(count):
        n = int(length[i])
        out.append([tuple(int(v) for v in coords[i, j]) for j in range(n)])
    return out


def ref_lines(colour, kind, num_colours=8):
    R, C = colour.shape
    b = make_ref_board(R, C, num_colours, ["cookie"], ["vertical_laser", "horizontal_laser", "bomb"])
    b.board = np.stack([colour, kind]).astype(np.int32)
    return b.get_colour_lines()


import functools
import jax


@functools.lru_cache(maxsize=None)
def _jitted(R, C):
    cfg = EnvConfig(num_rows=R, num_cols=C, num_colours=8)
    return jax.jit(lambda col, kn: get_colour_lines(cfg, col, kn))


def ours_lines(colour, kind):
    R, C = colour.shape
    ls = _jitted(R, C)(np.asarray(colour, np.int32), np.asarray(kind, np.int32))
    return lineset_to_pylist(ls)


def check(colour, kind=None):
    colour = np.asarray(colour, dtype=np.int32)
    if kind is None:
        kind = (colour > 0).astype(np.int32)
    ref = [list(map(tuple, l)) for l in ref_lines(colour, kind)]
    got = ours_lines(colour, kind)
    assert got == ref, f"\ncolour=\n{colour}\nref={ref}\ngot={got}"


def test_no_lines():
    check([[1, 2, 1], [2, 1, 2], [1, 2, 1]])


def test_single_horizontal():
    check([[1, 2, 1, 2], [2, 1, 2, 1], [3, 3, 3, 1]])


def test_single_vertical():
    check([[1, 2, 1], [1, 3, 2], [1, 2, 3]])


def test_lowest_row_only():
    # Two horizontal lines in different rows: only the lowest is primary,
    # and no extension reaches the upper one.
    check(
        [
            [2, 2, 2, 1],
            [1, 3, 1, 2],
            [3, 3, 3, 1],
        ]
    )


def test_t_shape():
    check(
        [
            [1, 2, 1, 2],
            [2, 1, 2, 1],
            [1, 3, 2, 1],
            [2, 3, 1, 2],
            [3, 3, 3, 1],
        ]
    )


def test_l_shape():
    check(
        [
            [1, 2, 1, 2],
            [3, 1, 2, 1],
            [3, 2, 1, 2],
            [3, 3, 3, 1],
        ]
    )


def test_cross_extension():
    # Horizontal primary at bottom with vertical extension through middle coord.
    check(
        [
            [1, 3, 2],
            [2, 3, 1],
            [3, 3, 3],
        ]
    )


def test_long_line():
    check([[2, 1, 2, 1, 2], [1, 2, 1, 2, 1], [3, 3, 3, 3, 3]])


def test_two_lines_same_row():
    check(
        [
            [1, 2, 1, 2, 1, 2, 1],
            [2, 1, 2, 1, 2, 1, 2],
            [3, 3, 3, 1, 4, 4, 4],
        ]
    )


def test_with_cookie_cells():
    colour = np.array(
        [
            [1, 2, 1, 2],
            [0, 1, 2, 1],
            [3, 3, 3, 2],
        ],
        np.int32,
    )
    kind = (colour > 0).astype(np.int32)
    kind[1, 0] = -1  # cookie: colour 0, kind -1
    check(colour, kind)


@pytest.mark.parametrize("seed", range(40))
@pytest.mark.parametrize("shape,colours", [((3, 3), 2), ((5, 5), 3), ((4, 7), 3), ((8, 8), 4), ((10, 10), 4), ((6, 5), 2)])
def test_fuzz_random_boards(seed, shape, colours):
    rng = np.random.default_rng(seed * 1000 + shape[0] * 10 + colours)
    colour = rng.integers(1, colours + 1, size=shape).astype(np.int32)
    kind = np.ones(shape, np.int32)
    # Sprinkle specials/cookies on some boards.
    if seed % 3 == 0:
        n = rng.integers(0, 4)
        for _ in range(n):
            r, c = rng.integers(0, shape[0]), rng.integers(0, shape[1])
            k = rng.choice([2, 3, 4, -1])
            kind[r, c] = k
            if k == -1:
                colour[r, c] = 0
    check(colour, kind)


# ---------------------------------------------------------------------------
# line_union_mask: the no-specials cascade's direct mask must equal the
# union of the slot pipeline's line cells (which the differential tests
# above pin to the reference).
# ---------------------------------------------------------------------------

from tile_match_tpu.ops.lines import line_union_mask  # noqa: E402


@functools.lru_cache(maxsize=None)
def _jitted_union(R, C):
    cfg = EnvConfig(num_rows=R, num_cols=C, num_colours=8)
    return jax.jit(lambda col: line_union_mask(cfg, col))


def check_union(colour):
    colour = np.asarray(colour, np.int32)
    R, C = colour.shape
    kind = (colour > 0).astype(np.int32)
    want = np.zeros((R, C), bool)
    for line in ours_lines(colour, kind):
        for (r, c) in line:
            want[r, c] = True
    got = np.asarray(_jitted_union(R, C)(colour))
    assert np.array_equal(got, want), (
        f"\ncolour=\n{colour}\nwant=\n{want.astype(int)}\ngot=\n{got.astype(int)}"
    )


def test_union_mask_simple_lines():
    check_union([[1, 1, 1], [2, 1, 2], [3, 1, 3]])
    check_union([[1, 2, 1], [2, 1, 2], [1, 2, 1]])  # no lines


def test_union_mask_extensions():
    # horizontal primary with a vertical extension through its middle cell
    check_union(
        [
            [1, 2, 3, 2, 1],
            [2, 1, 3, 1, 2],
            [1, 2, 3, 2, 1],
            [3, 3, 3, 1, 2],
            [1, 2, 1, 2, 1],
        ]
    )


@pytest.mark.parametrize("seed", range(120))
@pytest.mark.parametrize(
    "shape,colours", [((5, 5), 2), ((8, 8), 3), ((10, 10), 3), ((6, 9), 2)]
)
def test_union_mask_fuzz(seed, shape, colours):
    # few colours → dense overlapping lines, the worst case for reach scans
    rng = np.random.default_rng(seed * 77 + shape[0])
    colour = rng.integers(1, colours + 1, size=shape).astype(np.int32)
    check_union(colour)

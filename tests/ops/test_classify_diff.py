"""Differential test: line classification vs reference process_colour_lines.

Compares the full detect→classify pipeline (`board.py:133-147` + `269-327`)
against ours on hand-written and fuzzed boards across specials configs.
"""

import functools

import jax
import numpy as np
import pytest

from tests.oracle import make_ref_board

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.ops.classify import process_colour_lines
from tile_match_tpu.ops.lines import get_colour_lines

NAME_TO_CODE = {
    "normal": 1,
    "vertical_laser": 2,
    "horizontal_laser": 3,
    "bomb": 4,
    "cookie": 5,
}

CONFIGS = {
    "all": (["cookie"], ["vertical_laser", "horizontal_laser", "bomb"]),
    "none": ([], []),
    "no_cookie": ([], ["vertical_laser", "horizontal_laser", "bomb"]),
    "no_bomb": (["cookie"], ["vertical_laser", "horizontal_laser"]),
    "only_vlaser": ([], ["vertical_laser"]),
    "only_bomb": ([], ["bomb"]),
}


@functools.lru_cache(maxsize=None)
def _jitted(R, C, spec_key):
    colourless, colour_specials = CONFIGS[spec_key]
    cfg = EnvConfig.create(R, C, 8, 10, colourless, colour_specials)

    @jax.jit
    def fn(col, kn):
        ls = get_colour_lines(cfg, col, kn)
        return process_colour_lines(cfg, col, ls)

    return fn


def ref_matches(colour, kind, spec_key):
    colourless, colour_specials = CONFIGS[spec_key]
    R, C = colour.shape
    b = make_ref_board(R, C, 8, colourless, colour_specials)
    b.board = np.stack([colour, kind]).astype(np.int32)
    coords, names, colours = b.detect_colour_matches()
    return (
        [[tuple(map(int, c)) for c in m] for m in coords],
        [NAME_TO_CODE[n] for n in names],
        [int(c) for c in colours],
    )


def ours_matches(colour, kind, spec_key):
    m = _jitted(colour.shape[0], colour.shape[1], spec_key)(
        np.asarray(colour, np.int32), np.asarray(kind, np.int32)
    )
    count = int(m.count)
    coords = np.asarray(m.coords)
    length = np.asarray(m.length)
    out_coords = [
        [tuple(map(int, coords[i, j])) for j in range(int(length[i]))]
        for i in range(count)
    ]
    return (
        out_coords,
        [int(t) for t in np.asarray(m.mtype)[:count]],
        [int(c) for c in np.asarray(m.mcolour)[:count]],
    )


def check(colour, kind=None, spec_keys=tuple(CONFIGS)):
    colour = np.asarray(colour, np.int32)
    if kind is None:
        kind = (colour > 0).astype(np.int32)
    kind = np.asarray(kind, np.int32)
    for sk in spec_keys:
        ref = ref_matches(colour, kind, sk)
        got = ours_matches(colour, kind, sk)
        assert got == ref, (
            f"specials={sk}\ncolour=\n{colour}\nref={ref}\ngot={got}"
        )


def test_plain_three():
    check([[1, 2, 1], [2, 1, 2], [3, 3, 3]])


def test_four_line_horizontal():
    check([[1, 2, 1, 2], [2, 1, 2, 1], [3, 3, 3, 3]])


def test_four_line_vertical():
    check([[3, 2, 1], [3, 1, 2], [3, 2, 1], [3, 1, 2], [1, 2, 1]])


def test_five_line_cookie():
    check([[1, 2, 1, 2, 1], [2, 1, 2, 1, 2], [3, 3, 3, 3, 3]])


def test_eight_line_cookie_remainder():
    check(
        [
            [1, 2, 1, 2, 1, 2, 1, 2],
            [2, 1, 2, 1, 2, 1, 2, 1],
            [3, 3, 3, 3, 3, 3, 3, 3],
        ]
    )


def test_t_shape_bomb():
    check(
        [
            [1, 2, 3, 2, 1],
            [2, 1, 3, 1, 2],
            [1, 2, 3, 2, 1],
            [2, 3, 3, 3, 2],
        ]
    )


def test_l_shape_bomb():
    check(
        [
            [3, 2, 1, 2],
            [3, 1, 2, 1],
            [3, 3, 3, 1],
        ]
    )


def test_cross_long():
    check(
        [
            [1, 2, 3, 2, 1],
            [2, 1, 3, 1, 2],
            [3, 3, 3, 3, 3],
            [2, 1, 3, 1, 2],
            [1, 2, 3, 2, 1],
        ]
    )


@pytest.mark.parametrize("seed", range(60))
@pytest.mark.parametrize("shape,colours", [((5, 5), 2), ((6, 6), 2), ((8, 8), 3), ((10, 10), 3), ((4, 9), 2)])
def test_fuzz(seed, shape, colours):
    rng = np.random.default_rng(seed * 104729 + shape[0] * 13 + colours)
    colour = rng.integers(1, colours + 1, size=shape).astype(np.int32)
    kind = np.ones(shape, np.int32)
    sk = list(CONFIGS)[seed % len(CONFIGS)]
    check(colour, kind, spec_keys=(sk,))

"""Differential tests: activation machine, match resolution, combinations.

Oracles: `board.py:473-556` (activate_special), `board.py:397-471` +
`572-597` (resolve_colour_matches), `board.py:600-726` (combination_match).
Exact board + counter equality.
"""

import functools

import jax
import numpy as np
import pytest

from tests.oracle import make_ref_board

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.ops.activate import machine_init, push_frame, run_machine
from tile_match_tpu.ops.classify import process_colour_lines
from tile_match_tpu.ops.combination import combination_match, is_combination
from tile_match_tpu.ops.lines import get_colour_lines
from tile_match_tpu.ops.resolve import resolve_colour_matches

SPECIALS = (["cookie"], ["vertical_laser", "horizontal_laser", "bomb"])


def _ref_board(colour, kind, num_colours):
    R, C = colour.shape
    b = make_ref_board(R, C, num_colours, *SPECIALS)
    b.board = np.stack([colour, kind]).astype(np.int32)
    b.num_specials_activated = 0
    b.num_new_specials = 0
    return b


@functools.lru_cache(maxsize=None)
def _jit_activate(R, C, K):
    cfg = EnvConfig(num_rows=R, num_cols=C, num_colours=K)

    @jax.jit
    def fn(col, kn, r, c):
        st = machine_init(cfg, col, kn, 0)
        st = push_frame(st, kn[r, c], r, c, 1, pred=True, idx=-1)
        st = run_machine(cfg, st)
        return st[0], st[1], st[2]

    return fn


@functools.lru_cache(maxsize=None)
def _jit_resolve(R, C, K):
    cfg = EnvConfig(num_rows=R, num_cols=C, num_colours=K)

    @jax.jit
    def fn(col, kn):
        ls = get_colour_lines(cfg, col, kn)
        m = process_colour_lines(cfg, col, ls)
        return resolve_colour_matches(cfg, col, kn, m)

    return fn


@functools.lru_cache(maxsize=None)
def _jit_combo(R, C, K):
    cfg = EnvConfig(num_rows=R, num_cols=C, num_colours=K)

    @jax.jit
    def fn(col, kn, c1, c2):
        return combination_match(cfg, col, kn, c1, c2)

    return fn


def _rand_special_board(rng, shape, colours, n_specials, cookie_prob=0.25):
    colour = rng.integers(1, colours + 1, size=shape).astype(np.int32)
    kind = np.ones(shape, np.int32)
    for _ in range(n_specials):
        r, c = rng.integers(0, shape[0]), rng.integers(0, shape[1])
        if rng.random() < cookie_prob:
            kind[r, c] = -1
            colour[r, c] = 0
        else:
            kind[r, c] = int(rng.choice([2, 3, 4]))
    return colour, kind


# ---------------------------------------------------------------------------
# activate_special chains
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", range(120))
def test_activation_fuzz(seed):
    rng = np.random.default_rng(seed + 11)
    shape = [(4, 4), (5, 7), (8, 8)][seed % 3]
    colours = [2, 3, 4][seed % 3]
    colour, kind = _rand_special_board(rng, shape, colours, rng.integers(1, 9))
    specials = np.argwhere((kind != 0) & (kind != 1))
    if len(specials) == 0:
        return
    r, c = specials[rng.integers(0, len(specials))]

    ref = _ref_board(colour, kind, colours)
    ref.activate_special((int(r), int(c)), int(kind[r, c]), int(colour[r, c]))

    col2, kn2, cnt = _jit_activate(*shape, colours)(colour, kind, int(r), int(c))
    assert np.array_equal(np.asarray(col2), ref.board[0]), (
        f"seed={seed} at ({r},{c}) kind={kind[r, c]}\n{colour}\n{kind}\n"
        f"ref=\n{ref.board[0]}\ngot=\n{np.asarray(col2)}"
    )
    assert np.array_equal(np.asarray(kn2), ref.board[1])
    assert int(cnt) == ref.num_specials_activated


def test_activation_empty_colour_board():
    # all-colourless board → activation is a silent no-op (`board.py:487-489`)
    colour = np.zeros((3, 3), np.int32)
    kind = np.zeros((3, 3), np.int32)
    kind[1, 1] = -1
    ref = _ref_board(colour, kind, 3)
    ref.activate_special((1, 1), -1, 0)
    col2, kn2, cnt = _jit_activate(3, 3, 3)(colour, kind, 1, 1)
    assert np.array_equal(np.asarray(col2), ref.board[0])
    assert np.array_equal(np.asarray(kn2), ref.board[1])
    assert int(cnt) == ref.num_specials_activated == 0


# ---------------------------------------------------------------------------
# full resolve (detect → classify → resolve incl. special creation)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("seed", range(150))
def test_resolve_fuzz(seed):
    rng = np.random.default_rng(seed * 37 + 5)
    shape = [(5, 5), (6, 6), (8, 8), (4, 9)][seed % 4]
    colours = [2, 2, 3][seed % 3]
    colour, kind = _rand_special_board(
        rng, shape, colours, int(rng.integers(0, 6))
    )

    ref = _ref_board(colour, kind, colours)
    locs, types, cols = ref.detect_colour_matches()
    if len(locs) == 0:
        return
    ref.resolve_colour_matches(locs, types, cols)

    col2, kn2, act, new, _ovf = _jit_resolve(*shape, colours)(colour, kind)
    assert np.array_equal(np.asarray(col2), ref.board[0]), (
        f"seed={seed}\ncolour=\n{colour}\nkind=\n{kind}\n"
        f"ref=\n{ref.board[0]}\ngot=\n{np.asarray(col2)}"
    )
    assert np.array_equal(np.asarray(kn2), ref.board[1]), (
        f"seed={seed}\ncolour=\n{colour}\nkind=\n{kind}\n"
        f"ref=\n{ref.board[1]}\ngot=\n{np.asarray(kn2)}"
    )
    assert int(act) == ref.num_specials_activated
    assert int(new) == ref.num_new_specials


# ---------------------------------------------------------------------------
# combination matches
# ---------------------------------------------------------------------------
KIND_PAIRS = [
    (-1, -1),
    (-1, 1),
    (1, -1),
    (-1, 2),
    (3, -1),
    (-1, 4),
    (2, 2),
    (2, 3),
    (3, 2),
    (3, 3),
    (4, 2),
    (3, 4),
    (4, 4),
]


@pytest.mark.parametrize("pair_i", range(len(KIND_PAIRS)))
@pytest.mark.parametrize("seed", range(12))
def test_combination_fuzz(pair_i, seed):
    k1, k2 = KIND_PAIRS[pair_i]
    rng = np.random.default_rng(seed * 997 + pair_i)
    shape = [(5, 5), (6, 8), (4, 4)][seed % 3]
    colours = 3
    colour, kind = _rand_special_board(
        rng, shape, colours, int(rng.integers(0, 5))
    )
    # place the pair adjacently (random orientation/position)
    if seed % 2 == 0:
        r = int(rng.integers(0, shape[0] - 1))
        c = int(rng.integers(0, shape[1]))
        c1, c2 = (r, c), (r + 1, c)
    else:
        r = int(rng.integers(0, shape[0]))
        c = int(rng.integers(0, shape[1] - 1))
        c1, c2 = (r, c), (r, c + 1)
    for (rr, cc), kk in [(c1, k1), (c2, k2)]:
        kind[rr, cc] = kk
        colour[rr, cc] = 0 if kk == -1 else max(1, colour[rr, cc])

    ref = _ref_board(colour, kind, colours)
    ref.combination_match(c1, c2)

    col2, kn2, act, _ovf = _jit_combo(*shape, colours)(
        colour, kind, np.array(c1, np.int32), np.array(c2, np.int32)
    )
    assert np.array_equal(np.asarray(col2), ref.board[0]), (
        f"pair={k1, k2} seed={seed} at {c1}-{c2}\ncolour=\n{colour}\nkind=\n{kind}\n"
        f"ref=\n{ref.board[0]}\ngot=\n{np.asarray(col2)}"
    )
    assert np.array_equal(np.asarray(kn2), ref.board[1])
    assert int(act) == ref.num_specials_activated, (
        f"pair={k1, k2} seed={seed}: act {int(act)} vs {ref.num_specials_activated}"
    )

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


# ---------------------------------------------------------------------------
# effective_mask_settled: the engine's cheap stencil kernel must equal BOTH
# the windowed kernel and the reference sweep on line-free boards (the only
# boards the engine evaluates masks on — see the kernel docstring).
# ---------------------------------------------------------------------------

from tile_match_tpu.ops.effective import effective_mask_settled  # noqa: E402


def _has_run(colour):
    h = (
        (colour[:, :-2] == colour[:, 1:-1])
        & (colour[:, 1:-1] == colour[:, 2:])
        & (colour[:, :-2] != 0)
    )
    v = (
        (colour[:-2, :] == colour[1:-1, :])
        & (colour[1:-1, :] == colour[2:, :])
        & (colour[:-2, :] != 0)
    )
    return bool(h.any() or v.any())


@functools.lru_cache(maxsize=None)
def _jitted_settled(R, C, any_special):
    if any_special:
        cfg = EnvConfig(num_rows=R, num_cols=C, num_colours=8)
    else:
        cfg = EnvConfig.create(R, C, 8, 10, colourless_specials=(),
                               colour_specials=())
    return cfg, jax.jit(lambda col, kn: effective_mask_settled(cfg, col, kn))


def _line_free_board(rng, shape, colours, n_specials):
    """Rejection-sample a board with no >=3 same-colour run."""
    while True:
        colour = rng.integers(1, colours + 1, size=shape).astype(np.int32)
        if not _has_run(colour):
            break
    kind = np.ones(shape, np.int32)
    for _ in range(n_specials):
        r, c = rng.integers(0, shape[0]), rng.integers(0, shape[1])
        k = int(rng.choice([2, 3, 4, -1]))
        kind[r, c] = k
        if k == -1:
            colour[r, c] = 0  # cookies are colourless; cannot create a run
    return colour, kind


def check_settled(colour, kind, any_special=True):
    cfg, fn = _jitted_settled(*colour.shape, any_special)
    got = np.asarray(fn(colour, kind))
    want = ref_mask(colour, kind)
    assert np.array_equal(got, want), (
        f"settled mask diverges\ncolour=\n{colour}\nkind=\n{kind}\n"
        f"bad={np.nonzero(got != want)[0]}"
    )


@pytest.mark.parametrize("seed", range(150))
@pytest.mark.parametrize(
    "shape,colours", [((5, 5), 4), ((8, 8), 4), ((10, 10), 5), ((6, 9), 5)]
)
def test_settled_fuzz_line_free(seed, shape, colours):
    rng = np.random.default_rng(seed * 31 + shape[0])
    n_spec = int(rng.integers(0, 6)) if seed % 2 else 0
    colour, kind = _line_free_board(rng, shape, colours, n_spec)
    check_settled(colour, kind)


@pytest.mark.parametrize("seed", range(40))
def test_settled_fuzz_no_specials_cfg(seed):
    rng = np.random.default_rng(seed + 5000)
    colour, kind = _line_free_board(rng, (10, 10), 4, 0)
    check_settled(colour, kind, any_special=False)


def test_settled_edges_and_cookie_ends():
    # cookie at a run end blocks the stencil (kind < 0 on the last cell)
    colour = np.array(
        [
            [1, 2, 3, 4],
            [2, 1, 2, 3],
            [1, 1, 0, 4],
            [2, 3, 1, 2],
        ],
        np.int32,
    )
    kind = np.ones((4, 4), np.int32)
    kind[2, 2] = -1
    assert not _has_run(colour)
    check_settled(colour, kind)

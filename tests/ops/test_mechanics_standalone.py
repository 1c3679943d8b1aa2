"""Reference-FREE exact-board mechanic tests.

Replays `tests/mechanic_fixtures.json` — before/after grids and stats
recorded from the reference implementation by
`tools/gen_mechanic_fixtures.py` over hand-designed scenario boards — against
our kernels.  Unlike the differential suites (which execute the reference at
/root/reference as a live oracle) and the golden episodes (recorded from the
engine under test), these fixtures are reference-produced data checked with
no reference mount: the standalone counterpart of the reference's exact-board
suites (`tests/board/test_activation.py:9-434`,
`test_combination_match.py:6-417`, `test_activation.py:437-543`).
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.ops.activate import machine_init, push_frame, run_machine
from tile_match_tpu.ops.combination import combination_match
from tile_match_tpu.ops.resolve import _creation_pos

_FIX = json.load(open(os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "mechanic_fixtures.json")))


def _cfg(fx):
    return EnvConfig.create(
        fx["rows"], fx["cols"], fx["colours"], 10,
        colourless_specials=("cookie",),
        colour_specials=("vertical_laser", "horizontal_laser", "bomb"),
    )


def _boards(fx):
    col, kin = (np.asarray(ch, np.int32) for ch in fx["before"])
    return jnp.asarray(col), jnp.asarray(kin)


@pytest.mark.parametrize(
    "fx", _FIX["activation"], ids=[f["name"] for f in _FIX["activation"]]
)
def test_activation_exact_board(fx):
    cfg = _cfg(fx)
    col, kin = _boards(fx)
    r, c = fx["coord"]

    def run(col, kin):
        st = machine_init(cfg, col, kin, 0)
        st = push_frame(st, kin[r, c], r, c, 1, pred=True, idx=-1)
        st = run_machine(cfg, st)
        return st[0], st[1], st[2]

    out_col, out_kin, count = jax.jit(run)(col, kin)
    want_col, want_kin = (np.asarray(ch, np.int32) for ch in fx["after"])
    assert np.array_equal(np.asarray(out_col), want_col), fx["name"]
    assert np.array_equal(np.asarray(out_kin), want_kin), fx["name"]
    assert int(count) == fx["num_specials_activated"], fx["name"]


@pytest.mark.parametrize(
    "fx", _FIX["combination"], ids=[f["name"] for f in _FIX["combination"]]
)
def test_combination_exact_board(fx):
    cfg = _cfg(fx)
    col, kin = _boards(fx)
    c1 = jnp.asarray(fx["coord1"], jnp.int32)
    c2 = jnp.asarray(fx["coord2"], jnp.int32)
    out_col, out_kin, act, _ovf = jax.jit(
        lambda col, kin: combination_match(cfg, col, kin, c1, c2)
    )(col, kin)
    want_col, want_kin = (np.asarray(ch, np.int32) for ch in fx["after"])
    assert np.array_equal(np.asarray(out_col), want_col), fx["name"]
    assert np.array_equal(np.asarray(out_kin), want_kin), fx["name"]
    assert int(act) == fx["num_specials_activated"], fx["name"]


@pytest.mark.parametrize(
    "fx", _FIX["creation_pos"], ids=[f["name"] for f in _FIX["creation_pos"]]
)
def test_creation_pos_exact(fx):
    cfg = _cfg(fx)
    CM = cfg.match_coords_max
    coords = np.full((CM, 2), -1, np.int32)
    n = len(fx["coords"])
    coords[:n] = np.asarray(fx["coords"], np.int32)
    taken = np.zeros((fx["rows"], fx["cols"]), bool)
    for r, c in fx["taken"]:
        taken[r, c] = True
    pos = jax.jit(
        lambda coords, taken: _creation_pos(
            cfg, coords, jnp.int32(n), jnp.asarray(not fx["straight"]), taken
        )
    )(jnp.asarray(coords), jnp.asarray(taken))
    assert list(np.asarray(pos)) == fx["pos"], fx["name"]

"""Differential-test oracle: import the read-only reference implementation.

The reference depends on numba, which is not installed in this image; its two
``@njit`` functions are plain numpy code, so a no-op ``njit`` shim suffices.
The reference is used ONLY as a black-box oracle for behavioural comparison —
never as a source of code.
"""

from __future__ import annotations

import os
import sys
import types

import pytest

REF_PATH = "/root/reference/src"


def _require_reference():
    if not os.path.isdir(REF_PATH):
        pytest.skip("reference implementation not mounted at /root/reference")


def _install_numba_shim() -> None:
    if "numba" in sys.modules:
        return
    numba = types.ModuleType("numba")

    def njit(f=None, **kw):
        if callable(f):
            return f
        return lambda g: g

    class _AnyAttr:
        def __getattr__(self, name):
            return lambda *a, **k: None

    numba.njit = njit
    numba.types = _AnyAttr()
    numba.typeof = lambda x: None
    sys.modules["numba"] = numba


def get_ref_board_module():
    _require_reference()
    _install_numba_shim()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import tile_match_gym.board as ref_board  # noqa: PLC0415

    return ref_board


def get_ref_env_module():
    _require_reference()
    _install_numba_shim()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import tile_match_gym.tile_match_env as ref_env  # noqa: PLC0415

    return ref_env


def make_ref_board(num_rows, num_cols, num_colours, colourless, colour_specials, seed=0):
    m = get_ref_board_module()
    import numpy as np

    return m.Board(
        num_rows,
        num_cols,
        num_colours,
        list(colourless),
        list(colour_specials),
        np.random.default_rng(seed),
    )

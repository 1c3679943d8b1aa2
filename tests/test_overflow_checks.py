"""Capacity-cap truncation is observable under ``debug_checks``.

The engine bounds every reference-unbounded structure (line queue, classify
append queue, activation stack, activation step budget — vs the reference's
free Python lists and recursion, `board.py:269-327, 473-556`).  With
``EnvConfig.debug_checks=True`` each silent-truncation point carries a
``checkify.check``; these tests force each cap to overflow and assert the
check fires, plus that well-within-cap boards raise nothing.
"""

import dataclasses

import numpy as np
import pytest
from jax.experimental import checkify

import jax.numpy as jnp

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.ops.activate import (
    OP_V_LASER,
    machine_init,
    push_frame,
    run_machine,
)
from tile_match_tpu.ops.classify import process_colour_lines
from tile_match_tpu.ops.lines import LineSet, get_colour_lines

pytestmark = pytest.mark.smoke


def _err_msg(err):
    try:
        err.throw()
    except Exception as e:  # checkify.JaxRuntimeError
        return str(e)
    return ""


def _no_line_filler(R, C):
    """A match-free colour grid (period-2 checker of 3 colours)."""
    r = np.arange(R)[:, None]
    c = np.arange(C)[None, :]
    return ((r % 2) * 2 + (c % 2)) % 3 + 1


def test_lines_max_overflow_fires():
    cfg = EnvConfig(5, 5, 4, max_lines=1, debug_checks=True)
    colour = _no_line_filler(5, 5)
    colour[2:5, 0] = 4
    colour[2:5, 2] = 4
    kind = np.ones((5, 5), np.int32)
    err, _ = checkify.checkify(
        lambda c, k: get_colour_lines(cfg, c, k)
    )(jnp.asarray(colour), jnp.asarray(kind))
    assert "lines_max overflow" in _err_msg(err)


def test_lines_within_cap_clean():
    cfg = EnvConfig(5, 5, 4, debug_checks=True)
    colour = _no_line_filler(5, 5)
    colour[2:5, 0] = 4
    kind = np.ones((5, 5), np.int32)
    err, ls = checkify.checkify(
        lambda c, k: get_colour_lines(cfg, c, k)
    )(jnp.asarray(colour), jnp.asarray(kind))
    assert _err_msg(err) == ""
    assert int(ls.count) == 1


def _chain_board():
    """All-normal colour-1 board with a v-laser at (2,2) and a bomb at (0,2)."""
    colour = np.ones((5, 5), np.int32)
    kind = np.ones((5, 5), np.int32)
    kind[2, 2] = 2  # vertical laser
    kind[0, 2] = 4  # bomb
    return jnp.asarray(colour), jnp.asarray(kind)


def _run_chain(cfg):
    colour, kind = _chain_board()
    st = machine_init(cfg, colour, kind)
    st = push_frame(st, OP_V_LASER, 2, 2, counted=1)
    return run_machine(cfg, st)


def test_stack_max_overflow_fires():
    cfg = EnvConfig(5, 5, 4, max_stack=1, debug_checks=True)
    err, _ = checkify.checkify(lambda: _run_chain(cfg))()
    assert "stack_max overflow" in _err_msg(err)


def test_activation_steps_truncation_fires():
    cfg = EnvConfig(5, 5, 4, max_activation_steps=1, debug_checks=True)
    err, _ = checkify.checkify(lambda: _run_chain(cfg))()
    assert "activation_steps_max exceeded" in _err_msg(err)


def test_activation_within_caps_clean():
    cfg = EnvConfig(5, 5, 4, debug_checks=True)
    err, st = checkify.checkify(lambda: _run_chain(cfg))()
    assert _err_msg(err) == ""
    assert int(st[-1]) == 0  # stack drained


def test_classify_append_overflow_fires():
    # Only SHARED lines run through the queue machine (independent lines
    # classify vectorially with no append budget), so the overflow needs two
    # crossing 13-long cookie lines.  LM=2 → LM2=4: both pop as cookies and
    # re-append their 8-long remainders (atail 2→4); the first remainder
    # then needs a third append (rem 3 > 2) with the queue full → check
    # fires.
    cfg = EnvConfig(13, 13, 2, max_lines=2, debug_checks=True)
    L = cfg.line_len_max
    colour = np.full((13, 13), 2, np.int32)
    colour[:, 0] = 1  # vertical 13-line at col 0
    colour[6, :] = 1  # horizontal 13-line at row 6 (crosses at (6, 0))
    coords = np.full((2, L, 2), -1, np.int32)
    coords[0, :13, 0] = np.arange(13)
    coords[0, :13, 1] = 0
    coords[1, :13, 0] = 6
    coords[1, :13, 1] = np.arange(13)
    ls = LineSet(
        coords=jnp.asarray(coords),
        length=jnp.asarray([13, 13], jnp.int32),
        count=jnp.int32(2),
    )
    err, _ = checkify.checkify(
        lambda c: process_colour_lines(cfg, c, ls)
    )(jnp.asarray(colour))
    assert "classify queue overflow" in _err_msg(err)


def test_truncated_flag_set_on_cascade_cap():
    """StepInfo.truncated observes cap truncation WITHOUT debug_checks:
    max_cascades=0 leaves the post-swap match unresolved → flag set."""
    import jax
    from tile_match_tpu.engine import reset, step

    cfg = EnvConfig(5, 5, 3, num_moves=10, max_cascades=0)
    state, info = reset(cfg, jax.random.PRNGKey(0))
    assert not bool(info.truncated)
    action = int(np.flatnonzero(np.asarray(info.effective_actions))[0])
    _, _, _, info2 = jax.jit(lambda s, a: step(cfg, s, a))(
        state, jnp.int32(action)
    )
    assert bool(info2.truncated)


def test_truncated_flag_clean_on_normal_step():
    import jax
    from tile_match_tpu.engine import reset, step

    cfg = EnvConfig.create(
        5, 5, 3, 10,
        colourless_specials=("cookie",),
        colour_specials=("vertical_laser", "horizontal_laser", "bomb"),
    )
    state, info = reset(cfg, jax.random.PRNGKey(1))
    assert not bool(info.truncated)
    stepf = jax.jit(lambda s, a: step(cfg, s, a))
    for _ in range(5):
        mask = np.asarray(info.effective_actions)
        action = int(np.flatnonzero(mask)[0]) if mask.any() else 0
        state, _, _, info = stepf(state, jnp.int32(action))
        assert not bool(info.truncated)


def test_checked_step_catches_cascade_truncation():
    """max_cascades=0 leaves the post-swap match unresolved; the
    checked_step post-invariant ("matches remain after step") fires."""
    from tile_match_tpu import debug
    from tile_match_tpu.engine import reset
    from tile_match_tpu.ops.effective import effective_mask
    import jax

    cfg = EnvConfig(5, 5, 3, num_moves=10, max_cascades=0)
    state, info = reset(cfg, jax.random.PRNGKey(0))
    action = int(np.flatnonzero(np.asarray(info.effective_actions))[0])
    err, _ = debug.checked_step(cfg)(state, jnp.int32(action))
    assert "matches remain" in _err_msg(err)

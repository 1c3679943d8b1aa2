"""Debug-mode invariant checks.

The reference ships its invariants as commented-out asserts
(`board.py:111-112, 393-394, 581-582`); here they are explicit validators —
host-side (`validate_state`) for tests/debugging and ``checkify``-based
(`checked_step`) for catching violations inside jitted code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify

from .config import EnvConfig
from .ops.effective import possible_move
from .ops.lines import has_any_line


def validate_state(cfg: EnvConfig, colour, kind, after_reset: bool = True):
    """Host-side structural invariants; raises AssertionError with context."""
    colour = np.asarray(colour)
    kind = np.asarray(kind)
    assert colour.shape == (cfg.num_rows, cfg.num_cols)
    assert ((colour >= 0) & (colour <= cfg.num_colours)).all(), "colour range"
    assert np.isin(kind, [-1, 0, 1, 2, 3, 4]).all(), "kind range"
    # channel coupling: coloured ⟺ normal/colour-special; colourless ⟺
    # empty/cookie (`board.py:7-25` contract)
    assert ((colour > 0) == (kind > 0)).all(), "colour/kind coupling"
    if after_reset:
        assert not ((colour == 0) & (kind == 0)).any(), "no empty cells"
        jc, jk = jnp.asarray(colour), jnp.asarray(kind)
        assert not bool(has_any_line(cfg, jc, jk)), "board has matches"
        assert bool(possible_move(cfg, jc, jk)), "no possible move"


def checked_step(cfg: EnvConfig):
    """A checkify-wrapped step asserting post-step invariants on device.

    Returns fn(state, action) -> (err, (next_state, reward, done, info));
    call ``err.throw()`` (host) to surface violations.

    The step runs with ``debug_checks=True``, so every capacity-cap
    truncation point inside the kernels (line-queue overflow, classify
    append drop, activation stack overflow / step-budget truncation) raises
    instead of silently corrupting; cascade/regeneration-cap truncation is
    caught by the post-step invariants below (leftover matches / no
    possible move).
    """
    import dataclasses

    from .engine import step

    cfg = dataclasses.replace(cfg, debug_checks=True)

    def _step(state, action):
        next_state, reward, done, info = step(cfg, state, action)
        checkify.check(
            jnp.all((next_state.colour > 0) == (next_state.kind > 0)),
            "colour/kind coupling violated",
        )
        checkify.check(
            ~has_any_line(cfg, next_state.colour, next_state.kind),
            "matches remain after step",
        )
        checkify.check(
            possible_move(cfg, next_state.colour, next_state.kind) | done,
            "no possible move after step",
        )
        return next_state, reward, done, info

    return checkify.checkify(_step)

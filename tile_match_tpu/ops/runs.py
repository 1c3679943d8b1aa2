"""Run-extent primitives: per-cell extents of maximal equal-colour runs.

These replace the reference's per-cell Python while-loops in
``get_colour_lines`` (`board.py:158-193`) with cumulative-max scans, so all
rows/columns are processed at once and everything stays fixed-shape under
``jit``/``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Large sentinel for masked argmin/argsort keys. Plain Python int: module
# import must not touch a device (and jnp ops fold it into the program).
BIG = 1 << 30


def _iota_like(x, axis):
    return jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)


def _shift(x, axis, offset, fill):
    """Shift ``x`` along ``axis`` by ``offset`` (positive → toward higher
    index), filling vacated entries with ``fill``."""
    pad = [(0, 0)] * x.ndim
    if offset > 0:
        pad[axis] = (offset, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, x.shape[axis])
        return jnp.pad(x, pad, constant_values=fill)[tuple(sl)]
    else:
        pad[axis] = (0, -offset)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(-offset, x.shape[axis] - offset)
        return jnp.pad(x, pad, constant_values=fill)[tuple(sl)]


def colour_run_extents(colour, axis):
    """Per-cell (start, end, length) of the maximal run of equal non-zero
    colour containing the cell, along ``axis``.

    Zero-colour cells (empty / cookie, `board.py:7-16`) never join runs —
    consistent with the reference where line membership requires colour
    equality with a colour>0 start cell (`board.py:163-171`).
    Values at zero-colour cells are (i, i, 1) and must be masked by callers.
    """
    valid = colour > 0
    idx = _iota_like(colour, axis)

    prev = _shift(colour, axis, 1, -1)
    same_prev = (colour == prev) & valid
    is_start = ~same_prev  # includes invalid cells; position 0 always a start
    start = jax.lax.cummax(jnp.where(is_start, idx, -1), axis=axis)

    nxt = _shift(colour, axis, -1, -1)
    same_next = (colour == nxt) & valid
    is_end = ~same_next
    end = jax.lax.cummin(jnp.where(is_end, idx, BIG), axis=axis, reverse=True)

    return start, end, end - start + 1


def true_run_extents(flag, axis):
    """Per-cell (start, end) of the maximal run of True containing the cell."""
    idx = _iota_like(flag, axis)
    prev = _shift(flag, axis, 1, False)
    is_start = flag & ~prev
    start = jax.lax.cummax(jnp.where(is_start, idx, -1), axis=axis)
    nxt = _shift(flag, axis, -1, False)
    is_end = flag & ~nxt
    end = jax.lax.cummin(jnp.where(is_end, idx, BIG), axis=axis, reverse=True)
    return start, end

"""Batched effective-move mask.

Replaces the reference's per-action ``is_move_effective`` njit function
(`board.py:735-787`) — which is called O(num_actions) times per step from
``possible_move`` (`board.py:566-567`) and ``_get_effective_actions``
(`tile_match_env.py:122-123`) and dominates reference runtime — with ONE
gather + shifted-equality kernel producing the full bool[num_actions] mask.

Exact semantics replicated per action (coord1 above/left of coord2):
  * both coords special (kind ∉ {0,1})                      → effective
  * either coord a colourless special (kind < 0)            → effective
  * else swap, and look for any 3-run of equal colour inside the clipped
    window [min-2, max+2] around the swap, where the *last* cell of the run
    (rightmost / bottom) has kind >= 0 — including the reference's quirk of
    counting pre-existing runs in the window that don't involve the swap.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..config import EnvConfig
from ..state import action_table


@functools.lru_cache(maxsize=None)
def _window_tables(cfg: EnvConfig):
    """Static per-action 6x6 window gather indices + validity masks."""
    R, C = cfg.num_rows, cfg.num_cols
    c1, c2 = action_table(cfg)
    r_lo = np.minimum(c1[:, 0], c2[:, 0]) - 2
    c_lo = np.minimum(c1[:, 1], c2[:, 1]) - 2
    r_hi = np.maximum(c1[:, 0], c2[:, 0]) + 2
    c_hi = np.maximum(c1[:, 1], c2[:, 1]) + 2
    rows = r_lo[:, None, None] + np.arange(6)[None, :, None]
    cols = c_lo[:, None, None] + np.arange(6)[None, None, :]
    rows = np.broadcast_to(rows, rows.shape[:1] + (6, 6))
    cols = np.broadcast_to(cols, cols.shape[:1] + (6, 6))
    in_board = (rows >= 0) & (rows < R) & (cols >= 0) & (cols < C)
    in_win = (rows <= r_hi[:, None, None]) & (cols <= c_hi[:, None, None])
    valid = in_board & in_win
    flat = np.clip(rows, 0, R - 1) * C + np.clip(cols, 0, C - 1)
    flat1 = c1[:, 0] * C + c1[:, 1]
    flat2 = c2[:, 0] * C + c2[:, 1]
    n_down = C * (R - 1)
    # NOTE: cache numpy, not jnp — device constants created inside one jit
    # trace must not leak into another.
    return (
        flat.astype(np.int32),
        valid,
        flat1.astype(np.int32),
        flat2.astype(np.int32),
        n_down,
    )


def _swap_in_windows(w, n_down):
    """Exchange the two swapped cells inside each window.

    coord1 sits at window position (2,2) for every action; coord2 at (3,2)
    for down-swaps (the first n_down actions) and (2,3) for right-swaps.
    """
    d, r = w[:n_down], w[n_down:]
    d22, d32 = d[:, 2, 2], d[:, 3, 2]
    d = d.at[:, 2, 2].set(d32).at[:, 3, 2].set(d22)
    r22, r23 = r[:, 2, 2], r[:, 2, 3]
    r = r.at[:, 2, 2].set(r23).at[:, 2, 3].set(r22)
    return jnp.concatenate([d, r], axis=0)


def effective_mask(cfg: EnvConfig, colour, kind) -> jnp.ndarray:
    """bool[num_actions]: which swaps would do anything (`board.py:735-787`)."""
    flat_np, valid_np, flat1_np, flat2_np, n_down = _window_tables(cfg)
    flat = jnp.asarray(flat_np)
    valid = jnp.asarray(valid_np)
    flat1 = jnp.asarray(flat1_np)
    flat2 = jnp.asarray(flat2_np)
    colf = colour.reshape(-1)
    kinf = kind.reshape(-1)

    k1 = kinf[flat1]
    k2 = kinf[flat2]
    both_special = ((k1 != 0) & (k1 != 1)) & ((k2 != 0) & (k2 != 1))
    any_cookie = (k1 < 0) | (k2 < 0)

    colw = _swap_in_windows(colf[flat], n_down)
    kinw = _swap_in_windows(kinf[flat], n_down)

    h3 = (
        (colw[:, :, :-2] == colw[:, :, 1:-1])
        & (colw[:, :, 1:-1] == colw[:, :, 2:])
        & valid[:, :, :-2]
        & valid[:, :, 1:-1]
        & valid[:, :, 2:]
        & (kinw[:, :, 2:] >= 0)
    )
    v3 = (
        (colw[:, :-2, :] == colw[:, 1:-1, :])
        & (colw[:, 1:-1, :] == colw[:, 2:, :])
        & valid[:, :-2, :]
        & valid[:, 1:-1, :]
        & valid[:, 2:, :]
        & (kinw[:, 2:, :] >= 0)
    )
    win_match = jnp.any(h3, axis=(1, 2)) | jnp.any(v3, axis=(1, 2))
    return both_special | any_cookie | win_match


def possible_move(cfg: EnvConfig, colour, kind) -> jnp.ndarray:
    """``board.py:558-569`` — any action effective?"""
    return jnp.any(effective_mask(cfg, colour, kind))

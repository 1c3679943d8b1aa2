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
    """Static gather/compare tables, laid out **actions-on-lanes**.

    Each action's clipped 6x6 window is flattened to 36 positions and stored
    as column `a` of a [36, A] table, so the per-board gathered windows are
    [36, A] (A ≈ 2RC on the 128-lane axis) instead of [A, 6, 6] — the latter
    tiles as T(8,128) over the trailing 6x6 and pads 28x, which both blew HBM
    at large batch*scan and wasted >95% of every vector op.

    The 48 possible 3-runs inside a 6x6 window (24 horizontal + 24 vertical)
    become static index triples (a, b, c) into the 36 axis, with their
    validity (in-board and in the reference's clipped [min-2, max+2] window,
    `board.py:747-756`) precomputed per (triple, action).
    """
    R, C = cfg.num_rows, cfg.num_cols
    c1, c2 = action_table(cfg)
    A = len(c1)
    r_lo = np.minimum(c1[:, 0], c2[:, 0]) - 2
    c_lo = np.minimum(c1[:, 1], c2[:, 1]) - 2
    r_hi = np.maximum(c1[:, 0], c2[:, 0]) + 2
    c_hi = np.maximum(c1[:, 1], c2[:, 1]) + 2
    rows = r_lo[:, None, None] + np.arange(6)[None, :, None]
    cols = c_lo[:, None, None] + np.arange(6)[None, None, :]
    rows = np.broadcast_to(rows, (A, 6, 6))
    cols = np.broadcast_to(cols, (A, 6, 6))
    in_board = (rows >= 0) & (rows < R) & (cols >= 0) & (cols < C)
    in_win = (rows <= r_hi[:, None, None]) & (cols <= c_hi[:, None, None])
    valid = (in_board & in_win).reshape(A, 36)
    flat = (np.clip(rows, 0, R - 1) * C + np.clip(cols, 0, C - 1)).reshape(A, 36)

    # 3-run triples over the 6x6 window, as flat positions in 0..35.
    tri = []
    for i in range(6):
        for j in range(4):
            p = i * 6 + j
            tri.append((p, p + 1, p + 2))  # horizontal
    for i in range(4):
        for j in range(6):
            p = i * 6 + j
            tri.append((p, p + 6, p + 12))  # vertical
    tri = np.asarray(tri, np.int32)  # [48, 3]
    valid_tri = (
        valid[:, tri[:, 0]] & valid[:, tri[:, 1]] & valid[:, tri[:, 2]]
    ).T  # [48, A]

    flat1 = c1[:, 0] * C + c1[:, 1]
    flat2 = c2[:, 0] * C + c2[:, 1]
    n_down = C * (R - 1)

    # Selection matrix for the window gather as an MXU matmul: TPU lowers the
    # [36, A] dynamic-looking gather into a painfully slow loop, while
    # board @ S (S one-hot, [R*C, 36*A]) is a tiny systolic-array matmul with
    # bit-exact small-int results in bf16.
    sel = np.zeros((R * C, 36 * A), np.float32)
    flatT = flat.T  # [36, A]
    for w in range(36):
        sel[flatT[w], np.arange(A) + w * A] = 1.0
    # Swap-cell selectors, same trick: [R*C, A] one-hot columns.
    sel1 = np.zeros((R * C, A), np.float32)
    sel1[flat1, np.arange(A)] = 1.0
    sel2 = np.zeros((R * C, A), np.float32)
    sel2[flat2, np.arange(A)] = 1.0

    # NOTE: cache numpy, not jnp — device constants created inside one jit
    # trace must not leak into another.
    return (
        np.ascontiguousarray(flat.T.astype(np.int32)),  # [36, A]
        valid_tri,  # [48, A]
        tri,  # [48, 3]
        flat1.astype(np.int32),
        flat2.astype(np.int32),
        n_down,
        sel,
        sel1,
        sel2,
    )


def _swap_in_windows(w, n_down):
    """Exchange the two swapped cells inside each [36, A] window table.

    coord1 sits at window position (2,2)=14 for every action; coord2 at
    (3,2)=20 for down-swaps (the first n_down actions) and (2,3)=15 for
    right-swaps.
    """
    d14, d20 = w[14, :n_down], w[20, :n_down]
    r14, r15 = w[14, n_down:], w[15, n_down:]
    w = w.at[14].set(jnp.concatenate([d20, r15]))
    w = w.at[20, :n_down].set(d14)
    w = w.at[15, n_down:].set(r14)
    return w


def effective_mask(cfg: EnvConfig, colour, kind) -> jnp.ndarray:
    """bool[num_actions]: which swaps would do anything (`board.py:735-787`).

    The window "gather" runs as a one-hot selection matmul on the MXU
    (board-vector x [R*C, 36*A] 0/1 matrix): bit-exact for the small integer
    tile values and orders of magnitude faster than TPU gather lowering.
    """
    (
        _flat_np,
        valid_tri_np,
        tri_np,
        _f1,
        _f2,
        n_down,
        sel_np,
        sel1_np,
        sel2_np,
    ) = _window_tables(cfg)
    A = cfg.num_actions
    valid_tri = jnp.asarray(valid_tri_np)
    sel = jnp.asarray(sel_np, jnp.bfloat16)
    sel1 = jnp.asarray(sel1_np, jnp.bfloat16)
    sel2 = jnp.asarray(sel2_np, jnp.bfloat16)
    colf = colour.reshape(-1).astype(jnp.bfloat16)
    kinf = kind.reshape(-1).astype(jnp.bfloat16)

    k1 = (kinf @ sel1).astype(jnp.int32)
    k2 = (kinf @ sel2).astype(jnp.int32)
    both_special = ((k1 != 0) & (k1 != 1)) & ((k2 != 0) & (k2 != 1))
    any_cookie = (k1 < 0) | (k2 < 0)

    colw = _swap_in_windows(
        (colf @ sel).astype(jnp.int32).reshape(36, A), n_down
    )
    kinw = _swap_in_windows(
        (kinf @ sel).astype(jnp.int32).reshape(36, A), n_down
    )

    a, b, c = tri_np[:, 0], tri_np[:, 1], tri_np[:, 2]
    run3 = (
        (colw[a] == colw[b])
        & (colw[b] == colw[c])
        & valid_tri
        & (kinw[c] >= 0)
    )  # [48, A]
    win_match = jnp.any(run3, axis=0)
    return both_special | any_cookie | win_match


def possible_move(cfg: EnvConfig, colour, kind) -> jnp.ndarray:
    """``board.py:558-569`` — any action effective?"""
    return jnp.any(effective_mask(cfg, colour, kind))

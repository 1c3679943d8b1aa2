"""Combination matches: the 9-way special+special / cookie interaction table.

Counterpart of ``combination_match`` (`board.py:600-719`).  Each case applies
its direct board edits, then seeds the activation stack machine with the
case's activation sequence (frames pushed in reverse execution order — the
stack is LIFO) and runs it to completion.  All seeded activations are
is_combination_match=True (uncounted, `board.py:498`); their recursive
children count normally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import (
    EnvConfig,
    KIND_BOMB,
    KIND_COOKIE,
    KIND_NORMAL,
)
from .activate import (
    OP_BOMB2,
    OP_H_LASER,
    OP_MASKSCAN,
    OP_V_LASER,
    machine_init,
    push_frame,
    run_machine,
)


def is_combination(kind, coord1, coord2):
    """`board.py:357-359`: both special, or at least one colourless special."""
    k1 = kind[coord1[0], coord1[1]]
    k2 = kind[coord2[0], coord2[1]]
    two_special = ((k1 != 0) & (k1 != 1)) & ((k2 != 0) & (k2 != 1))
    one_cookie = (k1 < 0) | (k2 < 0)
    return two_special | one_cookie


def combination_match(cfg: EnvConfig, colour, kind, coord1, coord2):
    """Execute a combination match.

    Returns (colour, kind, activated_delta, ovf) — ``ovf`` is the activation
    machine's sticky truncation flag (dropped frame / step budget).
    """
    R, C = cfg.num_rows, cfg.num_cols
    r1, c1 = coord1[0], coord1[1]
    r2, c2 = coord2[0], coord2[1]
    k1 = kind[r1, c1]
    k2 = kind[r2, c2]
    col1 = colour[r1, c1]
    col2 = colour[r2, c2]

    laser1 = (k1 == 2) | (k1 == 3)
    laser2 = (k2 == 2) | (k2 == 3)
    case_cc = (k1 == KIND_COOKIE) & (k2 == KIND_COOKIE)
    case_cn = ((k1 == KIND_COOKIE) & (k2 == KIND_NORMAL)) | (
        (k1 == KIND_NORMAL) & (k2 == KIND_COOKIE)
    )
    case_cs = ((k1 == KIND_COOKIE) & (k2 >= 2)) | ((k1 >= 2) & (k2 == KIND_COOKIE))
    case_ll = laser1 & laser2
    case_lb = ((k1 == KIND_BOMB) & laser2) | ((k2 == KIND_BOMB) & laser1)
    case_bb = (k1 == KIND_BOMB) & (k2 == KIND_BOMB)

    # normalise cookie-first for cn/cs (`board.py:620-623, 645-648`)
    cookie_is_1 = k1 == KIND_COOKIE
    cook_r = jnp.where(cookie_is_1, r1, r2)
    cook_c = jnp.where(cookie_is_1, c1, c2)
    other_k = jnp.where(cookie_is_1, k2, k1)
    other_col = jnp.where(cookie_is_1, col2, col1)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    cell1 = (row_ids == r1) & (col_ids == c1)
    cell2 = (row_ids == r2) & (col_ids == c2)
    cookie_cell = (row_ids == cook_r) & (col_ids == cook_c)

    # ---- direct edits -----------------------------------------------------
    # cookie+cookie wipes the whole board (`board.py:615-616`).
    wipe = case_cc
    # delete the cookie cell (cn: `board.py:626-628` — note the reference
    # deletes coord1 twice and never coord2 directly; the partner normal dies
    # via the colour mask below, so outcomes agree; cs: `board.py:650-651`).
    del_cookie = (case_cn | case_cs) & cookie_cell
    # delete both swap cells (ll/lb/bb: `board.py:664-666, 678-680, 700-702`).
    del_both = (case_ll | case_lb | case_bb) & (cell1 | cell2)
    # cn: delete all normals of the partner colour (`board.py:630-635`).
    del_norm = case_cn & (colour == other_col) & (kind == KIND_NORMAL)
    # cs: convert all normals of the partner colour to the partner special
    # type (`board.py:653-657`).
    convert = case_cs & (colour == other_col) & (kind == KIND_NORMAL)

    delete = wipe | del_cookie | del_both | del_norm
    new_colour = jnp.where(delete, 0, colour)
    new_kind = jnp.where(delete, 0, jnp.where(convert, other_k, kind))

    # ---- activation seeds (pushed in reverse execution order) -------------
    st = machine_init(cfg, new_colour, new_kind, 0)

    rmin = jnp.minimum(r1, r2)
    cmin = jnp.minimum(c1, c2)

    # bomb+bomb: one 5x5 sweep frame (`board.py:704-719`).
    st = push_frame(st, OP_BOMB2, rmin, cmin, 0, pred=case_bb, idx=0)

    # laser+laser: vertical then horizontal laser at (rmin, cmin)
    # (`board.py:668-674`) → push horizontal first.
    st = push_frame(st, OP_H_LASER, rmin, cmin, 0, pred=case_ll, idx=-1)
    st = push_frame(st, OP_V_LASER, rmin, cmin, 0, pred=case_ll, idx=-1)

    # laser+bomb: horizontal lasers on rows rmin-1..rmin+1 (clipped), then
    # vertical lasers on cols cmin-1..cmin+1 (`board.py:682-696`).
    # Execution order: HL(rmin-1), HL(rmin), HL(rmin+1), VL(cmin-1), VL(cmin),
    # VL(cmin+1) → push reversed.
    st = push_frame(
        st, OP_V_LASER, rmin, cmin + 1, 0, pred=case_lb & (cmin + 1 <= C - 1), idx=-1
    )
    st = push_frame(st, OP_V_LASER, rmin, cmin, 0, pred=case_lb, idx=-1)
    st = push_frame(
        st, OP_V_LASER, rmin, cmin - 1, 0, pred=case_lb & (cmin - 1 >= 0), idx=-1
    )
    st = push_frame(
        st, OP_H_LASER, rmin + 1, cmin, 0, pred=case_lb & (rmin + 1 <= R - 1), idx=-1
    )
    st = push_frame(st, OP_H_LASER, rmin, cmin, 0, pred=case_lb, idx=-1)
    st = push_frame(
        st, OP_H_LASER, rmin - 1, cmin, 0, pred=case_lb & (rmin - 1 >= 0), idx=-1
    )

    # cookie+normal / cookie+special: row-major scan of partner-colour
    # specials (`board.py:637-641, 659-660`).
    st = push_frame(
        st, OP_MASKSCAN, 0, 0, 0, pred=case_cn | case_cs, idx=0, fcolour=other_col
    )

    st = run_machine(cfg, st)
    colour_out, kind_out, chained = st[0], st[1], st[2]

    # `board.py:609` +2 in all cases; cookie+normal corrects by -1
    # (`board.py:641`).
    activated = 2 + chained - jnp.where(case_cn, 1, 0)
    return colour_out, kind_out, activated, st[-2]

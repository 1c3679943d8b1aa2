"""Special-tile activation as an explicit stack machine.

The reference activates specials with recursive Python DFS
(`board.py:473-556`): a laser wipes its row/column cell by cell, recursing
into any special it hits; a bomb does the same over a 3x3 box; a cookie picks
the most common colour *at activation time*, deletes its normals and then
activates its specials in row-major order.  Exact board outcomes depend on
this DFS order (the cookie's colour choice reads the board mid-recursion), so
an order-free fixed-point would not be bit-exact.

Here the recursion becomes an explicit stack of frames processed by a bounded
``lax.while_loop``.  Each micro-step batch-deletes the contiguous stretch of
non-special cells up to the next special in the frame's region (deleting a
normal has no side effects, so batching preserves DFS semantics exactly) and
pushes one recursion frame, so the step count is O(#specials activated), not
O(cells) — and every step is masked vector work that jits and vmaps.

Frame ops reuse the tile-kind codes for real specials and add two synthetic
ops used by combination matches (`board.py:600-726`):

* OP_MASKSCAN — ``activate_specials_in_mask`` (`board.py:721-726`): visit all
  current specials of a given colour in row-major order; children are
  *uncounted* (is_combination_match=True).
* OP_BOMB2 — the bomb+bomb 5x5 sweep (`board.py:699-719`): like a bomb with
  radius 2, but no entry actions and uncounted children.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import (
    EnvConfig,
    KIND_BOMB,
    KIND_COOKIE,
    KIND_H_LASER,
    KIND_NORMAL,
    KIND_V_LASER,
)
from .runs import BIG

OP_V_LASER = KIND_V_LASER  # 2
OP_H_LASER = KIND_H_LASER  # 3
OP_BOMB = KIND_BOMB  # 4
OP_COOKIE = KIND_COOKIE  # -1
OP_MASKSCAN = 5
OP_BOMB2 = 6

# Machine state tuple layout:
#   (colour, kind, count, f_op, f_r, f_c, f_idx, f_colour, f_counted, ovf, sp)
# where f_* are i32[stack_max] frame arrays, ovf is the sticky truncation
# flag (dropped push / exhausted step budget) and sp is the stack pointer.
# External consumers rely only on st[0..2] and st[-1]/st[-2].


def empty_stack(cfg: EnvConfig):
    # one extra DUMP slot: disabled pushes write there (single-row dynamic
    # write) instead of select-copying the whole stack arrays
    SM = cfg.stack_max
    z = jnp.zeros((SM + 1,), jnp.int32)
    return (z, z, z, z, z, z, jnp.int32(0))


def machine_init(cfg: EnvConfig, colour, kind, count=0):
    f_op, f_r, f_c, f_idx, f_col, f_cnt, sp = empty_stack(cfg)
    return (
        colour,
        kind,
        jnp.asarray(count, jnp.int32),
        f_op,
        f_r,
        f_c,
        f_idx,
        f_col,
        f_cnt,
        jnp.asarray(False),  # ovf
        sp,
    )


def push_frame(st, op, r, c, counted, pred=True, idx=-1, fcolour=0):
    """Push one frame when ``pred`` holds (disabled pushes hit the DUMP slot)."""
    colour, kind, count, f_op, f_r, f_c, f_idx, f_col, f_cnt, ovf, sp = st
    p = jnp.asarray(pred)
    SM = f_op.shape[0] - 1  # last slot is the dump
    # overflowing pushes (sp >= SM) land in the dump slot AND leave sp
    # unchanged, so they are true drops: the next pop never reads the dumped
    # frame.  Only reachable beyond stack_max (debug_checks flags it).
    ok = p & (sp < SM)
    i = jnp.where(ok, sp, SM)
    f_op = f_op.at[i].set(jnp.asarray(op, jnp.int32))
    f_r = f_r.at[i].set(jnp.asarray(r, jnp.int32))
    f_c = f_c.at[i].set(jnp.asarray(c, jnp.int32))
    f_idx = f_idx.at[i].set(jnp.asarray(idx, jnp.int32))
    f_col = f_col.at[i].set(jnp.asarray(fcolour, jnp.int32))
    f_cnt = f_cnt.at[i].set(jnp.asarray(counted, jnp.int32))
    sp = sp + ok.astype(jnp.int32)
    ovf = ovf | (p & ~ok)  # a requested push that was dropped
    return (colour, kind, count, f_op, f_r, f_c, f_idx, f_col, f_cnt, ovf, sp)


def machine_step(cfg: EnvConfig, st):
    """One micro-step of the activation machine (requires sp > 0)."""
    colour, kind, count, f_op, f_r, f_c, f_idx, f_col, f_cnt, ovf, sp = st
    R, C = cfg.num_rows, cfg.num_cols
    K = cfg.num_colours
    top = sp - 1
    op = f_op[top]
    r = f_r[top]
    c = f_c[top]
    idx = f_idx[top]
    fcol = f_col[top]
    counted = f_cnt[top]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    ord_ = row_ids * C + col_ids

    is_real = (op == OP_V_LASER) | (op == OP_H_LASER) | (op == OP_BOMB) | (
        op == OP_COOKIE
    )
    entry = is_real & (idx < 0)

    # ---------------- entry phase (activate_special preamble) --------------
    # `board.py:487-499`: empty-colour board → silent return; else delete the
    # special's own cell and (maybe) count it; a cookie additionally picks its
    # colour and deletes that colour's normals (`board.py:530-544`).
    board_dead = jnp.all(colour == 0)
    pop_now = entry & board_dead
    do_entry = entry & ~board_dead

    cell_sel = (row_ids == r) & (col_ids == c)
    colour = jnp.where(do_entry & cell_sel, 0, colour)
    kind = jnp.where(do_entry & cell_sel, 0, kind)
    count = count + jnp.where(do_entry & (counted > 0), 1, 0)

    is_cookie_entry = do_entry & (op == OP_COOKIE)
    # most common colour: bincount over nonzero colours, first argmax
    counts = jnp.sum(
        (colour[None, :, :] == (1 + jnp.arange(K, dtype=jnp.int32))[:, None, None]),
        axis=(1, 2),
    )
    chosen = 1 + jnp.argmax(counts).astype(jnp.int32)
    fcol = jnp.where(is_cookie_entry, chosen, fcol)
    f_col = f_col.at[top].set(fcol)
    del_norm = is_cookie_entry & (colour == fcol) & (kind == KIND_NORMAL)
    colour = jnp.where(del_norm, 0, colour)
    kind = jnp.where(del_norm, 0, kind)

    idx = jnp.where(do_entry, 0, idx)
    f_idx = f_idx.at[top].set(idx)

    # ---------------- scan phase -------------------------------------------
    scan = (~entry) | do_entry  # after entry actions we fall through to scan
    scan = scan & ~pop_now

    region = jnp.where(
        op == OP_V_LASER,
        col_ids == c,
        jnp.where(
            op == OP_H_LASER,
            row_ids == r,
            jnp.where(
                op == OP_BOMB,
                (jnp.abs(row_ids - r) <= 1) & (jnp.abs(col_ids - c) <= 1),
                jnp.where(
                    op == OP_BOMB2,
                    (jnp.abs(row_ids - r) <= 2) & (jnp.abs(col_ids - c) <= 2),
                    # OP_COOKIE / OP_MASKSCAN
                    (colour == fcol) & (kind > 1),
                ),
            ),
        ),
    )
    is_scan_only = (op == OP_COOKIE) | (op == OP_MASKSCAN)

    pending = region & (ord_ >= idx)
    special = pending & (kind != 0) & (kind != KIND_NORMAL)
    first_ord = jnp.min(jnp.where(special, ord_, BIG))
    found = first_ord < BIG

    # batch-delete non-special region cells before the next special
    # (`board.py:503-528` else-branches); cookie/maskscan never delete here.
    delete = (
        scan
        & (~is_scan_only)
        & pending
        & (~special)
        & (ord_ < first_ord)
    )
    colour = jnp.where(delete, 0, colour)
    kind = jnp.where(delete, 0, kind)

    # pop if nothing left, else push recursion frame for the found special
    pop = pop_now | (scan & ~found)
    sp2 = jnp.where(pop, sp - 1, sp)

    sr = first_ord // C
    sc = first_ord % C
    s_safe_r = jnp.clip(sr, 0, R - 1)
    s_safe_c = jnp.clip(sc, 0, C - 1)
    skind = kind[s_safe_r, s_safe_c]
    child_counted = jnp.where(is_real, 1, 0)  # maskscan/bomb2 children uncounted
    do_push = scan & found

    f_idx = jnp.where(do_push, f_idx.at[top].set(first_ord + 1), f_idx)
    if cfg.debug_checks:
        from jax.experimental import checkify

        # a push at a full stack would be a silent OOB-scatter drop
        checkify.check(
            ~(do_push & (sp2 >= cfg.stack_max)),
            "stack_max overflow: activation frame dropped at depth {d}",
            d=sp2,
        )
    st2 = (colour, kind, count, f_op, f_r, f_c, f_idx, f_col, f_cnt, ovf, sp2)
    st2 = push_frame(
        st2, skind, sr, sc, child_counted, pred=do_push, idx=-1, fcolour=0
    )
    return st2


def run_machine(cfg: EnvConfig, st):
    """Run micro-steps until the stack drains (bounded)."""

    def cond(carry):
        it, st = carry
        sp = st[-1]
        return (sp > 0) & (it < cfg.activation_steps_max)

    def body(carry):
        it, st = carry
        return it + 1, machine_step(cfg, st)

    _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), st))
    # a non-empty stack after the loop = the step budget truncated the chain
    st = st[:-2] + (st[-2] | (st[-1] > 0), st[-1])
    if cfg.debug_checks:
        from jax.experimental import checkify

        # a non-empty stack after the loop means the step budget truncated
        # the chain (`board.py:473-556` has no such cap — it recurses freely)
        checkify.check(
            st[-1] == 0,
            "activation_steps_max exceeded: chain truncated with {n} frames live",
            n=st[-1],
        )
    return st

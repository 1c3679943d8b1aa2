"""Fused no-specials cascade as ONE Pallas TPU kernel (batch on lanes).

The no-specials cascade (`board.py:367-376` with every special disabled:
detect lowest-row lines + extensions → delete their union → gravity →
refill) is the whole hot loop of configs 0/1, and as XLA it costs ~20 tiny
per-trip fusions × max-over-batch trips × ~8µs launch overhead each (round-4
XProf: 92% of the no-specials step).  This kernel runs the ENTIRE cascade
for 128 boards per grid step inside VMEM: boards live as [R*C, 128] tiles —
**batch on the 128-lane axis** (XLA's [B, R, C] layout puts C≈10 on lanes
and wastes >90% of every vector op) — and every trip is ~200 unrolled VPU
ops with zero launch overhead.  Per-tile trip counts are the max over 128
boards instead of the whole batch, which also cuts total executed trips.

Bit-exactness with the XLA path (`engine.engine_move`'s cascade loop +
`ops/lines.line_union_mask` + `ops/board_ops.gravity/apply_refill`): refill
randomness is counter-based — trip t draws `draw_colour_grid(fold_in(sub,
t))` — so the wrapper precomputes fills for a chunk of trips OUTSIDE the
kernel with the exact jax.random ops the XLA loop uses, and the kernel
consumes fills[t] only on trips a lane actually executes.  The parity test
(tests/ops/test_pallas_cascade.py) asserts identical boards / eliminations /
trip counts between both paths.

The wrapper chunks trips (TC per kernel launch, outer `lax.while_loop`):
fills for max_cascades=64 potential trips would be ~95% wasted, while a
chunk regenerates only while some board still cascades.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EnvConfig
from .board_ops import draw_colour_grid

TB = 128  # lane tile: boards per grid step
TC = 8  # trips per kernel launch (chunk)


# ---------------------------------------------------------------------------
# in-kernel helpers, all on [R, C, TB] arrays with static unrolled loops
# ---------------------------------------------------------------------------


def _shift_c(a, d, fill):
    """value at (r, c, b) taken from (r, c-d, b); out-of-board = fill."""
    R, C, B = a.shape
    if d == 0:
        return a
    if d > 0:
        pad = jnp.full((R, d, B), fill, a.dtype)
        return jnp.concatenate([pad, a[:, : C - d, :]], axis=1)
    d = -d
    pad = jnp.full((R, d, B), fill, a.dtype)
    return jnp.concatenate([a[:, d:, :], pad], axis=1)


def _shift_r(a, d, fill):
    R, C, B = a.shape
    if d == 0:
        return a
    if d > 0:
        pad = jnp.full((d, C, B), fill, a.dtype)
        return jnp.concatenate([pad, a[: R - d, :, :]], axis=0)
    d = -d
    pad = jnp.full((d, C, B), fill, a.dtype)
    return jnp.concatenate([a[d:, :, :], pad], axis=0)


def _chain(eq, shift, sgn, n):
    """i32 count of consecutive True eq-links extending from each cell:
    cnt[p] = Σ_k ∏_{j=0..k-1} eq[p - sgn*j]  (sgn=+1: links to lower index).
    Works on i32 0/1 masks internally: Mosaic cannot concatenate (shift)
    i1 vregs — every shifted operand must be i32."""
    eq_i = jnp.where(eq, 1, 0)
    cnt = eq_i
    cur = eq_i
    for k in range(2, n):
        cur = cur * shift(eq_i, sgn * (k - 1), 0)
        cnt = cnt + cur
    return cnt


def _chain_from(ok, shift, sgn, n):
    """rext-style count: links starting at the NEIGHBOUR:
    cnt[p] = Σ_k ∏_{j=1..k} ok[p + sgn*j].  i32-mask internals (see
    _chain)."""
    ok_i = jnp.where(ok, 1, 0)
    cur = shift(ok_i, -sgn, 0)
    cnt = cur
    for k in range(2, n):
        cur = cur * shift(ok_i, -sgn * k, 0)
        cnt = cnt + cur
    return cnt


def _cummax(a, shift, n, minval):
    s = 1
    while s < n:
        a = jnp.maximum(a, shift(a, s, minval))
        s *= 2
    return a


def _cummin_rev(a, shift, n, maxval):
    s = 1
    while s < n:
        a = jnp.minimum(a, shift(a, -s, maxval))
        s *= 2
    return a


def _union_mask_tile(x, R, C):
    """([R, C, TB] bool union, [1, TB] bool exists) — the in-kernel
    transcription of ops/lines.line_union_mask; all-zero pad lanes produce
    an empty union (the `valid` guard on every eq link)."""
    i32 = jnp.int32
    BIGI = jnp.int32(1 << 20)
    r_ids = jax.lax.broadcasted_iota(i32, x.shape, 0)
    c_ids = jax.lax.broadcasted_iota(i32, x.shape, 1)
    valid = x > 0

    eq_l = valid & (x == _shift_c(x, 1, -1))
    eq_r = valid & (x == _shift_c(x, -1, -2))
    eq_u = valid & (x == _shift_r(x, 1, -1))
    eq_d = valid & (x == _shift_r(x, -1, -2))

    lcnt = _chain(eq_l, _shift_c, 1, C)
    rcnt = _chain(eq_r, _shift_c, -1, C)
    ucnt = _chain(eq_u, _shift_r, 1, R)
    dcnt = _chain(eq_d, _shift_r, -1, R)

    h_in3 = valid & (lcnt + rcnt + 1 >= 3)
    v_b3 = valid & (ucnt + dcnt + 1 >= 3) & (dcnt == 0)

    flag_r = jnp.where(h_in3 | v_b3, r_ids, -1)  # [R, C, TB] i32
    sr0 = jnp.max(
        jnp.max(flag_r, axis=1), axis=0, keepdims=True
    )  # [1, TB]
    exists = sr0 >= 0  # [1, TB]
    rowmask = r_ids == sr0[:, None, :]  # [R, C, TB]

    vflag_cell = v_b3 & rowmask
    vflag = (
        jnp.max(jnp.where(vflag_cell, 1, 0), axis=0, keepdims=True) > 0
    )  # [1, C, TB]
    vtop = jnp.sum(
        jnp.where(vflag_cell, r_ids - ucnt, 0), axis=0, keepdims=True
    )  # [1, C, TB]
    member_v = vflag & (vtop <= r_ids) & (r_ids <= sr0[:, None, :])
    member_h = rowmask & h_in3
    primary = (member_v | member_h) & exists[:, None, :]
    nonprim = ~primary

    # extension chains through primaries (cells non-primary, same colour)
    okf_h = nonprim & valid & (x == _shift_c(x, 1, -1))
    okb_h = nonprim & valid & (x == _shift_c(x, -1, -2))
    rext = _chain_from(okf_h, _shift_c, 1, C)
    lext = _chain_from(okb_h, _shift_c, -1, C)
    cand_h = primary & (1 + lext + rext >= 3)

    okf_v = nonprim & valid & (x == _shift_r(x, 1, -1))
    okb_v = nonprim & valid & (x == _shift_r(x, -1, -2))
    dext = _chain_from(okf_v, _shift_r, 1, R)
    uext = _chain_from(okb_v, _shift_r, -1, R)
    cand_v = primary & (1 + uext + dext >= 3)

    right_reach = _cummax(
        jnp.where(cand_h, c_ids + rext, -1), _shift_c, C, jnp.int32(-1)
    )
    left_reach = _cummin_rev(
        jnp.where(cand_h, c_ids - lext, BIGI), _shift_c, C, BIGI
    )
    cover_h = (right_reach >= c_ids) | (left_reach <= c_ids)
    down_reach = _cummax(
        jnp.where(cand_v, r_ids + dext, -1), _shift_r, R, jnp.int32(-1)
    )
    up_reach = _cummin_rev(
        jnp.where(cand_v, r_ids - uext, BIGI), _shift_r, R, BIGI
    )
    cover_v = (down_reach >= r_ids) | (up_reach <= r_ids)

    union = primary | ((cover_h | cover_v) & valid)
    return union, exists


def _gravity_tile(x, R):
    """Stable push-zeros-up per column — board_ops.gravity transcribed."""
    i32 = jnp.int32
    r_ids = jax.lax.broadcasted_iota(i32, x.shape, 0)
    empty = jnp.where(x == 0, 1, 0)
    cume = empty
    s = 1
    while s < R:
        cume = cume + _shift_r(cume, s, 0)
        s *= 2
    n_empty = cume[R - 1 : R, :, :]
    cumt = (r_ids + 1) - cume
    dest = jnp.where(empty > 0, cume - 1, n_empty + cumt - 1)
    out = jnp.zeros_like(x)
    for r in range(R):
        out = jnp.where(dest[r : r + 1, :, :] == r_ids, x[r : r + 1, :, :], out)
    return out


def _active_tile(x):
    """[1, TB] i32: lane has a >=3 same-colour run."""
    v = x > 0
    h3 = (
        (x[:, :-2, :] == x[:, 1:-1, :])
        & (x[:, 1:-1, :] == x[:, 2:, :])
        & v[:, :-2, :]
    )
    v3 = (
        (x[:-2, :, :] == x[1:-1, :, :])
        & (x[1:-1, :, :] == x[2:, :, :])
        & v[:-2, :, :]
    )
    TBl = x.shape[2]
    flat = jnp.concatenate(
        [jnp.where(h3, 1, 0).reshape(-1, TBl),
         jnp.where(v3, 1, 0).reshape(-1, TBl)], axis=0
    )
    return jnp.max(flat, axis=0, keepdims=True)


def _cascade_kernel(
    R, C, limit_ref, col_ref, fills_ref, trips_ref, elim_ref,
    out_col, out_trips, out_elim, out_active,
):
    x0 = col_ref[:].reshape(R, C, TB)
    trips0 = trips_ref[:]  # (1, TB)
    elim0 = elim_ref[:]
    limit = limit_ref[0, 0]

    def cond(carry):
        x, trips, elim, t = carry
        return (t < limit) & (jnp.sum(_active_tile(x)) > 0)

    def body(carry):
        x, trips, elim, t = carry
        union, exists = _union_mask_tile(x, R, C)
        x = jnp.where(union, 0, x)
        elim = elim + jnp.sum(
            jnp.where(union, 1, 0).reshape(-1, TB), axis=0, keepdims=True
        )
        x = _gravity_tile(x, R)
        fill = fills_ref[pl.ds(t, 1)].reshape(R, C, TB)
        x = jnp.where(x == 0, fill, x)
        trips = trips + jnp.where(exists, 1, 0)
        return x, trips, elim, t + 1

    x, trips, elim, _ = jax.lax.while_loop(
        cond, body, (x0, trips0, elim0, jnp.int32(0))
    )

    out_col[:] = x.reshape(R * C, TB)
    out_trips[:] = trips
    out_elim[:] = elim
    out_active[:] = _active_tile(x)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_cascade(cfg: EnvConfig, colour_b, sub_keys, interpret: bool = False):
    """Run the full no-specials cascade for a batch of boards.

    colour_b: i32[B, R, C] post-swap boards; sub_keys: per-board threefry
    keys (the `sub` of `engine_move`'s `key, sub = split(key)`).  Returns
    (colour_b, elim_b, trips_b, truncated_b), bit-identical to the XLA
    cascade loop (same fills: trip t of board b draws
    `draw_colour_grid(fold_in(sub_b, t))`).
    """
    B, R, C = colour_b.shape
    T = cfg.max_cascades
    Bp = ((B + TB - 1) // TB) * TB
    n_tiles = Bp // TB

    # [R*C, Bp] — batch on lanes; pad lanes are all-zero (line-free, inert)
    col_t = jnp.transpose(colour_b.reshape(B, R * C)).astype(jnp.int32)
    col_t = jnp.pad(col_t, ((0, 0), (0, Bp - B)))
    trips = jnp.zeros((1, Bp), jnp.int32)
    elim = jnp.zeros((1, Bp), jnp.int32)

    def gen_fills(t0):
        """fills for trips t0..t0+TC-1: [TC, R*C, Bp] — the exact draws the
        XLA loop makes (fold_in + draw_colour_grid), computed in parallel."""
        ts = t0 + jnp.arange(TC, dtype=jnp.int32)

        def per_board(k):
            return jax.vmap(
                lambda t: draw_colour_grid(jax.random.fold_in(k, t), cfg)
            )(ts)

        f = jax.vmap(per_board)(sub_keys)  # [B, TC, R, C]
        f = jnp.transpose(f.reshape(B, TC, R * C), (1, 2, 0))
        return jnp.pad(f, ((0, 0), (0, 0), (0, Bp - B)))

    kernel = functools.partial(_cascade_kernel, R, C)

    def chunk_call(col_t, fills, trips, elim, limit):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # (1,1) limit scalar
                pl.BlockSpec((R * C, TB), lambda i: (0, i)),
                pl.BlockSpec((TC, R * C, TB), lambda i: (0, 0, i)),
                pl.BlockSpec((1, TB), lambda i: (0, i)),
                pl.BlockSpec((1, TB), lambda i: (0, i)),
            ],
            out_specs=(
                pl.BlockSpec((R * C, TB), lambda i: (0, i)),
                pl.BlockSpec((1, TB), lambda i: (0, i)),
                pl.BlockSpec((1, TB), lambda i: (0, i)),
                pl.BlockSpec((1, TB), lambda i: (0, i)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((R * C, Bp), jnp.int32),
                jax.ShapeDtypeStruct((1, Bp), jnp.int32),
                jax.ShapeDtypeStruct((1, Bp), jnp.int32),
                jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            ),
            interpret=interpret,
        )(limit, col_t, fills, trips, elim)

    def run_chunk(carry):
        col_t, trips, elim, t0, act = carry
        fills = gen_fills(t0)
        limit = jnp.minimum(jnp.int32(TC), T - t0).reshape(1, 1)
        col_t, trips, elim, act = chunk_call(col_t, fills, trips, elim, limit)
        return col_t, trips, elim, t0 + TC, act

    def outer_cond(carry):
        col_t, trips, elim, t0, act = carry
        return (jnp.sum(act) > 0) & (t0 < T)

    # the first chunk always runs (0-trip batches exit in-kernel instantly)
    carry = run_chunk(
        (col_t, trips, elim, jnp.int32(0), jnp.ones((1, Bp), jnp.int32))
    )
    col_t, trips, elim, t0, act = jax.lax.while_loop(
        outer_cond, run_chunk, carry
    )

    colour_out = jnp.transpose(col_t[:, :B]).reshape(B, R, C)
    # per-lane truncation: still lined after the trip budget (mirrors the
    # XLA loop's post-exit has_any_line check in engine_move)
    truncated = act[0, :B] > 0
    return colour_out, elim[0, :B], trips[0, :B], truncated


def cascade_reference(cfg: EnvConfig, colour_b, sub_keys):
    """The XLA twin of `fused_cascade` (vmapped while_loop, same fills) —
    the parity oracle for the kernel in tests."""
    from .board_ops import apply_refill, gravity
    from .lines import has_any_line, line_union_mask

    def one(colour, sub):
        kind = jnp.ones_like(colour)

        def cond(carry):
            colour, kind, elim, it = carry
            return has_any_line(cfg, colour, kind) & (it < cfg.max_cascades)

        def body(carry):
            colour, kind, elim, it = carry
            dmask = line_union_mask(cfg, colour)
            colour = jnp.where(dmask, 0, colour)
            kind = jnp.where(dmask, 0, kind)
            elim = elim + jnp.sum(dmask.astype(jnp.int32))
            colour, kind = gravity(colour, kind)
            grid = draw_colour_grid(jax.random.fold_in(sub, it), cfg)
            colour, kind = apply_refill(colour, kind, grid)
            return colour, kind, elim, it + 1

        colour, kind, elim, it = jax.lax.while_loop(
            cond, body, (colour, kind, jnp.int32(0), jnp.int32(0))
        )
        trunc = has_any_line(cfg, colour, kind)
        return colour, elim, it, trunc

    return jax.vmap(one)(colour_b, sub_keys)

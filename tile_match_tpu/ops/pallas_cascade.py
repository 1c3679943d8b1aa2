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


def _union_mask_tile(x, R, C, want_aux=False):
    """([R, C, TB] bool union, [1, TB] bool exists[, aux]) — the in-kernel
    transcription of ops/lines.line_union_mask; all-zero pad lanes produce
    an empty union (the `valid` guard on every eq link).

    With ``want_aux`` the per-cell detection intermediates needed by the
    specials simple-trip predicate are also returned (hl/vl run lengths,
    primary membership, extension candidates and lengths) — all already
    computed on the way to the union."""
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
    if want_aux:
        aux = {
            "member_h": member_h,
            "member_v": member_v,
            "hl": lcnt + rcnt + 1,
            "vl": ucnt + dcnt + 1,
            "lcnt": lcnt,  # in-line offset of a primary-h cell from its start
            "ucnt": ucnt,  # in-line offset of a primary-v cell from its top
            "cand_h": cand_h,
            "cand_v": cand_v,
            "hext": 1 + lext + rext,
            "vext": 1 + uext + dext,
        }
        return union, exists, aux
    return union, exists


def _lane_any(cells):
    """[R, C, TB] bool → [1, TB] i32 any-reduction (i32 path for Mosaic)."""
    TBl = cells.shape[2]
    return jnp.max(
        jnp.where(cells, 1, 0).reshape(-1, TBl), axis=0, keepdims=True
    )


# Defer-reason bits (kernel-coverage telemetry): why a lane froze and
# handed its trip to the full classify/resolve machinery.  A lane may carry
# several bits.  Aggregated per rollout by tools/kernel_coverage.py to
# drive which closed form to absorb next (VERDICT r4 item 3).
REASON_LEN5 = 1  # >=5 primary with cookie enabled (cookie split)
REASON_EXT4 = 2  # extension line of length >= 4 (laser-from-extension)
REASON_EXT_BOMB = 4  # any extension candidate while bomb enabled (pairing)
REASON_COOKIE_HIT = 8  # cookie in the union / activation closure
REASON_UNCONVERGED = 16  # activation closure not converged within _NEXP
REASON_CROSS = 32  # h-primary x v-primary crossing while bomb enabled


def _simple_trip_tile(cfg: EnvConfig, union, aux, k):
    """([1, TB] bool simple, [R, C, TB] bool create, i32 create_code_grid,
    [1, TB] i32 reason_bits)
    — ``simple``: this trip's DETECTED lines all classify as disjoint
    normals OR unshared length-4 laser creations touching no special tile;
    sequential resolution then degenerates to 'delete the union, then
    create a laser at each length-4 line's pick cell' (the in-kernel
    closed form).  Conservative: any uncertainty marks the lane complex
    and defers to the full machinery.

    Complexity sources (`board.py:284-325, 460-471`):
    * a detected PRIMARY of length >= 5 with cookie enabled (cookie
      classification splits the line), or an extension of length >= 4
      (laser-from-extension — deferred);
    * with bomb enabled, ANY coordinate sharing → bomb pairing — every
      extension line shares its generator cell with its primary, so any
      extension at all, or an h-primary crossing a v-primary, is complex;
    * a special tile among the union's cells → activation chains.

    Length-4 UNSHARED primaries are handled in-kernel: the laser is
    created at the line's second coordinate (`get_special_creation_pos`
    middle rule for n=4 with an empty taken set, `board.py:441-447`) with
    the line's colour; creation positions of disjoint lines can never
    collide.  ``create`` marks those cells; ``create_code`` is the static
    laser kind per orientation (`board.py:296-302` fallback quirk), or 0
    when the orientation's classification falls back to normal (plain
    delete, nothing created).
    """
    # classification codes for a length-4 line by orientation (static)
    h_code = 3 if cfg.horizontal_laser else (2 if cfg.vertical_laser else 0)
    v_code = 2 if cfg.vertical_laser else 0

    if cfg.cookie:
        len_bad = (aux["member_h"] & (aux["hl"] >= 5)) | (
            aux["member_v"] & (aux["vl"] >= 5)
        )
    else:
        # without cookie, >= 5 primaries classify as plain normals
        len_bad = jnp.zeros_like(aux["member_h"])
    ext_bad = (aux["cand_h"] & (aux["hext"] >= 4)) | (
        aux["cand_v"] & (aux["vext"] >= 4)
    )
    reasons = _lane_any(len_bad) * REASON_LEN5 + _lane_any(ext_bad) * REASON_EXT4
    complex_cells = len_bad | ext_bad
    if cfg.bomb:
        ext_under_bomb = aux["cand_h"] | aux["cand_v"]
        cross = aux["member_h"] & aux["member_v"]
        reasons = (
            reasons
            + _lane_any(ext_under_bomb) * REASON_EXT_BOMB
            + _lane_any(cross) * REASON_CROSS
        )
        complex_cells = complex_cells | ext_under_bomb | cross
    # line-shape simplicity only; the kernel body combines it with the
    # special-tile analysis (no specials in the union, or exactly one
    # laser/bomb with a chain-free region — the single-activation case)
    simple = _lane_any(complex_cells) == 0

    h4_pick = (
        aux["member_h"] & (aux["hl"] == 4) & (aux["lcnt"] == 1)
        if h_code
        else jnp.zeros_like(aux["member_h"])
    )
    v4_pick = (
        aux["member_v"] & (aux["vl"] == 4) & (aux["ucnt"] == 1)
        if v_code
        else jnp.zeros_like(aux["member_v"])
    )
    create = h4_pick | v4_pick
    code = jnp.where(h4_pick, h_code, jnp.where(v4_pick, v_code, 0))
    return simple, create, code, reasons


def _gravity_tile(x, R, empty_b=None):
    """Stable push-zeros-up per column — board_ops.gravity transcribed.
    ``empty_b``: bool emptiness mask; defaults to x == 0 (colour-only
    boards).  Returns the dest permutation applier."""
    i32 = jnp.int32
    r_ids = jax.lax.broadcasted_iota(i32, x.shape, 0)
    empty = jnp.where(x == 0 if empty_b is None else empty_b, 1, 0)
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


def _gravity_two_tile(x, k, R):
    """Gravity for both channels with ONE dest permutation; emptiness is
    (colour == 0) & (kind == 0) — a cookie (colour 0, kind -1) is NOT empty
    (`board.py:222-225`)."""
    i32 = jnp.int32
    r_ids = jax.lax.broadcasted_iota(i32, x.shape, 0)
    empty = jnp.where((x == 0) & (k == 0), 1, 0)
    cume = empty
    s = 1
    while s < R:
        cume = cume + _shift_r(cume, s, 0)
        s *= 2
    n_empty = cume[R - 1 : R, :, :]
    cumt = (r_ids + 1) - cume
    dest = jnp.where(empty > 0, cume - 1, n_empty + cumt - 1)
    out_x = jnp.zeros_like(x)
    out_k = jnp.zeros_like(k)
    for r in range(R):
        hit = dest[r : r + 1, :, :] == r_ids
        out_x = jnp.where(hit, x[r : r + 1, :, :], out_x)
        out_k = jnp.where(hit, k[r : r + 1, :, :], out_k)
    return out_x, out_k


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


# ---------------------------------------------------------------------------
# Specials configs: simple-trip fast path.
#
# Most cascade trips on most boards classify every detected line as a
# disjoint length-3 normal touching no special tile, and then sequential
# resolution degenerates to "delete the union" — exactly the kernel's cheap
# body.  The specials kernel consumes all LEADING simple trips of every
# lane and FREEZES a lane the moment its next trip is complex (length >= 4,
# coordinate sharing under bomb, or a special tile in the union); the
# caller (envs/fused.batched_step_fused_sp) then runs ONE full
# classify/resolve trip for frozen lanes via the vmapped machinery and
# re-enters the kernel.  Executed full-machinery trips drop from
# max-over-batch cascade length (~29 at b1024) to max-over-batch COMPLEX
# trip count (~a few).
#
# Fill alignment: lanes enter a launch at different trip numbers, so fills
# are generated with PER-LANE bases — fills[j, :, lane] is the draw for
# trip (trips[lane] + j).  Within one launch every still-consuming lane
# consumes exactly one fill per loop iteration (consumption stops
# permanently at line-free or frozen), so the in-kernel index is the loop
# counter for every lane, and bit-exactness with the per-board XLA loop's
# fold_in(sub, trip) draws is preserved.
# ---------------------------------------------------------------------------


def _cascade_sp_kernel(
    R, C, Tmax, cfg, limit_ref, col_ref, kind_ref, fills_ref,
    trips_ref, elim_ref, frozen_ref,
    out_col, out_kind, out_trips, out_elim, out_new, out_act, out_frozen,
    out_active, out_reasons,
):
    x0 = col_ref[:].reshape(R, C, TB)
    k0 = kind_ref[:].reshape(R, C, TB)
    limit = limit_ref[0, 0]

    def cond(carry):
        x, k, trips, elim, new, act, frozen, reasons, t, go = carry
        return go & (t < limit)

    def body(carry):
        x, k, trips, elim, new, act, frozen, reasons, t, go = carry
        union, exists, aux = _union_mask_tile(x, R, C, want_aux=True)
        shape_ok, create, code, rbits = _simple_trip_tile(cfg, union, aux, k)

        # ---- special tiles in the union: none, or a CONVERGED laser/bomb
        # activation set.  `board.py:503-528` wipes each activated special's
        # column/row/3x3 cell by cell, recursing into any special the wipe
        # hits — since every deletion under these conditions is a normal
        # tile (side-effect-free) the wipes commute, so the closed form is
        # "delete union ∪ all activated regions" with the activated set S
        # computed as a transitive closure: start from the union's
        # lasers/bombs, add every special any region hits, re-expand.
        # Cookies anywhere in the closure (activation-time colour choice)
        # and closures that do not converge within _NEXP expansions stay
        # complex and defer to the machinery. --------------------------------
        _NEXP = 4
        spec_cells = union & (k != 1)
        n_spec = jnp.sum(
            jnp.where(spec_cells, 1, 0).reshape(-1, TB), axis=0, keepdims=True
        )  # [1, TB]
        S = jnp.where(spec_cells & (k > 1), 1, 0)  # i32 [R, C, TB]
        bad_sp = _lane_any(spec_cells & (k == -1))  # cookie in union

        def regions_of(S):
            vcol = jnp.max(
                S * jnp.where(k == 2, 1, 0), axis=0, keepdims=True
            )  # [1, C, TB]: columns wiped by vertical lasers
            # rows wiped by horizontal lasers: 2D reduce + i32 expand
            hrow = jnp.max(
                S * jnp.where(k == 3, 1, 0), axis=1
            )[:, None, :]  # [R, 1, TB]
            bomb = S * jnp.where(k == 4, 1, 0)
            bd = jnp.maximum(
                bomb,
                jnp.maximum(_shift_r(bomb, 1, 0), _shift_r(bomb, -1, 0)),
            )
            bd = jnp.maximum(
                bd, jnp.maximum(_shift_c(bd, 1, 0), _shift_c(bd, -1, 0))
            )
            return jnp.maximum(
                jnp.maximum(vcol + jnp.zeros_like(S), hrow + jnp.zeros_like(S)),
                bd,
            )

        for _ in range(_NEXP):
            region_i = regions_of(S)
            hit = jnp.where((region_i > 0) & (k != 1) & (k != 0), 1, 0)
            bad_sp = jnp.maximum(bad_sp, _lane_any((hit > 0) & (k == -1)))
            S = jnp.maximum(S, hit * jnp.where(k > 1, 1, 0))
        # REGENERATE the region from the final S (specials joining S on the
        # last expansion must contribute their regions) and re-check the
        # closure: any laser/bomb the final regions hit that is not in S, or
        # any cookie hit, means the chain did not converge within _NEXP —
        # defer to the machinery.
        region_i = regions_of(S)
        hit_f = (region_i > 0) & (k != 1) & (k != 0)
        bad_sp = jnp.maximum(bad_sp, _lane_any(hit_f & (k == -1)))
        unconverged = _lane_any(hit_f & (k > 1) & (S == 0))
        act_n = jnp.sum(S.reshape(-1, TB), axis=0, keepdims=True)
        act_lane = (n_spec > 0) & (bad_sp == 0) & (unconverged == 0)
        act_i = jnp.where(act_lane, 1, 0)  # i32 for the 3D broadcast below
        region = (region_i * act_i[:, None, :]) > 0
        sp_ok = (n_spec == 0) | act_lane
        simple = shape_ok & sp_ok

        exists_i = jnp.where(exists, 1, 0)
        in_budget = jnp.where(trips < Tmax, 1, 0)
        proc = (
            exists_i * jnp.where(simple, 1, 0)
            * jnp.where(frozen == 0, 1, 0)
            * in_budget
        )  # [1, TB] i32
        # freeze = "needs a full trip next"; boards at the trip cap are NOT
        # frozen (the cap, not the machinery, stops them — engine_move's
        # per-board `it < max_cascades`)
        newly_frozen = (
            exists_i * jnp.where(simple, 0, 1) * in_budget
            * jnp.where(frozen == 0, 1, 0)
        )
        frozen = jnp.maximum(frozen, newly_frozen)
        # telemetry: why did this lane freeze? (bitmask, OR-accumulated)
        rbits = (
            rbits
            + jnp.where(bad_sp > 0, REASON_COOKIE_HIT, 0)
            + jnp.where((unconverged > 0) & (bad_sp == 0), REASON_UNCONVERGED, 0)
        )
        reasons = jnp.bitwise_or(reasons, rbits * newly_frozen)
        proc3 = proc[:, None, :] > 0  # [1, 1, TB] broadcast
        dele = (union | region) & proc3
        cre = create & proc3
        line_colour = x  # pre-delete colour at the pick cell
        x = jnp.where(dele, 0, x)
        k = jnp.where(dele, 0, k)
        # phase-3 creation (`board.py:426-427, 572-597`): laser at each
        # unshared length-4 line's pick cell, with the line's colour
        x = jnp.where(cre, line_colour, x)
        k = jnp.where(cre, code, k)
        n_created = jnp.sum(
            jnp.where(cre, 1, 0).reshape(-1, TB), axis=0, keepdims=True
        )
        # eliminations counted post-resolve: deleted minus created cells
        elim = elim + proc * (
            jnp.sum(
                jnp.where(dele, 1, 0).reshape(-1, TB), axis=0, keepdims=True
            )
            - n_created
        )
        new = new + proc * n_created
        act = act + proc * act_n
        x, k = _gravity_two_tile(x, k, R)
        fill = fills_ref[pl.ds(t, 1)].reshape(R, C, TB)
        refill = (x == 0) & (k == 0)
        x = jnp.where(refill, fill, x)
        k = jnp.where(refill, 1, k)
        trips = trips + proc
        go = jnp.sum(proc) > 0
        return x, k, trips, elim, new, act, frozen, reasons, t + 1, go

    x, k, trips, elim, new, act, frozen, reasons, _, _ = jax.lax.while_loop(
        cond,
        body,
        (
            x0, k0, trips_ref[:], elim_ref[:],
            jnp.zeros_like(elim_ref[:]), jnp.zeros_like(elim_ref[:]),
            frozen_ref[:], jnp.zeros_like(elim_ref[:]), jnp.int32(0),
            jnp.asarray(True),
        ),
    )

    out_col[:] = x.reshape(R * C, TB)
    out_kind[:] = k.reshape(R * C, TB)
    out_trips[:] = trips
    out_elim[:] = elim
    out_new[:] = new
    out_act[:] = act
    out_frozen[:] = frozen
    out_active[:] = _active_tile(x)
    out_reasons[:] = reasons


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def cascade_sp_chunk(
    cfg: EnvConfig, colour_b, kind_b, sub_keys, trips_b, elim_b, frozen_b,
    interpret: bool = False,
):
    """One specials-kernel launch: consume up to TC leading simple trips per
    board, freezing boards whose next trip is complex.

    All batch-shaped args are board-major ([B, R, C] / [B]); returns
    (colour, kind, trips, elim, frozen, active) with the same shapes.
    """
    B, R, C = colour_b.shape
    T = cfg.max_cascades
    Bp = ((B + TB - 1) // TB) * TB
    n_tiles = Bp // TB

    def to_t(a):  # [B, R, C] -> [R*C, Bp]
        a = jnp.transpose(a.reshape(B, R * C)).astype(jnp.int32)
        return jnp.pad(a, ((0, 0), (0, Bp - B)))

    def vec(a, fill=0):  # [B] -> [1, Bp]
        return jnp.pad(
            a.astype(jnp.int32)[None, :], ((0, 0), (0, Bp - B)),
            constant_values=fill,
        )

    col_t = to_t(colour_b)
    kind_t = to_t(kind_b)
    trips = vec(trips_b)
    elim = vec(elim_b)
    frozen = vec(frozen_b)

    # fills with per-lane bases: fills[j, :, lane] = draw for trip
    # (trips[lane] + j) — identical to the XLA loop's fold_in(sub, it)
    js = jnp.arange(TC, dtype=jnp.int32)

    def per_board(k, base):
        return jax.vmap(
            lambda j: draw_colour_grid(jax.random.fold_in(k, base + j), cfg)
        )(js)

    f = jax.vmap(per_board)(sub_keys, trips_b.astype(jnp.int32))
    f = jnp.transpose(f.reshape(B, TC, R * C), (1, 2, 0))
    fills = jnp.pad(f, ((0, 0), (0, 0), (0, Bp - B)))

    limit = jnp.full((1, 1), TC, jnp.int32)
    kernel = functools.partial(_cascade_sp_kernel, R, C, T, cfg)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R * C, TB), lambda i: (0, i)),
            pl.BlockSpec((R * C, TB), lambda i: (0, i)),
            pl.BlockSpec((TC, R * C, TB), lambda i: (0, 0, i)),
            pl.BlockSpec((1, TB), lambda i: (0, i)),
            pl.BlockSpec((1, TB), lambda i: (0, i)),
            pl.BlockSpec((1, TB), lambda i: (0, i)),
        ],
        out_specs=(
            pl.BlockSpec((R * C, TB), lambda i: (0, i)),
            pl.BlockSpec((R * C, TB), lambda i: (0, i)),
            pl.BlockSpec((1, TB), lambda i: (0, i)),
            pl.BlockSpec((1, TB), lambda i: (0, i)),
            pl.BlockSpec((1, TB), lambda i: (0, i)),
            pl.BlockSpec((1, TB), lambda i: (0, i)),
            pl.BlockSpec((1, TB), lambda i: (0, i)),
            pl.BlockSpec((1, TB), lambda i: (0, i)),
            pl.BlockSpec((1, TB), lambda i: (0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R * C, Bp), jnp.int32),
            jax.ShapeDtypeStruct((R * C, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ),
        interpret=interpret,
    )(limit, col_t, kind_t, fills, trips, elim, frozen)
    (
        col_o, kind_o, trips_o, elim_o, new_o, act_o, frozen_o, active_o,
        reasons_o,
    ) = out

    def from_t(a):
        return jnp.transpose(a[:, :B]).reshape(B, R, C)

    return (
        from_t(col_o),
        from_t(kind_o),
        trips_o[0, :B],
        elim_o[0, :B],
        new_o[0, :B],
        act_o[0, :B],
        frozen_o[0, :B],
        active_o[0, :B] > 0,
        reasons_o[0, :B],
    )

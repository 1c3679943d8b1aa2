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
t))` — and the kernel REPLICATES jax's threefry bit-for-bit in-kernel
(`_tf2x32_tile`/`_fill_tile`): the wrapper precomputes only the 4
fold_in+split key words per (lane, trip) with the exact jax.random ops, and
the kernel derives the full refill grid from them on trips a lane actually
executes (this replaced shipping [TC, R*C, B] fill grids through HBM).  The
kernel also emits the post-cascade settled effective-action mask
(`_settled_mask_tile`), removing the step's largest XLA remainder.  The
parity test (tests/ops/test_pallas_cascade.py) asserts identical boards /
eliminations / trip counts / masks between both paths.

The wrapper chunks trips (TC per kernel launch, outer `lax.while_loop`):
keys for max_cascades=64 potential trips would be ~95% wasted, while a
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
    """value at (r, c, b) taken from (r, c-d, b); out-of-board = fill.
    |d| >= C saturates to all-fill (Mosaic rejects zero-size vector
    operands, hit by the 4-cell mask stencils on 3-wide boards)."""
    R, C, B = a.shape
    if d == 0:
        return a
    if abs(d) >= C:
        return jnp.full((R, C, B), fill, a.dtype)
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
    if abs(d) >= R:
        return jnp.full((R, C, B), fill, a.dtype)
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


def _chain_wsum(val_i, eq_i, shift, sgn, n):
    """Run-sum companion of ``_chain``: accumulate ``val`` over the cells
    linked consecutively in one direction:
    out[p] = Σ_{k>=1} (∏_{j=0..k-1} eq[p - sgn*j]) * val[p - sgn*k].
    With eq = the maximal same-colour run links, ``val + wsum(left) +
    wsum(right)`` is the sum of ``val`` over the whole run — used for
    per-line share counts and for broadcasting a value from a line's share
    cell to every cell of the line.  i32 throughout (Mosaic i1-shift
    restriction)."""
    cur = eq_i
    out = cur * shift(val_i, sgn, 0)
    for k in range(2, n):
        cur = cur * shift(eq_i, sgn * (k - 1), 0)
        out = out + cur * shift(val_i, sgn * k, 0)
    return out


def _chain_wmax(val_i, eq_i, shift, sgn, n, minval):
    """Run-max companion: max of ``val`` over the linked cells in one
    direction (non-linked cells contribute ``minval``).  max(val, wmax_l,
    wmax_r) is the run maximum — used to pick a star's initiator generator
    among several on one line."""
    cur = eq_i
    out = jnp.where(cur > 0, shift(val_i, sgn, minval), minval)
    for k in range(2, n):
        cur = cur * shift(eq_i, sgn * (k - 1), 0)
        out = jnp.maximum(
            out, jnp.where(cur > 0, shift(val_i, sgn * k, minval), minval)
        )
    return out


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
            "rcnt": rcnt,
            "ucnt": ucnt,  # in-line offset of a primary-v cell from its top
            "dcnt": dcnt,
            "cand_h": cand_h,
            "cand_v": cand_v,
            "hext": 1 + lext + rext,
            "vext": 1 + uext + dext,
            "lext": lext,
            "rext": rext,
            "uext": uext,
            "dext": dext,
            # i32 run links for run-sum broadcasts (maximal colour runs ==
            # the primary lines exactly, by run maximality)
            "eq_l": jnp.where(eq_l, 1, 0),
            "eq_r": jnp.where(eq_r, 1, 0),
            "eq_u": jnp.where(eq_u, 1, 0),
            "eq_d": jnp.where(eq_d, 1, 0),
            "cover_h": cover_h,
            "cover_v": cover_v,
            "nonprim": nonprim,
        }
        return union, exists, aux
    return union, exists


def _lane_any(cells):
    """[R, C, TB] bool → [1, TB] i32 any-reduction (i32 path for Mosaic)."""
    TBl = cells.shape[2]
    return jnp.max(
        jnp.where(cells, 1, 0).reshape(-1, TBl), axis=0, keepdims=True
    )


# ---------------------------------------------------------------------------
# In-kernel refill generation: bit-exact replication of
# ``draw_colour_grid(key)`` == ``jax.random.randint(key, (R, C), 1, K+1)``
# with jax's partitionable threefry:
#   k1, k2 = split(key);  bits_k = tf2x32(k, x0=0, x1=cell_index) ⊕-combined;
#   offset = ((hi % K) * ((2^16 % K)^2 % K) + lo % K) % K;  colour = 1+offset
# (jax._src.random._randint + prng._threefry_random_bits_partitionable).
# All in i32: adds wrap identically, shifts are explicit logical, and the
# unsigned remainder is computed from 16-bit halves so every intermediate is
# nonnegative.  The fold_in/split key words (4 per lane-trip) are precomputed
# outside the kernel — replacing the [TC, R*C, B] precomputed fill grids
# (26 MB of HBM round-trip per chunk at b8192) with [TC, 4, B].
# ---------------------------------------------------------------------------


def _tf2x32_tile(ka, kb, x0, x1):
    """Threefry-2x32 (20 rounds, jax's exact schedule) on i32 tiles."""
    rot1 = (13, 15, 26, 6)
    rot2 = (17, 29, 16, 24)
    ks0, ks1 = ka, kb
    ks2 = ka ^ kb ^ jnp.int32(0x1BD11BDA)

    def rotl(x, d):
        return (x << d) | jax.lax.shift_right_logical(x, 32 - d)

    def round4(x0, x1, rots):
        for r in rots:
            x0 = x0 + x1
            x1 = rotl(x1, r)
            x1 = x1 ^ x0
        return x0, x1

    x0 = x0 + ks0
    x1 = x1 + ks1
    x0, x1 = round4(x0, x1, rot1)
    x0 = x0 + ks1
    x1 = x1 + ks2 + 1
    x0, x1 = round4(x0, x1, rot2)
    x0 = x0 + ks2
    x1 = x1 + ks0 + 2
    x0, x1 = round4(x0, x1, rot1)
    x0 = x0 + ks0
    x1 = x1 + ks1 + 3
    x0, x1 = round4(x0, x1, rot2)
    x0 = x0 + ks1
    x1 = x1 + ks2 + 4
    x0, x1 = round4(x0, x1, rot1)
    x0 = x0 + ks2
    x1 = x1 + ks0 + 5
    return x0, x1


def _fill_tile(kw, R, C, K):
    """[R, C, TB] i32 refill colours from the 4 split-key words
    kw: [4, TB] i32 (k1_hi, k1_lo, k2_hi, k2_lo)."""
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C, TB), 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (R, C, TB), 1)
    iota = r_ids * C + c_ids
    z = jnp.zeros((R, C, TB), jnp.int32)

    def bits(i):
        a = kw[i : i + 1, :][None]  # [1, 1, TB]
        b = kw[i + 1 : i + 2, :][None]
        b1, b2 = _tf2x32_tile(a, b, z, iota)
        return b1 ^ b2

    hi = bits(0)
    lo = bits(2)

    def u32_rem(x):
        h = jax.lax.shift_right_logical(x, 16)
        l = x & 0xFFFF
        return ((h % K) * ((1 << 16) % K) + l % K) % K

    mult = ((1 << 16) % K) ** 2 % K
    off = (u32_rem(hi) * mult + u32_rem(lo)) % K
    return 1 + off


def _fill_key_words(sub_keys, bases, n_trips, Bp):
    """[n_trips, 4, Bp] i32: raw words of split(fold_in(sub_b, base_b + j), 2)
    for j in range(n_trips) — the per-(lane, trip) inputs of
    :func:`_fill_tile`, computed with the exact jax.random ops the XLA
    cascade loop uses."""
    B = sub_keys.shape[0]

    def per_board(k, base):
        def per_trip(j):
            kd = jax.random.split(jax.random.fold_in(k, base + j), 2)
            return jax.lax.bitcast_convert_type(kd, jnp.int32).reshape(4)

        return jax.vmap(per_trip)(jnp.arange(n_trips, dtype=jnp.int32))

    kws = jax.vmap(per_board)(sub_keys, bases)  # [B, n_trips, 4]
    kws = jnp.transpose(kws, (1, 2, 0))
    return jnp.pad(kws, ((0, 0), (0, 0), (0, Bp - B)))


# Defer-reason bits (kernel-coverage telemetry): why a lane froze and
# handed its trip to the full classify/resolve machinery.  A lane may carry
# several bits.  Aggregated per rollout by tools/kernel_coverage.py to
# drive which closed form to absorb next (VERDICT r4 item 3).
REASON_LEN5 = 1  # cookie line too long (>=9) or a shared >=5 line
REASON_EXT4 = 2  # extension line of length >= 5 (>= 4 when bomb disabled)
REASON_EXT_BOMB = 4  # prim+ext pair outside the absorbed case table
REASON_COOKIE_HIT = 8  # cookie hit by the activation closure
REASON_UNCONVERGED = 16  # activation closure not converged within _NEXP
REASON_CROSS = 32  # h x v primary crossing outside the absorbed case table
REASON_MULTI = 64  # a line with >=2 shares / overlapping extensions


def _lean_trip_tile(cfg, union, aux, k, h_code, v_code, zb):
    """The LEAN predicate for very large boards: disjoint length-3 normals
    and unshared length-4 lasers only; any sharing, >=5 line or extension
    defers (the round-4 conservative rules).  No run-sum chains — even the
    pairwise table's unrolled reductions exceed the Mosaic compiler's
    budget at 20x20."""
    if cfg.cookie:
        len_bad = (aux["member_h"] & (aux["hl"] >= 5)) | (
            aux["member_v"] & (aux["vl"] >= 5)
        )
    else:
        len_bad = zb
    ext_bad = (aux["cand_h"] & (aux["hext"] >= 4)) | (
        aux["cand_v"] & (aux["vext"] >= 4)
    )
    reasons = (
        _lane_any(len_bad) * REASON_LEN5 + _lane_any(ext_bad) * REASON_EXT4
    )
    complex_cells = len_bad | ext_bad
    ext_under_bomb = aux["cand_h"] | aux["cand_v"]
    cross = aux["member_h"] & aux["member_v"]
    reasons = (
        reasons
        + _lane_any(ext_under_bomb) * REASON_EXT_BOMB
        + _lane_any(cross) * REASON_CROSS
    )
    complex_cells = complex_cells | ext_under_bomb | cross
    simple = _lane_any(complex_cells) == 0

    h4 = (
        aux["member_h"] & (aux["hl"] == 4) & (aux["lcnt"] == 1)
        if h_code
        else zb
    )
    v4 = (
        aux["member_v"] & (aux["vl"] == 4) & (aux["ucnt"] == 1)
        if v_code
        else zb
    )
    create = h4 | v4
    code = jnp.where(h4, h_code, jnp.where(v4, v_code, 0))
    return simple, create, code, zb, reasons


def _simple_trip_tile(cfg: EnvConfig, union, aux, k):
    """([1, TB] bool simple, [R, C, TB] bool create, i32 create_code_grid,
    [R, C, TB] bool keep, [1, TB] i32 reason_bits)

    Decide whether this trip's DETECTED lines all fall into closed-form
    classification+resolution categories, and emit the category outcomes as
    cell masks.  When ``simple``, sequential resolution degenerates to
    'delete (union minus ``keep``), then create a special of kind
    ``code`` at each ``create`` cell' — the kernel body combines this with
    the converged special-activation closure.  Conservative: any
    uncertainty marks the lane complex and defers to the machinery.

    Absorbed categories (all provably order-independent, or with the pop
    order — sort by first-coord row, stable, `board.py:282` — resolved
    statically from the geometry):

    * disjoint length-3 lines → normals: delete (`board.py:322-325`);
    * UNSHARED length-4 primaries → laser at the line's second coordinate
      (`get_special_creation_pos` middle rule, `board.py:441-447`), with
      the `board.py:296-302` fallback quirk (h-line falls back to a
      vertical laser; v-line falls back to normal) encoded statically;
    * UNSHARED length-5..8 primaries with cookie enabled → cookie at the
      line's third coordinate, colour 0; only the first five coordinates
      are deleted (`board.py:287-292` takes `line[:5]`), so length-6/7
      lines KEEP their offset>=5 cells; a length-8 line's remainder is
      re-queued as a length-3 normal and deleted too;
    * with bomb enabled, lines sharing a coordinate, in isolated pairs
      (each line has exactly ONE share).  The pair pops in a fixed order
      (a vertical primary's top row is always above the flag row; an
      extension's first row is at or below its generator's primary's —
      ties keep primaries first, `board.py:282` stable sort), so the
      outcome is closed-form per case (`board.py:287-320`):
        - both length 3 → bomb at the shared cell (the corner =
          (mode row, mode col) of the 5 match coords IS the share point,
          `board.py:441-447`), both lines deleted;
        - one line length 4 popping SECOND → bomb at the share point; the
          partner contributes only its 3 closest coords (`board.py:309-312`)
          so its unique farthest-from-share cell SURVIVES;
        - a length-4 line popping FIRST → laser (len==4 precedes the bomb
          check, `board.py:295`), partner resolves alone afterwards;
      cases where one creation position lands inside the other creating
      line (the `taken_pos` filter would shift the second pick,
      `board.py:437`) are deferred.

    A special tile among the deleted cells is handled by the kernel body's
    activation closure; ``keep`` cells are excluded from its seed (their
    specials are never part of a match's coords).
    """
    R, C = cfg.num_rows, cfg.num_cols
    # classification codes for a length-4 line by orientation (static)
    h_code = 3 if cfg.horizontal_laser else (2 if cfg.vertical_laser else 0)
    v_code = 2 if cfg.vertical_laser else 0

    member_h, member_v = aux["member_h"], aux["member_v"]
    hl, vl = aux["hl"], aux["vl"]
    lcnt, rcnt = aux["lcnt"], aux["rcnt"]
    ucnt, dcnt = aux["ucnt"], aux["dcnt"]
    cand_h, cand_v = aux["cand_h"], aux["cand_v"]
    hext, vext = aux["hext"], aux["vext"]
    lext, rext = aux["lext"], aux["rext"]
    uext, dext = aux["uext"], aux["dext"]
    r_ids = jax.lax.broadcasted_iota(jnp.int32, member_h.shape, 0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, member_h.shape, 1)
    zb = jnp.zeros_like(member_h)
    zi = jnp.zeros_like(hl)

    def rs_row(val_i):  # sum of val over the cell's horizontal colour run
        return (
            val_i
            + _chain_wsum(val_i, aux["eq_l"], _shift_c, 1, C)
            + _chain_wsum(val_i, aux["eq_r"], _shift_c, -1, C)
        )

    def rs_col(val_i):
        return (
            val_i
            + _chain_wsum(val_i, aux["eq_u"], _shift_r, 1, R)
            + _chain_wsum(val_i, aux["eq_d"], _shift_r, -1, R)
        )

    if not cfg.bomb:
        # Sharing cannot pair lines: every line classifies by length alone.
        if cfg.cookie:
            len_bad = (member_h & (hl >= 9)) | (member_v & (vl >= 9))
        else:
            len_bad = zb  # >=5 primaries are plain normals
        ext_bad = (cand_h & (hext >= 4)) | (cand_v & (vext >= 4))
        reasons = (
            _lane_any(len_bad) * REASON_LEN5 + _lane_any(ext_bad) * REASON_EXT4
        )
        simple = _lane_any(len_bad | ext_bad) == 0

        h4 = member_h & (hl == 4) & (lcnt == 1) if h_code else zb
        v4 = member_v & (vl == 4) & (ucnt == 1) if v_code else zb
        if cfg.cookie:
            ck_h = member_h & (hl >= 5) & (hl <= 8) & (lcnt == 2)
            ck_v = member_v & (vl >= 5) & (vl <= 8) & (ucnt == 2)
            keep = (member_h & (hl >= 6) & (hl <= 7) & (lcnt >= 5)) | (
                member_v & (vl >= 6) & (vl <= 7) & (ucnt >= 5)
            )
        else:
            ck_h = ck_v = keep = zb
        create = h4 | v4 | ck_h | ck_v
        code = jnp.where(
            h4, h_code, jnp.where(v4, v_code, jnp.where(ck_h | ck_v, -1, 0))
        )
        return simple, create, code, keep, reasons

    if R * C > 256:
        # Big boards: even the pairwise table's unrolled chain reductions
        # crash the remote Mosaic compiler at 20x20 — use the lean
        # predicate (sharing and >=5 lines defer to the machinery).
        return _lean_trip_tile(cfg, union, aux, k, h_code, v_code, zb)

    # ---- bomb enabled: pair + STAR case tables ----------------------------
    # A sharing component is absorbable when it is a pure CROSS pair (both
    # primaries share exactly once) or a STAR: one centre primary with any
    # number of extension-generator leaves (each ext shares only with its
    # centre).  The classification queue's pop order (sort by first-coord
    # row, stable, primaries inserted before extensions) is statically
    # resolvable for stars:
    #   * v-centre: the centre ALWAYS pops first (its top row is above every
    #     generator row);
    #   * h-centre: exts with uext >= 1 pop before the centre (their first
    #     row is above the flag row), the centre before uext == 0 exts.
    # The single bomb-pair event happens at the first length-3 line in pop
    # order (length-4 lines pop as lasers first, `board.py:295`), pairing
    # with the first still-queued sharing line — everything afterwards
    # resolves independently by its own length.  Star size 1 reproduces the
    # round-5 pairwise table exactly.
    BIGI = jnp.int32(1 << 20)
    cross = member_h & member_v
    ch_i = jnp.where(cand_h, 1, 0)
    cv_i = jnp.where(cand_v, 1, 0)
    mh_i = jnp.where(member_h, 1, 0)
    mv_i = jnp.where(member_v, 1, 0)
    cr_i = jnp.where(cross, 1, 0)

    # per-v-run aggregates (one v-run per column → column reductions)
    n_gh_col = jnp.sum(ch_i, axis=0, keepdims=True)  # [1, C, TB]
    n_crv_col = jnp.sum(cr_i * mv_i, axis=0, keepdims=True)
    nsh_v = n_gh_col + n_crv_col  # broadcasts over the column
    vl_col = jnp.max(mv_i * vl, axis=0, keepdims=True)
    unsh_v = member_v & (nsh_v == 0)

    # per-h-run aggregates (chain reductions: several runs share the flag
    # row, and maximal colour runs == the lines exactly)
    n_gv_run = rs_row(cv_i)  # valid at member_h cells
    n_crh_run = rs_row(cr_i * mh_i)
    nsh_h = n_gv_run + n_crh_run
    unsh_h = member_h & (nsh_h == 0)

    def rmax_row(val_i, minval):
        return jnp.maximum(
            val_i,
            jnp.maximum(
                _chain_wmax(val_i, aux["eq_l"], _shift_c, 1, C, minval),
                _chain_wmax(val_i, aux["eq_r"], _shift_c, -1, C, minval),
            ),
        )

    # ---- residual defers --------------------------------------------------
    multi = (
        # extension lines sharing a non-primary cell with each other
        (aux["nonprim"] & aux["cover_h"] & aux["cover_v"])
        # two same-orientation extensions in one row/col could overlap
        | (cand_h & (jnp.sum(ch_i, axis=1, keepdims=True) >= 2))
        | (cand_v & (jnp.sum(cv_i, axis=0, keepdims=True) >= 2))
        # cross mixed with extensions on the same line stays sequential
        # (except crosses as leaves of a v cookie-centre, handled below)
        | (member_h & (n_gv_run >= 1) & (n_crh_run >= 1))
        # two crosses on one line
        | (member_h & (n_crh_run >= 2))
        | (member_v & (n_crv_col >= 2))
    )
    ext_bad = (cand_h & (hext >= 5)) | (cand_v & (vext >= 5))

    # ---- v-centre stars (centre pops first, leaves independent) -----------
    v_star = member_v & (n_gh_col >= 1) & (n_crv_col == 0)
    # vl==3: bomb at the TOPMOST generator (first ext in the sorted queue —
    # ext first rows are their generator rows, one generator per row)
    top_g_row = jnp.min(
        jnp.where(cand_h, r_ids, BIGI), axis=0, keepdims=True
    )  # [1, C, TB]
    v3_top = cand_h & (vl == 3) & (n_crv_col == 0) & (r_ids == top_g_row)
    # vl==4: centre lasers first; a len-4 ext whose row is the laser pick
    # row (ucnt==1) loses its own pick cell to taken_pos → defer
    v4_star_bad = cand_h & (vl == 4) & (hext == 4) & (ucnt == 1)
    # v cookie-centre (5..7; len-8's re-queued remainder can re-pair) —
    # crosses ARE allowed as leaves (they resolve independently after the
    # centre cookies itself away), if the crossing line is a clean leaf
    v_ck_ok = (
        member_v & (vl >= 5) & (vl <= 7) & (nsh_v >= 1)
        if cfg.cookie
        else zb
    )
    # a len-4 ext generated on the cookie-pick row loses the pick cell
    v_ck_bad = cand_h & (vl >= 5) & (vl <= 7) & (hext == 4) & (ucnt == 2)
    # leaves of a v cookie-centre: the crossing h-run must itself be a
    # single-share len-3/4 line
    v_ck_col = jnp.max(jnp.where(v_ck_ok, 1, 0), axis=0, keepdims=True) > 0
    cross_leaf = cross & v_ck_col & (nsh_h == 1) & ((hl == 3) | (hl == 4))

    # ---- h-centre stars ---------------------------------------------------
    h_star = member_h & (n_gv_run >= 1) & (n_crh_run == 0)
    e3 = cand_v & (vext == 3) & (uext >= 1)  # bomb trigger before the centre
    has_e3 = rs_row(jnp.where(e3, 1, 0)) > 0  # run-wide
    # case A initiator: first len-3 uext>=1 ext in pop order = max uext,
    # ties → leftmost generator
    init_key = jnp.where(e3, uext * C + (C - 1 - c_ids), -1)
    initA = e3 & (init_key == rmax_row(init_key, jnp.int32(-1))) & h_star
    # case B partner: centre len-3 pops and pairs with the leftmost
    # still-queued (uext==0) ext, any length
    u0g = cand_v & (uext == 0)
    u0_key = jnp.where(u0g, C - 1 - c_ids, -1)
    has_u0 = rs_row(jnp.where(u0g, 1, 0)) > 0
    partB = (
        u0g
        & (u0_key == rmax_row(u0_key, jnp.int32(-1)))
        & h_star
        & ~has_e3
        & (hl == 3)
    )
    # h-centre lasers (hl==4, no e3): a len-4 uext==1 ext lasers at its own
    # generator (a centre cell) first, shifting the centre's pick; a len-4
    # uext==0 ext whose generator sits on the centre's pick column loses
    # its own pick
    h4_star_bad = h_star & (hl == 4) & ~has_e3 & (
        rs_row(
            jnp.where(
                (cand_v & (vext == 4) & (uext == 1))
                | (cand_v & (vext == 4) & (uext == 0) & (lcnt == 1)),
                1,
                0,
            )
        )
        > 0
    )
    # h cookie-centre (5..7): a len-3 uext>=1 ext would bomb-pair with the
    # centre (partner shrink + requeued fragments) → defer; len-4 uext==1
    # exts laser at a centre cell before the centre picks; len-4 uext==0
    # exts on the pick column lose their pick
    h_ck_ok = (
        member_h & (hl >= 5) & (hl <= 7) & (nsh_h >= 1) & (n_crh_run == 0)
        & ~has_e3
        if cfg.cookie
        else zb
    )
    h_ck_bad = member_h & (hl >= 5) & (hl <= 7) & (
        has_e3
        | (
            rs_row(
                jnp.where(
                    (cand_v & (vext == 4) & (uext == 1))
                    | (cand_v & (vext == 4) & (uext == 0) & (lcnt == 2)),
                    1,
                    0,
                )
            )
            > 0
        )
    ) & (n_gv_run >= 1)

    # ---- length defers ----------------------------------------------------
    shared_h = member_h & (nsh_h >= 1)
    shared_v = member_v & (nsh_v >= 1)
    if cfg.cookie:
        len_bad = (
            (member_h & (hl >= 9))
            | (member_v & (vl >= 9))
            | (shared_h & (hl == 8))
            | (shared_v & (vl == 8))
            | (shared_h & (hl >= 5) & (hl <= 7) & ~(h_ck_ok & ~h_ck_bad))
            | (shared_v & (vl >= 5) & (vl <= 7) & ~v_ck_ok)
        )
    else:
        # a shared >=5 line still bomb-pairs (order-dependent) → defer
        len_bad = (shared_h & (hl >= 5)) | (shared_v & (vl >= 5))

    # ---- cross pairs (both sides single-share) ----------------------------
    cr_pair = cross & (nsh_h == 1) & (nsh_v == 1)
    cr33 = cr_pair & (hl == 3) & (vl == 3)  # bomb@p, full delete
    cr43 = cr_pair & (hl == 4) & (vl == 3)  # bomb@p, h-run survivor
    crv4 = cr_pair & (vl == 4) & ((hl == 3) | (hl == 4))  # v-laser (+h)
    cross_bad = cross & ~(cr33 | cr43 | crv4 | cross_leaf)

    star_bad = (
        v4_star_bad
        | (v_ck_bad & v_ck_col)
        | h4_star_bad
        | (cand_h & (hext <= 4) & (vl == 3) & (n_crv_col >= 1))  # mixed
    )

    reasons = (
        _lane_any(len_bad) * REASON_LEN5
        + _lane_any(ext_bad) * REASON_EXT4
        + _lane_any(star_bad | h_ck_bad) * REASON_EXT_BOMB
        + _lane_any(cross_bad) * REASON_CROSS
        + _lane_any(multi) * REASON_MULTI
    )
    simple = (
        _lane_any(
            len_bad | ext_bad | multi | cross_bad | star_bad | h_ck_bad
        )
        == 0
    )

    # ---- creations --------------------------------------------------------
    bomb_cells = (
        cr33
        | cr43
        | v3_top
        | (initA & ((hl == 3) | (hl == 4)))
        | partB
    )

    # v-lasers on a length-4 v-primary: unshared, a crv4 pair, or a v-star
    # centre.  One v-primary per column → column broadcast to the pick cell
    # (offset 1 from the top, `board.py:447`).
    v4_flag = (
        jnp.max(jnp.where(crv4, 1, 0), axis=0, keepdims=True) > 0
    ) | ((n_gh_col >= 1) & (n_crv_col == 0))
    v4 = member_v & (vl == 4) & (ucnt == 1) & ((nsh_v == 0) | v4_flag)
    # h-lasers on a length-4 h-primary: unshared, crv4 with hl==4, h-star
    # case B (no e3 initiator), or a leaf of a v cookie-centre
    h4_flag = (
        rs_row(
            jnp.where((crv4 & (hl == 4)) | cross_leaf, 1, 0)
        )
        > 0
    ) | ((n_gv_run >= 1) & (n_crh_run == 0) & ~has_e3)
    h4 = member_h & (hl == 4) & (lcnt == 1) & ((nsh_h == 0) | h4_flag)

    # extension lasers: pick = ext's second coordinate.  One candidate per
    # row/col (enforced above) → row/col broadcast of the target index.
    # Every len-4 ext of an absorbed structure lasers EXCEPT a bomb partner
    # (v3_top / partB cells keep their bomb).
    ext_vl = (
        cand_v & (vext == 4) & h_star & ~partB
    )  # target row = r - uext + 1
    tgt_vr = jnp.sum(
        jnp.where(ext_vl, r_ids - uext + 2, 0), axis=0, keepdims=True
    )  # [1, C, TB], +1 sentinel
    ext_vl_cells = (r_ids + 1) == tgt_vr
    ext_hl = (
        cand_h & (hext == 4) & ((v_star & ~v3_top) | (v_ck_col & (vl >= 5)))
    )  # target col = c - lext + 1
    tgt_hc = jnp.sum(
        jnp.where(ext_hl, c_ids - lext + 2, 0), axis=1, keepdims=True
    )  # [R, 1, TB]
    ext_hl_cells = (c_ids + 1) == tgt_hc

    # cookies on length-5..8 primaries: unshared (5..8) or star centres (5..7)
    if cfg.cookie:
        ck_h = member_h & (hl >= 5) & (hl <= 8) & (lcnt == 2) & (
            (nsh_h == 0) | h_ck_ok
        )
        ck_v = member_v & (vl >= 5) & (vl <= 8) & (ucnt == 2) & (
            (nsh_v == 0) | v_ck_ok
        )
        ck = ck_h | ck_v
    else:
        ck = zb

    # ---- survivors (cells of the union the resolution never touches) ------
    # length-4 h-run popping second into a bomb: its unique farthest cell
    # from the share point survives (`board.py:309-312` takes the 3 closest)
    hrun_s = cr43 | (initA & (hl == 4))
    surv_col = jnp.where(rcnt > lcnt, c_ids + rcnt, c_ids - lcnt)
    sc_b = rs_row(jnp.where(hrun_s, surv_col + 1, 0))
    keep = member_h & ((c_ids + 1) == sc_b)
    # h-extension survivor: the bomb partner of a vl==3 star when len 4
    hx_surv = jnp.where(rext > lext, c_ids + rext, c_ids - lext)
    tgt_sc = jnp.sum(
        jnp.where(v3_top & (hext == 4), hx_surv + 1, 0),
        axis=1,
        keepdims=True,
    )
    keep = keep | (((c_ids + 1) == tgt_sc) & aux["nonprim"])
    # v-extension survivor: a case-B partner of len 4 (uext==0 → farthest
    # is r + dext)
    tgt_sr = jnp.sum(
        jnp.where(partB & (vext == 4), r_ids + dext + 1, 0),
        axis=0,
        keepdims=True,
    )
    keep = keep | (((r_ids + 1) == tgt_sr) & aux["nonprim"])
    if cfg.cookie:
        # cookie lines keep their offset>=5 cells — except those that are
        # also a leaf's cells (a generator, or a crossing line's cell),
        # which that leaf's own resolution deletes.  A remainder cell can
        # also be the END cell of a perpendicular PRIMARY line (an L-share
        # invisible to nsh_*, which only counts generators/crossings) —
        # that line's own match deletes it (`board.py:287-292` drops the
        # remainder without deleting, but the perpendicular pop already
        # removed the cell), so member cells of the other orientation are
        # never kept.
        keep = keep | (
            member_h & (hl >= 6) & (hl <= 7) & (lcnt >= 5)
            & ((nsh_h == 0) | h_ck_ok) & ~cand_v & ~cross & ~member_v
        )
        keep = keep | (
            member_v & (vl >= 6) & (vl <= 7) & (ucnt >= 5)
            & ((nsh_v == 0) | v_ck_ok) & ~cand_h & ~cross & ~member_h
        )

    vl_cells = (v4 | ext_vl_cells) if v_code else zb
    hl_cells = (h4 | ext_hl_cells) if h_code else zb
    create = bomb_cells | vl_cells | hl_cells | ck
    code = jnp.where(
        bomb_cells,
        4,
        jnp.where(
            vl_cells, v_code, jnp.where(hl_cells, h_code, jnp.where(ck, -1, 0))
        ),
    )
    return simple, create, code, keep, reasons


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


def _settled_mask_tile(x, R, C):
    """[A, TB] i32 effective-action mask for SETTLED all-normal boards —
    the in-kernel transcription of ``ops/effective.effective_mask_settled``
    with every kind term constant-folded (no-specials boards are all
    kind==1): 8 colour stencils per swap direction.  Output rows follow the
    action-table order (`board.py:78-93`): C*(R-1) down-swaps row-major,
    then R*(C-1) right-swaps row-major."""
    F = jnp.int32(-1)

    def v(dr, dc):  # value at (r+dr, c+dc); out-of-board = -1
        out = x
        if dc:
            out = _shift_c(out, -dc, F)
        if dr:
            out = _shift_r(out, -dr, F)
        return out

    A_ = x
    # down-swap (r,c)<->(r+1,c): coord1 takes B = colour below, coord2
    # takes A.  Stencils through coord1 exclude the partner cell (away=up);
    # through coord2 exclude upward (away=down).
    B_ = v(1, 0)
    down = (
        ((v(0, -2) == B_) & (v(0, -1) == B_))
        | ((v(0, -1) == B_) & (v(0, 1) == B_))
        | ((v(0, 1) == B_) & (v(0, 2) == B_))
        | ((v(-2, 0) == B_) & (v(-1, 0) == B_))
        | ((v(1, -2) == A_) & (v(1, -1) == A_))
        | ((v(1, -1) == A_) & (v(1, 1) == A_))
        | ((v(1, 1) == A_) & (v(1, 2) == A_))
        | ((v(2, 0) == A_) & (v(3, 0) == A_))
    )
    Br = v(0, 1)
    right = (
        ((v(-2, 0) == Br) & (v(-1, 0) == Br))
        | ((v(-1, 0) == Br) & (v(1, 0) == Br))
        | ((v(1, 0) == Br) & (v(2, 0) == Br))
        | ((v(0, -2) == Br) & (v(0, -1) == Br))
        | ((v(-2, 1) == A_) & (v(-1, 1) == A_))
        | ((v(-1, 1) == A_) & (v(1, 1) == A_))
        | ((v(1, 1) == A_) & (v(2, 1) == A_))
        | ((v(0, 2) == A_) & (v(0, 3) == A_))
    )
    down_i = jnp.where(down, 1, 0)[: R - 1].reshape((R - 1) * C, TB)
    right_i = jnp.where(right, 1, 0)[:, : C - 1, :].reshape(R * (C - 1), TB)
    return jnp.concatenate([down_i, right_i], axis=0)


def _settled_mask_sp_tile(x, k, R, C, any_special):
    """[A, TB] i32 settled effective mask for boards WITH specials — the
    full ``effective_mask_settled`` semantics: every stencil ANDs the last
    (rightmost/bottom) cell's kind >= 0 (post-swap kind when the last cell
    is a swapped cell — the cookie-end quirk), plus the special-pair /
    any-cookie terms (`board.py:741-745`)."""
    FC = jnp.int32(-1)
    FK = jnp.int32(1)

    def v(dr, dc):
        out = x
        if dc:
            out = _shift_c(out, -dc, FC)
        if dr:
            out = _shift_r(out, -dr, FC)
        return out

    def vk(dr, dc):
        out = k
        if dc:
            out = _shift_c(out, -dc, FK)
        if dr:
            out = _shift_r(out, -dr, FK)
        return out

    A_ = x
    kA = k
    # down-swap (r,c)<->(r+1,c)
    B_ = v(1, 0)
    kB = vk(1, 0)
    down = (
        ((v(0, -2) == B_) & (v(0, -1) == B_) & (kB >= 0))
        | ((v(0, -1) == B_) & (v(0, 1) == B_) & (vk(0, 1) >= 0))
        | ((v(0, 1) == B_) & (v(0, 2) == B_) & (vk(0, 2) >= 0))
        | ((v(-2, 0) == B_) & (v(-1, 0) == B_) & (kB >= 0))
        | ((v(1, -2) == A_) & (v(1, -1) == A_) & (kA >= 0))
        | ((v(1, -1) == A_) & (v(1, 1) == A_) & (vk(1, 1) >= 0))
        | ((v(1, 1) == A_) & (v(1, 2) == A_) & (vk(1, 2) >= 0))
        | ((v(2, 0) == A_) & (v(3, 0) == A_) & (vk(3, 0) >= 0))
    )
    if any_special:
        down = down | (
            ((kA != 0) & (kA != 1) & (kB != 0) & (kB != 1))
            | (kA < 0)
            | (kB < 0)
        )
    Br = v(0, 1)
    kBr = vk(0, 1)
    right = (
        ((v(-2, 0) == Br) & (v(-1, 0) == Br) & (kBr >= 0))
        | ((v(-1, 0) == Br) & (v(1, 0) == Br) & (vk(1, 0) >= 0))
        | ((v(1, 0) == Br) & (v(2, 0) == Br) & (vk(2, 0) >= 0))
        | ((v(0, -2) == Br) & (v(0, -1) == Br) & (kBr >= 0))
        | ((v(-2, 1) == A_) & (v(-1, 1) == A_) & (kA >= 0))
        | ((v(-1, 1) == A_) & (v(1, 1) == A_) & (vk(1, 1) >= 0))
        | ((v(1, 1) == A_) & (v(2, 1) == A_) & (vk(2, 1) >= 0))
        | ((v(0, 2) == A_) & (v(0, 3) == A_) & (vk(0, 3) >= 0))
    )
    if any_special:
        right = right | (
            ((kA != 0) & (kA != 1) & (kBr != 0) & (kBr != 1))
            | (kA < 0)
            | (kBr < 0)
        )
    down_i = jnp.where(down, 1, 0)[: R - 1].reshape((R - 1) * C, TB)
    right_i = jnp.where(right, 1, 0)[:, : C - 1, :].reshape(R * (C - 1), TB)
    return jnp.concatenate([down_i, right_i], axis=0)


def _mask_sp_kernel(R, C, col_ref, kind_ref, out_mask):
    x = col_ref[:].reshape(R, C, TB)
    k = kind_ref[:].reshape(R, C, TB)
    out_mask[:] = _settled_mask_sp_tile(x, k, R, C, True)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def settled_mask_sp(cfg: EnvConfig, colour_b, kind_b, interpret: bool = False):
    """Kernel-computed ``effective_mask_settled`` for a batch of
    specials-config boards: bool[B, A]."""
    B, R, C = colour_b.shape
    A = cfg.num_actions
    Bp = ((B + TB - 1) // TB) * TB
    n_tiles = Bp // TB

    def to_t(a, fill):
        a = jnp.transpose(a.reshape(B, R * C)).astype(jnp.int32)
        return jnp.pad(a, ((0, 0), (0, Bp - B)), constant_values=fill)

    out = pl.pallas_call(
        functools.partial(_mask_sp_kernel, R, C),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((R * C, TB), lambda i: (0, i)),
            pl.BlockSpec((R * C, TB), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((A, TB), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((A, Bp), jnp.int32),
        interpret=interpret,
    )(to_t(colour_b, 0), to_t(kind_b, 1))
    return jnp.transpose(out[:, :B]) > 0


def _cascade_kernel(
    R, C, K, limit_ref, col_ref, keys_ref, trips_ref, elim_ref,
    out_col, out_trips, out_elim, out_active, out_mask,
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
        kw = keys_ref[pl.ds(t, 1)].reshape(4, TB)
        fill = _fill_tile(kw, R, C, K)
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
    # post-cascade effective-action mask, free of the step's biggest XLA
    # remainder (the vmapped settled-mask stencils were 47% of the
    # no-specials step, BENCH.md r4 roofline)
    out_mask[:] = _settled_mask_tile(x, R, C)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_cascade(cfg: EnvConfig, colour_b, sub_keys, interpret: bool = False):
    """Run the full no-specials cascade for a batch of boards.

    colour_b: i32[B, R, C] post-swap boards; sub_keys: per-board threefry
    keys (the `sub` of `engine_move`'s `key, sub = split(key)`).  Returns
    (colour_b, elim_b, trips_b, truncated_b, mask_b) — bit-identical to the
    XLA cascade loop (same fills: trip t of board b draws
    `draw_colour_grid(fold_in(sub_b, t))`, replicated in-kernel) plus the
    post-cascade settled effective-action mask (bool[B, A]).
    """
    B, R, C = colour_b.shape
    T = cfg.max_cascades
    A = cfg.num_actions
    Bp = ((B + TB - 1) // TB) * TB
    n_tiles = Bp // TB

    # [R*C, Bp] — batch on lanes; pad lanes are all-zero (line-free, inert)
    col_t = jnp.transpose(colour_b.reshape(B, R * C)).astype(jnp.int32)
    col_t = jnp.pad(col_t, ((0, 0), (0, Bp - B)))
    trips = jnp.zeros((1, Bp), jnp.int32)
    elim = jnp.zeros((1, Bp), jnp.int32)

    kernel = functools.partial(_cascade_kernel, R, C, cfg.num_colours)

    def chunk_call(col_t, fills, trips, elim, limit):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # (1,1) limit scalar
                pl.BlockSpec((R * C, TB), lambda i: (0, i)),
                pl.BlockSpec((TC, 4, TB), lambda i: (0, 0, i)),
                pl.BlockSpec((1, TB), lambda i: (0, i)),
                pl.BlockSpec((1, TB), lambda i: (0, i)),
            ],
            out_specs=(
                pl.BlockSpec((R * C, TB), lambda i: (0, i)),
                pl.BlockSpec((1, TB), lambda i: (0, i)),
                pl.BlockSpec((1, TB), lambda i: (0, i)),
                pl.BlockSpec((1, TB), lambda i: (0, i)),
                pl.BlockSpec((A, TB), lambda i: (0, i)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((R * C, Bp), jnp.int32),
                jax.ShapeDtypeStruct((1, Bp), jnp.int32),
                jax.ShapeDtypeStruct((1, Bp), jnp.int32),
                jax.ShapeDtypeStruct((1, Bp), jnp.int32),
                jax.ShapeDtypeStruct((A, Bp), jnp.int32),
            ),
            interpret=interpret,
        )(limit, col_t, fills, trips, elim)

    def run_chunk(carry):
        col_t, trips, elim, t0, act, mask = carry
        fills = _fill_key_words(
            sub_keys, jnp.full((B,), 1, jnp.int32) * t0, TC, Bp
        )
        limit = jnp.minimum(jnp.int32(TC), T - t0).reshape(1, 1)
        col_t, trips, elim, act, mask = chunk_call(
            col_t, fills, trips, elim, limit
        )
        return col_t, trips, elim, t0 + TC, act, mask

    def outer_cond(carry):
        col_t, trips, elim, t0, act, mask = carry
        return (jnp.sum(act) > 0) & (t0 < T)

    # the first chunk always runs (0-trip batches exit in-kernel instantly)
    carry = run_chunk(
        (
            col_t, trips, elim, jnp.int32(0), jnp.ones((1, Bp), jnp.int32),
            jnp.zeros((A, Bp), jnp.int32),
        )
    )
    col_t, trips, elim, t0, act, mask = jax.lax.while_loop(
        outer_cond, run_chunk, carry
    )

    colour_out = jnp.transpose(col_t[:, :B]).reshape(B, R, C)
    # per-lane truncation: still lined after the trip budget (mirrors the
    # XLA loop's post-exit has_any_line check in engine_move)
    truncated = act[0, :B] > 0
    # post-cascade settled effective mask (kernel-computed; inactive lanes'
    # masks were recomputed identically on their unchanged boards)
    mask_out = jnp.transpose(mask[:, :B]) > 0  # [B, A] bool
    return colour_out, elim[0, :B], trips[0, :B], truncated, mask_out


def cascade_reference(cfg: EnvConfig, colour_b, sub_keys):
    """The XLA twin of `fused_cascade` (vmapped while_loop, same fills,
    same post-cascade settled mask) — the parity oracle for the kernel in
    tests."""
    from .board_ops import apply_refill, gravity
    from .effective import effective_mask_settled
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
        mask = effective_mask_settled(cfg, colour, kind)
        return colour, elim, it, trunc, mask

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
    R, C, Tmax, cfg, tf_fills, limit_ref, col_ref, kind_ref, keys_ref,
    trips_ref, elim_ref, frozen_ref,
    out_col, out_kind, out_trips, out_elim, out_new, out_act, out_frozen,
    out_active, out_reasons,
):
    x0 = col_ref[:].reshape(R, C, TB)
    k0 = kind_ref[:].reshape(R, C, TB)
    limit = limit_ref[0, 0]

    def cond(carry):
        x, k, trips, elim, new, act, frozen, reasons, t = carry
        # cheap liveness check (~20 ops) BEFORE the ~500-op body: the outer
        # rounds loop relaunches this kernel after every machinery round,
        # and most tiles have nothing left to consume — without this check
        # every relaunch paid one full body per tile (39ms of a 127ms step
        # at b16384, round-5 XProf)
        live = (
            _active_tile(x)
            * jnp.where(frozen == 0, 1, 0)
            * jnp.where(trips < Tmax, 1, 0)
        )
        return (t < limit) & (jnp.sum(live) > 0)

    def body(carry):
        x, k, trips, elim, new, act, frozen, reasons, t = carry
        union, exists, aux = _union_mask_tile(x, R, C, want_aux=True)
        shape_ok, create, code, keep, rbits = _simple_trip_tile(
            cfg, union, aux, k
        )
        # cells the resolution actually deletes: `keep` marks union cells no
        # match's coordinate list contains (cookie lines take only line[:5],
        # a bomb's length-4 partner only its 3 closest coords)
        dele_b = union & ~keep

        # ---- special tiles among the deleted cells: none, or a CONVERGED
        # laser/bomb activation set.  `board.py:503-528` wipes each
        # activated special's column/row/3x3 cell by cell, recursing into
        # any special the wipe hits — since every deletion under these
        # conditions is a normal tile (side-effect-free) the wipes commute,
        # so the closed form is "delete cells ∪ all activated regions" with
        # the activated set S computed as a transitive closure: start from
        # the deleted cells' lasers/bombs, add every special any region
        # hits, re-expand.  Cookies anywhere in the closure
        # (activation-time colour choice) and closures that do not converge
        # within _NEXP expansions stay complex and defer to the machinery.
        _NEXP = 4
        spec_cells = dele_b & (k != 1)
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
        dele = (dele_b | region) & proc3
        cre = create & proc3
        line_colour = x  # pre-delete colour at the pick cell
        x = jnp.where(dele, 0, x)
        k = jnp.where(dele, 0, k)
        # phase-3 creation (`board.py:426-427, 572-597`): special at each
        # pick cell with the line's colour — except cookies, which are
        # colourless (code -1 → colour 0, `board.py:577-596`)
        x = jnp.where(cre, jnp.where(code == -1, 0, line_colour), x)
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
        if tf_fills:
            kw = keys_ref[pl.ds(t, 1)].reshape(4, TB)
            fill = _fill_tile(kw, R, C, cfg.num_colours)
        else:
            # big boards: the in-kernel threefry unroll (~220 extra ops on
            # [R, C, TB]) breaks the remote Mosaic compiler at R*C=400 —
            # consume grids precomputed by the wrapper instead
            fill = keys_ref[pl.ds(t, 1)].reshape(R, C, TB)
        refill = (x == 0) & (k == 0)
        x = jnp.where(refill, fill, x)
        k = jnp.where(refill, 1, k)
        trips = trips + proc
        return x, k, trips, elim, new, act, frozen, reasons, t + 1

    x, k, trips, elim, new, act, frozen, reasons, _ = jax.lax.while_loop(
        cond,
        body,
        (
            x0, k0, trips_ref[:], elim_ref[:],
            jnp.zeros_like(elim_ref[:]), jnp.zeros_like(elim_ref[:]),
            frozen_ref[:], jnp.zeros_like(elim_ref[:]), jnp.int32(0),
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

    # in-kernel threefry (small boards): only the 4 fold_in/split key words
    # per (lane, trip) cross HBM.  Big boards (R*C > 256) precompute the
    # grids with the exact jax.random ops instead — the threefry unroll on
    # [R, C, TB] breaks the remote Mosaic compiler at 20x20.
    tf_fills = R * C <= 256
    if tf_fills:
        fills = _fill_key_words(sub_keys, trips_b.astype(jnp.int32), TC, Bp)
        fills_spec = pl.BlockSpec((TC, 4, TB), lambda i: (0, 0, i))
    else:
        js = jnp.arange(TC, dtype=jnp.int32)

        def per_board(k, base):
            return jax.vmap(
                lambda j: draw_colour_grid(jax.random.fold_in(k, base + j), cfg)
            )(js)

        f = jax.vmap(per_board)(sub_keys, trips_b.astype(jnp.int32))
        f = jnp.transpose(f.reshape(B, TC, R * C), (1, 2, 0))
        fills = jnp.pad(f, ((0, 0), (0, 0), (0, Bp - B)))
        fills_spec = pl.BlockSpec((TC, R * C, TB), lambda i: (0, 0, i))

    limit = jnp.full((1, 1), TC, jnp.int32)
    kernel = functools.partial(_cascade_sp_kernel, R, C, T, cfg, tf_fills)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R * C, TB), lambda i: (0, i)),
            pl.BlockSpec((R * C, TB), lambda i: (0, i)),
            fills_spec,
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

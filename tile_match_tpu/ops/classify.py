"""Greedy match classification: fixed-shape machine for ``process_colour_lines``.

Reference semantics (`board.py:269-327`), replicated exactly:

* lines are processed as a queue, initially stable-sorted by the row of each
  line's first (topmost) coordinate (`board.py:282`);
* pop front; greedy priority: cookie (len>=5, enabled) → laser (len==4) →
  bomb (enabled, shares a coord with another queued line) → normal (len>=3);
* cookie consumes the first 5 coords and re-appends the remainder if longer
  than 2 (`board.py:287-292`);
* a horizontal 4-line falls back to a vertical laser when horizontal lasers
  are disabled but vertical ones are enabled (`board.py:297-302` quirk);
* bomb takes the whole line plus the 3 partner-line coords closest (Manhattan,
  stable) to the first shared coord; the partner is dropped when shorter than
  6, else those 3 coords are removed from it (`board.py:304-320`).

Instead of Python lists, the queue lives in fixed slot arrays with integer
order keys: pop = argmin(order), append = fresh slot with a monotonically
increasing key, remove = key := BIG.  The whole machine is one
``lax.while_loop`` with masked vector updates, so it jits and vmaps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..config import (
    EnvConfig,
    MATCH_BOMB,
    MATCH_COOKIE,
    MATCH_H_LASER,
    MATCH_NORMAL,
    MATCH_V_LASER,
)
from .lines import LineSet
from .runs import BIG


@struct.dataclass
class Matches:
    coords: jnp.ndarray  # i32[MM, CM, 2]; (-1,-1) padded
    length: jnp.ndarray  # i32[MM]
    mtype: jnp.ndarray  # i32[MM] (MATCH_* codes)
    mcolour: jnp.ndarray  # i32[MM]
    count: jnp.ndarray  # i32 scalar


def _coord_eq(a, b):
    """a: [..., 2], b: [..., 2] broadcastable → elementwise coord equality."""
    return (a[..., 0] == b[..., 0]) & (a[..., 1] == b[..., 1])


def process_colour_lines(cfg: EnvConfig, colour, lineset: LineSet) -> Matches:
    LM = cfg.lines_max
    L = cfg.line_len_max
    LM2 = 2 * LM  # initial slots + append slots
    CM = cfg.match_coords_max
    ITER = 2 * LM2
    MM = ITER

    # --- working queue -----------------------------------------------------
    lc = jnp.full((LM2, L, 2), -1, jnp.int32)
    lc = lc.at[:LM].set(lineset.coords)
    ll = jnp.zeros((LM2,), jnp.int32).at[:LM].set(lineset.length)
    slot_ids = jnp.arange(LM2, dtype=jnp.int32)
    alive0 = (slot_ids < lineset.count) & (ll > 0)
    top_row = lc[:, 0, 0]
    lo = jnp.where(alive0, top_row * LM + slot_ids[:LM2], BIG)

    m_coords = jnp.full((MM, CM, 2), -1, jnp.int32)
    m_len = jnp.zeros((MM,), jnp.int32)
    m_type = jnp.zeros((MM,), jnp.int32)
    m_colour = jnp.zeros((MM,), jnp.int32)

    # ---- per-board all-normal fast path ----------------------------------
    # The queue machine only matters when some line can classify as a special
    # (len>=4 with a laser/cookie enabled; any shared coord with bomb
    # enabled).  Otherwise every pop emits a NORMAL match of the whole line,
    # in initial order-key order — computable in one shot.  Boards on this
    # path contribute ZERO trips to the while_loop below (their lo is set to
    # BIG), so under vmap they no longer serialise behind the worst board.
    R, C = cfg.num_rows, cfg.num_cols
    bad4 = (
        jnp.any(alive0 & (ll == 4))
        if (cfg.vertical_laser or cfg.horizontal_laser)
        else jnp.asarray(False)
    )
    bad5 = (
        jnp.any(alive0 & (ll >= 5)) if cfg.cookie else jnp.asarray(False)
    )
    if cfg.bomb:
        jj_ = jnp.arange(L, dtype=jnp.int32)[None, :]
        livec = alive0[:, None] & (jj_ < ll[:, None])
        rr_ = jnp.where(livec, jnp.clip(lc[:, :, 0], 0, R - 1), R)
        cc_ = jnp.where(livec, jnp.clip(lc[:, :, 1], 0, C - 1), C)
        cnt = (
            jnp.zeros((R + 1, C + 1), jnp.int32)
            .at[rr_, cc_]
            .add(livec.astype(jnp.int32))[:R, :C]
        )
        bad_share = jnp.any(cnt >= 2)
    else:
        bad_share = jnp.asarray(False)
    can_fast = ~(bad4 | bad5 | bad_share)

    order = jnp.argsort(jnp.where(alive0, lo, BIG))  # [LM2] slot ids by key
    f_live = alive0[order]  # emitted-match liveness, in emission order
    f_len = jnp.where(f_live, ll[order], 0)
    f_coords_L = jnp.where(f_live[:, None, None], lc[order], -1)  # [LM2, L, 2]
    f_coords = jnp.full((LM2, CM, 2), -1, jnp.int32).at[:, :L, :].set(f_coords_L)
    fr0 = jnp.clip(f_coords_L[:, 0, 0], 0, R - 1)
    fc0 = jnp.clip(f_coords_L[:, 0, 1], 0, C - 1)
    f_colour = jnp.where(f_live, colour[fr0, fc0], 0)
    f_type = jnp.where(f_live, MATCH_NORMAL, 0)
    f_count = jnp.sum(f_live.astype(jnp.int32))

    lo = jnp.where(can_fast, BIG, lo)

    def cond(carry):
        lo, *_ = carry
        return jnp.any(lo < BIG)

    def body(carry):
        lo, lc, ll, atail, next_order, mc, mlen, mt, mcol, mcount = carry

        sel = jnp.argmin(lo)
        n = ll[sel]
        line = lc[sel]  # [L, 2]
        jj = jnp.arange(L, dtype=jnp.int32)
        in_line_n = jj < n
        # kill popped slot
        lo = lo.at[sel].set(BIG)
        ll = ll.at[sel].set(0)

        first = line[0]
        line_colour = colour[jnp.maximum(first[0], 0), jnp.maximum(first[1], 0)]

        cookie_case = jnp.asarray(cfg.cookie and True) & (n >= 5)
        laser_case = (~cookie_case) & (n == 4)

        # --- bomb partner search (only when bomb enabled: static prune) ----
        if cfg.bomb:
            # Scatter the popped line's coords into a bool grid, then test
            # every queued slot's coords against it with one gather: [LM2, L]
            # instead of the O(LM2*L*L) all-pairs coord comparison.
            R_, C_ = cfg.num_rows, cfg.num_cols
            g_rows = jnp.where(in_line_n, jnp.clip(line[:, 0], 0, R_ - 1), R_)
            g_cols = jnp.where(in_line_n, jnp.clip(line[:, 1], 0, C_ - 1), C_)
            g = (
                jnp.zeros((R_ + 1, C_ + 1), bool)
                .at[g_rows, g_cols]
                .set(True)[:R_, :C_]
            )
            kk = jnp.arange(L, dtype=jnp.int32)
            cover = (
                g[jnp.clip(lc[:, :, 0], 0, R_ - 1), jnp.clip(lc[:, :, 1], 0, C_ - 1)]
                & (kk[None, :] < ll[:, None])
                & (lo < BIG)[:, None]
            )
            share_line = jnp.any(cover, axis=1)
            exists_share = jnp.any(share_line)
            partner = jnp.argmin(jnp.where(share_line, lo, BIG))
            bomb_case = (
                (~cookie_case) & (~laser_case) & exists_share & (n >= 3)
            )
        else:
            bomb_case = jnp.asarray(False)
        normal_case = (~cookie_case) & (~laser_case) & (~bomb_case) & (n >= 3)

        emit = cookie_case | laser_case | bomb_case | normal_case

        # --- assemble emitted match ----------------------------------------
        out_c = jnp.full((CM, 2), -1, jnp.int32)
        cm_ids = jnp.arange(CM, dtype=jnp.int32)
        keep = jnp.where(cookie_case, jnp.minimum(n, 5), n)
        base = jnp.where(
            (cm_ids < keep)[:, None], lc[sel][jnp.minimum(cm_ids, L - 1)], -1
        )
        out_c = jnp.where((cm_ids < keep)[:, None], base, out_c)
        out_len = keep
        out_colour = jnp.where(cookie_case, 0, line_colour)

        if cfg.cookie:
            out_type_cookie = MATCH_COOKIE
        else:
            out_type_cookie = MATCH_NORMAL  # unreachable
        is_h = line[0, 0] == line[1, 0]
        laser_type = jnp.where(
            is_h & cfg.horizontal_laser,
            MATCH_H_LASER,
            jnp.where(cfg.vertical_laser, MATCH_V_LASER, MATCH_NORMAL),
        )
        out_type = jnp.where(
            cookie_case,
            out_type_cookie,
            jnp.where(laser_case, laser_type, MATCH_NORMAL),
        )

        # --- cookie remainder append ---------------------------------------
        rem_len = n - 5
        if cfg.debug_checks:
            from jax.experimental import checkify

            # a needed re-append with no free slot would silently drop the
            # cookie line's remainder (`board.py:291-292` re-appends freely)
            checkify.check(
                ~(cookie_case & (rem_len > 2) & (atail >= LM2)),
                "classify queue overflow: cookie remainder dropped",
            )
        do_append = cookie_case & (rem_len > 2) & (atail < LM2)
        rem = jnp.where(
            (jj < rem_len)[:, None], lc[sel][jnp.minimum(jj + 5, L - 1)], -1
        )
        app_slot = jnp.minimum(atail, LM2 - 1)
        lc = jnp.where(do_append, lc.at[app_slot].set(rem), lc)
        ll = jnp.where(do_append, ll.at[app_slot].set(rem_len), ll)
        lo = jnp.where(do_append, lo.at[app_slot].set(next_order), lo)
        atail = atail + do_append.astype(jnp.int32)
        next_order = next_order + do_append.astype(jnp.int32)

        # --- bomb: extras + partner update ---------------------------------
        if cfg.bomb:
            # first shared coord in LINE order (all-pairs test against the
            # single chosen partner only: [L, L])
            eqp = (
                _coord_eq(line[:, None, :], lc[partner][None, :, :])
                & in_line_n[:, None]
                & (jnp.arange(L, dtype=jnp.int32)[None, :] < ll[partner])
            )
            shared_j = jnp.argmax(jnp.any(eqp, axis=1))
            shared = line[shared_j]
            p_coords = lc[partner]
            p_len = ll[partner]
            dist = jnp.abs(p_coords[:, 0] - shared[0]) + jnp.abs(
                p_coords[:, 1] - shared[1]
            )
            kk = jnp.arange(L, dtype=jnp.int32)
            # stable sort by (distance, list position); invalid slots sort last
            sort_key = jnp.where(kk < p_len, dist * L + kk, BIG)
            rank = jnp.argsort(sort_key)
            dist = jnp.where(kk < p_len, dist, BIG)
            sel3 = rank[:3]  # indices of the 3 closest partner coords
            sel3_coords = p_coords[sel3]  # [3, 2] in closeness order
            sel3_valid = dist[sel3] < BIG
            # extras: sel3 coords not already in line
            in_line = jnp.any(
                _coord_eq(sel3_coords[:, None, :], line[None, :, :])
                & in_line_n[None, :],
                axis=1,
            )
            extra_ok = sel3_valid & (~in_line)
            extra_pos = n + jnp.cumsum(extra_ok.astype(jnp.int32)) - 1
            bomb_c = out_c
            for t in range(3):
                pos = jnp.minimum(extra_pos[t], CM - 1)
                bomb_c = jnp.where(
                    extra_ok[t], bomb_c.at[pos].set(sel3_coords[t]), bomb_c
                )
            bomb_len = n + jnp.sum(extra_ok.astype(jnp.int32))
            out_c = jnp.where(bomb_case, bomb_c, out_c)
            out_len = jnp.where(bomb_case, bomb_len, out_len)
            out_type = jnp.where(bomb_case, MATCH_BOMB, out_type)

            # partner update
            drop_partner = bomb_case & (p_len < 6)
            lo = jnp.where(drop_partner, lo.at[partner].set(BIG), lo)
            ll = jnp.where(drop_partner, ll.at[partner].set(0), ll)
            shrink = bomb_case & (p_len >= 6)
            removed = jnp.zeros((L,), bool)
            for t in range(3):
                removed = removed | (kk == sel3[t])
            keep_mask = (~removed) & (kk < p_len)
            # stable compaction of kept coords (dropped ones scatter to the
            # spill slot L, which is trimmed off)
            dest = jnp.cumsum(keep_mask.astype(jnp.int32)) - 1
            scatter_idx = jnp.where(keep_mask, dest, L)
            new_p = (
                jnp.full((L + 1, 2), -1, jnp.int32).at[scatter_idx].set(p_coords)[:L]
            )
            lc = jnp.where(shrink, lc.at[partner].set(new_p), lc)
            ll = jnp.where(shrink, ll.at[partner].set(p_len - 3), ll)

        # --- write emitted match -------------------------------------------
        mslot = jnp.minimum(mcount, MM - 1)
        mc = jnp.where(emit, mc.at[mslot].set(out_c), mc)
        mlen = jnp.where(emit, mlen.at[mslot].set(out_len), mlen)
        mt = jnp.where(emit, mt.at[mslot].set(out_type), mt)
        mcol = jnp.where(emit, mcol.at[mslot].set(out_colour), mcol)
        mcount = mcount + emit.astype(jnp.int32)

        return (lo, lc, ll, atail, next_order, mc, mlen, mt, mcol, mcount)

    init = (
        lo,
        lc,
        ll,
        jnp.int32(LM),
        jnp.int32((cfg.num_rows + 2) * LM),
        m_coords,
        m_len,
        m_type,
        m_colour,
        jnp.int32(0),
    )
    out = jax.lax.while_loop(cond, body, init)
    (_, _, _, _, _, mc, mlen, mt, mcol, mcount) = out

    # Merge the all-normal fast path: boards on it ran zero loop trips, so
    # the loop accumulators are empty; select the precomputed fast results.
    f_coords_pad = jnp.full((MM, CM, 2), -1, jnp.int32).at[:LM2].set(f_coords)
    f_len_pad = jnp.zeros((MM,), jnp.int32).at[:LM2].set(f_len)
    f_type_pad = jnp.zeros((MM,), jnp.int32).at[:LM2].set(f_type)
    f_colour_pad = jnp.zeros((MM,), jnp.int32).at[:LM2].set(f_colour)
    mc = jnp.where(can_fast, f_coords_pad, mc)
    mlen = jnp.where(can_fast, f_len_pad, mlen)
    mt = jnp.where(can_fast, f_type_pad, mt)
    mcol = jnp.where(can_fast, f_colour_pad, mcol)
    mcount = jnp.where(can_fast, f_count, mcount)
    return Matches(coords=mc, length=mlen, mtype=mt, mcolour=mcol, count=mcount)

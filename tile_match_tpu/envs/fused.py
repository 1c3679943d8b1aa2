"""Batch-level fused step for no-specials configs (Pallas cascade).

``engine.step`` is per-board and vmapped; its cascade while_loop lowers to
~20 tiny XLA fusions per max-over-batch trip.  This module re-expresses the
SAME semantics at batch level so the cascade runs as the single fused Pallas
kernel (`ops/pallas_cascade.fused_cascade`): swap → fused cascade →
playability/mask (still vmapped XLA: typically zero iterations) → info
assembly.  Output is bit-identical to ``jax.vmap(engine.step)`` — asserted
by tests/envs/test_fused_step.py — because the kernel consumes exactly the
fills the XLA loop would draw and the key evolution is replicated
(`key, sub = split(key)` per effective move).

Only valid when ``cfg.any_special`` is False and kind is all-normal (the
invariant of no-specials configs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import EnvConfig
from ..engine import make_playable
from ..ops.pallas_cascade import fused_cascade
from ..state import EnvState, StepInfo, action_table


def batched_step_fused(
    cfg: EnvConfig,
    states: EnvState,
    actions,
    eff_mask,
    compute_post_mask: bool = True,
    interpret: bool = False,
):
    """Drop-in for ``jax.vmap(lambda s, a, m: engine.step(cfg, s, a,
    eff_mask=m, compute_post_mask=...))`` on no-specials configs.

    Returns (next_states, rewards, dones, infos) with identical values.
    """
    assert not cfg.any_special, "fused step is the no-specials fast path"
    B = actions.shape[0]

    c1_tab, c2_tab = action_table(cfg)
    c1 = jnp.asarray(c1_tab)[actions]  # [B, 2]
    c2 = jnp.asarray(c2_tab)[actions]
    eff = jnp.take_along_axis(eff_mask, actions[:, None], axis=1)[:, 0]

    # ---- swap where effective (engine_move's do_move preamble) ------------
    bi = jnp.arange(B)
    v1 = states.colour[bi, c1[:, 0], c1[:, 1]]
    v2 = states.colour[bi, c2[:, 0], c2[:, 1]]
    r_ids = jax.lax.broadcasted_iota(jnp.int32, states.colour.shape, 1)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, states.colour.shape, 2)
    at1 = (r_ids == c1[:, 0, None, None]) & (c_ids == c1[:, 1, None, None])
    at2 = (r_ids == c2[:, 0, None, None]) & (c_ids == c2[:, 1, None, None])
    swapped = jnp.where(
        at1, v2[:, None, None], jnp.where(at2, v1[:, None, None], states.colour)
    )
    colour = jnp.where(eff[:, None, None], swapped, states.colour)
    # kind is all-normal throughout in no-specials configs

    # ---- key evolution: do_move does `key, sub = split(key)` --------------
    both = jax.vmap(lambda k: jax.random.split(k, 2))(states.key)  # [B, 2, ...]
    key_moved = both[:, 0]
    sub = both[:, 1]
    # no-op boards keep their key untouched (engine's no_op branch)
    key_after = jnp.where(eff[:, None], key_moved, states.key)

    # ---- the fused cascade ------------------------------------------------
    # Non-effective boards pass through line-free → 0 trips, 0 elim, and no
    # fills/keys consumed, exactly like the no_op branch.  The kernel also
    # hands back the post-cascade settled effective mask (computed on the
    # lane layout, replacing the step's largest XLA remainder).
    colour, elim, trips, trunc, kmask = fused_cascade(
        cfg, colour, sub, interpret=interpret
    )

    # ---- playability loop + post mask (vmapped; usually 0 iterations) -----
    def playable(colour, kind, key, m0):
        return make_playable(
            cfg, colour, kind, key, jnp.asarray(False), jnp.int32(0), mask0=m0
        )

    p_colour, p_kind, p_key, p_shuffled, p_mask, p_gave_up = jax.vmap(
        playable
    )(colour, states.kind, key_after, kmask)

    # engine's no_op branch skips make_playable: keep originals there
    effm = eff[:, None, None]
    out_colour = jnp.where(effm, p_colour, states.colour)
    out_kind = jnp.where(effm, p_kind, states.kind)
    out_key = jnp.where(eff[:, None], p_key, states.key)
    shuffled = eff & p_shuffled
    post_mask = jnp.where(eff[:, None], p_mask, eff_mask)
    truncated = eff & (trunc | p_gave_up)
    elim = jnp.where(eff, elim, 0)
    trips = jnp.where(eff, trips, 0)

    timer = states.timer + 1
    done = timer >= cfg.num_moves
    next_states = EnvState(
        colour=out_colour, kind=out_kind, timer=timer, key=out_key
    )
    if compute_post_mask:
        mask_after = jnp.where(done[:, None], False, post_mask)
    else:
        mask_after = post_mask
    infos = StepInfo(
        is_combination_match=jnp.zeros((B,), bool),
        num_new_specials=jnp.zeros((B,), jnp.int32),
        num_specials_activated=jnp.zeros((B,), jnp.int32),
        shuffled=shuffled,
        effective_actions=mask_after,
        truncated=truncated,
        cascade_trips=trips,
    )
    return next_states, elim, done, infos


# ---------------------------------------------------------------------------
# Specials configs: kernel for simple trips, vmapped machinery for complex
# trips (see ops/pallas_cascade.py's specials section for the design).
# ---------------------------------------------------------------------------


def fused_specials_cascade(cfg, colour, kind, sub_keys, interpret=False,
                           with_stats=False):
    """The specials cascade at batch level: consume simple trips in the
    Pallas kernel, run ONE full classify/resolve trip per round for boards
    whose next trip is complex (`engine.specials_cascade_trip` — literally
    the same function the vmapped loop runs), repeat.

    Returns (colour, kind, elim, act, new, trips, trunc), bit-identical to
    the vmapped cascade loop of ``engine.engine_move``.  With ``with_stats``
    (static) a kernel-coverage dict is appended: per-board defer-reason
    bitmask (OR of ops.pallas_cascade.REASON_*), per-board full-machinery
    trip count, and the executed round count — the telemetry behind
    tools/kernel_coverage.py.
    """
    import jax.numpy as jnp

    from ..engine import specials_cascade_trip_grid
    from ..ops.board_ops import draw_colour_grid
    from ..ops.lines import has_any_line
    from ..ops.pallas_cascade import cascade_sp_chunk

    B = colour.shape[0]
    T = cfg.max_cascades
    zi = jnp.zeros((B,), jnp.int32)

    # Full trips run on a COMPACTED sub-batch: the classify/resolve machines'
    # inner while_loops execute max-over-batch pop counts, so running them
    # over all B boards when only the frozen few need a full trip multiplies
    # both the data width and the executed pops.  Gather up to NF frozen
    # boards (leftovers simply stay frozen and are picked up next round),
    # run the machinery at width NF, scatter back via one-hot matmuls
    # (TPU-lowered row scatters serialize; the one-hot contraction doesn't).
    # NF grows with the batch: at b8192+ the round-5 kernel leaves ~0.14
    # full trips per board-step, so a wider compaction halves the round
    # count for a marginal increase in max-over-compacted pops.
    NF = min(256 if B >= 4096 else 128, B)
    bi = jnp.arange(B, dtype=jnp.int32)

    # The outer scheduling budget is decoupled from the per-board trip cap:
    # each round advances at most NF frozen boards through their full trip,
    # so a step where every board needs all T complex trips needs up to
    # T * ceil(B / NF) rounds.  Per-board trips are already capped at T
    # in-kernel (in_budget) and by do_full only touching frozen boards, so
    # this bound only guards against a non-terminating loop — it can never
    # starve a board out of its trip budget (a `round_ < T` bound could:
    # boards beyond NF made zero progress in a round yet round_ advanced).
    R_MAX = T * ((B + NF - 1) // NF)

    def active_b(colour, kind, trips):
        return jax.vmap(
            lambda c, k, t: has_any_line(cfg, c, k) & (t < T)
        )(colour, kind, trips)

    # Kernel width for rounds >= 2: after a machinery round at most NF
    # boards woke up (plus a few still consuming simple trips), scattered
    # across every 128-lane tile — a full-width relaunch paid one kernel
    # body per tile for one or two live lanes each (39ms of a 127ms b16384
    # step, round-5 XProf).  Compact the active lanes into NA lanes first.
    NA = min(2 * NF, B)

    def kernel_full(colour, kind, trips, elim):
        out = cascade_sp_chunk(
            cfg, colour, kind, sub_keys, trips, elim,
            jnp.zeros((B,), jnp.int32), interpret=interpret,
        )
        # drop the active output (recomputed by the loop cond)
        return out[:7] + (out[8],)

    def kernel_compact(colour, kind, trips, elim):
        alive = active_b(colour, kind, trips)
        rank = jnp.cumsum(alive.astype(jnp.int32)) - 1
        hit = (
            rank[None, :] == jnp.arange(NA, dtype=jnp.int32)[:, None]
        ) & alive[None, :]  # [NA, B]
        hit_f = hit.astype(jnp.float32)
        touched = jnp.any(hit, axis=0)
        RC = cfg.flat_size
        hp = jax.lax.Precision.HIGHEST

        def gath(a, shift=0):
            flat = (a.reshape(B, RC) + shift).astype(jnp.float32)
            return ((hit_f @ flat).astype(jnp.int32) - shift).reshape(
                NA, *a.shape[1:]
            )

        idx = jnp.matmul(
            hit_f, bi.astype(jnp.float32), precision=hp
        ).astype(jnp.int32)
        g_trips = (hit_f @ trips.astype(jnp.float32)).astype(jnp.int32)
        g_keys = jnp.take(sub_keys, idx, axis=0)
        zna = jnp.zeros((NA,), jnp.int32)
        (
            c2, k2, t2, e_d, new_d, act_d, froz_d, _, reas_d,
        ) = cascade_sp_chunk(
            cfg, gath(colour), gath(kind, 2), g_keys, g_trips, zna, zna,
            interpret=interpret,
        )  # noqa: the active output is recomputed by the loop cond

        def put(old, new_rows, shift):
            flat = (new_rows.reshape(NA, RC) + shift).astype(jnp.float32)
            out = (hit_f.T @ flat).astype(jnp.int32) - shift
            return jnp.where(
                touched[:, None], out, old.reshape(B, RC)
            ).reshape(old.shape)

        def put_vec(old, rows, exact=False):
            prec = {"precision": hp} if exact else {}
            out = jnp.matmul(
                hit_f.T, rows.astype(jnp.float32)[:, None], **prec
            )[:, 0].astype(jnp.int32)
            return jnp.where(touched, out, old)

        colour = put(colour, c2, 0)
        kind = put(kind, k2, 2)
        trips = put_vec(trips, t2)
        elim_d = put_vec(jnp.zeros((B,), jnp.int32), e_d, exact=True)
        new_d = put_vec(jnp.zeros((B,), jnp.int32), new_d, exact=True)
        act_d = put_vec(jnp.zeros((B,), jnp.int32), act_d, exact=True)
        frozen = put_vec(jnp.zeros((B,), jnp.int32), froz_d)
        reasons_d = put_vec(jnp.zeros((B,), jnp.int32), reas_d)
        return colour, kind, trips, elim_d, new_d, act_d, frozen, reasons_d

    def cond(carry):
        (colour, kind, trips, elim, act, new, trunc, reasons, fullt,
         round_) = carry
        return jnp.any(active_b(colour, kind, trips)) & (round_ < R_MAX)

    def body(carry):
        (colour, kind, trips, elim, act, new, trunc, reasons, fullt,
         round_) = carry

        def round0(args):
            colour, kind, trips, elim = args
            return kernel_full(colour, kind, trips, elim)

        def later(args):
            colour, kind, trips, elim = args
            (
                c2, k2, t2, e_d, n_d, a_d, froz, r_d,
            ) = kernel_compact(colour, kind, trips, elim)
            return c2, k2, t2, elim + e_d, n_d, a_d, froz, r_d

        (
            colour, kind, trips, elim, new_d, act_d, frozen, reasons_d,
        ) = jax.lax.cond(
            round_ == 0, round0, later, (colour, kind, trips, elim)
        )
        new = new + new_d
        act = act + act_d
        reasons = jnp.bitwise_or(reasons, reasons_d)

        def do_full(args):
            colour, kind, trips, elim, act, new, trunc, fullt = args
            # first-NF-frozen-boards selection WITHOUT a sort: the boards'
            # rank among frozen boards (prefix sum) equates to a row of the
            # one-hot compaction matrix.  (argsort at b8192 was a per-round
            # sort network on the hot path; the cumsum is ~B adds.)
            fz = frozen > 0
            rank = jnp.cumsum(fz.astype(jnp.int32)) - 1  # [B]
            # ONE one-hot matrix serves gather AND scatter (TPU row
            # gathers/scatters serialize; f32 one-hot contractions are
            # exact for every value here, all < 2^24).  Non-taken rows
            # gather all-zero (blank) boards, whose full trip is a no-op
            # with zero machine pops — they add nothing to the compacted
            # batch's max-over-batch inner-loop trip counts.
            hit = (
                rank[None, :] == jnp.arange(NF, dtype=jnp.int32)[:, None]
            ) & fz[None, :]  # [NF, B]
            hit_f = hit.astype(jnp.float32)
            taken = jnp.any(hit, axis=1)  # [NF] rows that really run
            touched = jnp.any(hit, axis=0)  # [B]
            RC = cfg.flat_size

            def gath(a, shift=0):
                flat = (a.reshape(B, RC) + shift).astype(jnp.float32)
                return (
                    (hit_f @ flat).astype(jnp.int32) - shift
                ).reshape(NF, *a.shape[1:])

            # refill grids for the COMPACTED boards only: board index and
            # trip counter come through the same one-hot contraction, the
            # key rows through a tiny take (threefry draw is vectorised;
            # the fold_in counter is the board's own trip number, exactly
            # as the vmapped loop)
            # true-f32 contraction: board indices reach B-1 > 256 and TPU's
            # default f32 matmul is bf16 (exact only to 256)
            idx = jnp.matmul(
                hit_f, bi.astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            ).astype(jnp.int32)  # [NF]
            g_trips = (hit_f @ trips.astype(jnp.float32)).astype(jnp.int32)
            g_keys = jnp.take(sub_keys, idx, axis=0)
            grids_nf = jax.vmap(
                lambda s, t: draw_colour_grid(jax.random.fold_in(s, t), cfg)
            )(g_keys, g_trips)

            gc = gath(colour)
            gk = gath(kind, 2)  # kinds span -1..4 → shift keeps them ≥ 0
            gg = jnp.where(
                taken[:, None, None], grids_nf, 1
            )  # blank rows refill with colour 1 (discarded anyway)
            c2, k2, e, a_, n, o = jax.vmap(
                lambda c, k, g: specials_cascade_trip_grid(cfg, c, k, g)
            )(gc, gk, gg)

            def put(old, new_rows, shift):
                flat = (new_rows.reshape(NF, RC) + shift).astype(jnp.float32)
                out = (hit_f.T @ flat).astype(jnp.int32) - shift
                return jnp.where(
                    touched[:, None], out, old.reshape(B, RC)
                ).reshape(old.shape)

            colour = put(colour, c2, 0)
            kind = put(kind, k2, 2)

            def add(acc, rows):
                # eliminations can exceed 256 (a 20x20 full trip deletes up
                # to 400 cells) — not bf16-exact; force true f32
                return acc + jnp.matmul(
                    hit_f.T, rows.astype(jnp.float32)[:, None],
                    precision=jax.lax.Precision.HIGHEST,
                )[:, 0].astype(jnp.int32)

            return (
                colour,
                kind,
                trips + touched.astype(jnp.int32),
                add(elim, e),
                add(act, a_),
                add(new, n),
                trunc | (
                    (hit_f.T @ jnp.where(o, 1.0, 0.0)[:, None])[:, 0] > 0
                ),
                fullt + touched.astype(jnp.int32),
            )

        colour, kind, trips, elim, act, new, trunc, fullt = jax.lax.cond(
            jnp.any(frozen > 0),
            do_full,
            lambda args: args,
            (colour, kind, trips, elim, act, new, trunc, fullt),
        )
        return (
            colour, kind, trips, elim, act, new, trunc, reasons, fullt,
            round_ + 1,
        )

    (
        colour, kind, trips, elim, act, new, trunc, reasons, fullt, rounds,
    ) = jax.lax.while_loop(
        cond,
        body,
        (
            colour, kind, zi, zi, zi, zi, jnp.zeros((B,), bool), zi, zi,
            jnp.int32(0),
        ),
    )
    # lines surviving the budget = cap truncation (mirrors engine_move)
    trunc = trunc | jax.vmap(lambda c, k: has_any_line(cfg, c, k))(colour, kind)
    if with_stats:
        stats = {"reasons": reasons, "full_trips": fullt, "rounds": rounds}
        return colour, kind, elim, act, new, trips, trunc, stats
    return colour, kind, elim, act, new, trips, trunc


def batched_step_fused_sp(
    cfg: EnvConfig,
    states: EnvState,
    actions,
    eff_mask,
    compute_post_mask: bool = True,
    interpret: bool = False,
    with_stats: bool = False,
):
    """Specials-config drop-in for ``jax.vmap(engine.step)`` — swap and the
    combination branch are vmapped (the latter batch-gated), the cascade
    runs through :func:`fused_specials_cascade`, playability is vmapped.
    Bit-identical outputs (tests/envs/test_fused_step.py)."""
    assert cfg.any_special
    from ..engine import make_playable
    from ..ops.board_ops import apply_refill, draw_colour_grid, gravity, swap_cells
    from ..ops.combination import combination_match, is_combination

    B = actions.shape[0]
    c1_tab, c2_tab = action_table(cfg)
    c1 = jnp.asarray(c1_tab)[actions]
    c2 = jnp.asarray(c2_tab)[actions]
    eff = jnp.take_along_axis(eff_mask, actions[:, None], axis=1)[:, 0]

    # ---- swap where effective --------------------------------------------
    sw_colour, sw_kind = jax.vmap(swap_cells)(states.colour, states.kind, c1, c2)
    effm = eff[:, None, None]
    colour = jnp.where(effm, sw_colour, states.colour)
    kind = jnp.where(effm, sw_kind, states.kind)

    # ---- combination branch (engine_move's run_comb), COMPACTED -----------
    # At production batches `jnp.any(comb)` is ~always true (a few dozen
    # boards of 8192 combo every step), and the vmapped combination_match —
    # activation machinery included — over the FULL batch was ~45% of the
    # step (round-5 XProf).  Gather the comb boards into NC-wide sub-batches
    # (same one-hot-contraction compaction as the cascade's full trips),
    # loop while any remain (one round almost always).
    # Measured comb frequency at b8192 (random-effective policy): ~60 boards
    # on fresh batches growing to ~580/step late-episode as specials
    # accumulate — NC=1024 keeps it one compaction round; the machinery's
    # serial depth is max-over-sub-batch either way, so fewer+wider rounds
    # strictly dominate.
    comb = jax.vmap(is_combination)(kind, c1, c2) & eff
    NC = min(1024, B)
    bi_ = jnp.arange(B, dtype=jnp.int32)
    RC = cfg.flat_size

    def comb_cond(carry):
        colour, kind, key, elim, act, ovf, left = carry
        return jnp.any(left)

    def comb_round(carry):
        colour, kind, key, elim, act, ovf, left = carry
        rank = jnp.cumsum(left.astype(jnp.int32)) - 1
        hit = (
            rank[None, :] == jnp.arange(NC, dtype=jnp.int32)[:, None]
        ) & left[None, :]  # [NC, B]
        hit_f = hit.astype(jnp.float32)
        taken = jnp.any(hit, axis=1)
        touched = jnp.any(hit, axis=0)

        def gath(a, shift=0):
            flat = (a.reshape(B, -1) + shift).astype(jnp.float32)
            return ((hit_f @ flat).astype(jnp.int32) - shift).reshape(
                NC, *a.shape[1:]
            )

        # board indices reach B-1 > 256: TPU's DEFAULT f32 matmul runs in
        # bf16 (8-bit mantissa) and silently rounds them — force a true-f32
        # contraction (exact to 2^24).  The colour/kind/coord contractions
        # stay on the fast default (all values < 256).
        idx = jnp.matmul(
            hit_f, bi_.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        ).astype(jnp.int32)
        g_keys = jnp.take(key, idx, axis=0)

        def one(colour, kind, c1, c2, key):
            colour2, kind2, act, ovf = combination_match(
                cfg, colour, kind, c1, c2
            )
            elim = cfg.flat_size - jnp.count_nonzero(kind2).astype(jnp.int32)
            colour2, kind2 = gravity(colour2, kind2)
            key2, kd = jax.random.split(key)
            colour2, kind2 = apply_refill(
                colour2, kind2, draw_colour_grid(kd, cfg)
            )
            return colour2, kind2, key2, elim, act, ovf

        c2_, k2_, key2, e_, a_, o_ = jax.vmap(one)(
            gath(colour), gath(kind, 2), gath(c1), gath(c2), g_keys
        )

        def put(old, new_rows, shift):
            flat = (new_rows.reshape(NC, RC) + shift).astype(jnp.float32)
            out = (hit_f.T @ flat).astype(jnp.int32) - shift
            return jnp.where(
                touched[:, None], out, old.reshape(B, RC)
            ).reshape(old.shape)

        colour = put(colour, c2_, 0)
        kind = put(kind, k2_, 2)
        # keys: scatter the evolved key rows back.  uint32 words exceed
        # f32's exact range → bitcast to 16-bit halves, and contract at
        # HIGHEST precision (TPU's default f32 matmul is bf16, exact only
        # to 256 — 16-bit halves need true f32).
        kw = jax.lax.bitcast_convert_type(key2, jnp.int32)  # [NC, 2]
        lo = (kw & 0xFFFF).astype(jnp.float32)
        hi = jax.lax.shift_right_logical(kw, 16).astype(jnp.float32)
        hp = jax.lax.Precision.HIGHEST
        lo_b = jnp.matmul(hit_f.T, lo, precision=hp).astype(jnp.int32)
        hi_b = jnp.matmul(hit_f.T, hi, precision=hp).astype(jnp.int32)
        key_new = jax.lax.bitcast_convert_type(
            (hi_b << 16) | lo_b, key.dtype
        )
        key = jnp.where(touched[:, None], key_new, key)

        def add(acc, rows):
            # eliminations can exceed 256 (cookie+cookie clears the whole
            # board) — not bf16-exact; force true f32
            return acc + jnp.matmul(
                hit_f.T, rows.astype(jnp.float32)[:, None],
                precision=jax.lax.Precision.HIGHEST,
            )[:, 0].astype(jnp.int32)

        elim = add(elim, jnp.where(taken, e_, 0))
        act = add(act, jnp.where(taken, a_, 0))
        ovf = ovf | (
            (hit_f.T @ jnp.where(o_ & taken, 1.0, 0.0)[:, None])[:, 0] > 0
        )
        return colour, kind, key, elim, act, ovf, left & ~touched

    zi_ = jnp.zeros((B,), jnp.int32)
    colour, kind, key1, comb_elim, comb_act, comb_ovf, _ = jax.lax.while_loop(
        comb_cond,
        comb_round,
        (colour, kind, states.key, zi_, zi_, jnp.zeros((B,), bool), comb),
    )

    # ---- key evolution for the cascade (`key, sub = split(key)`) ----------
    both = jax.vmap(lambda k: jax.random.split(k, 2))(key1)
    key_moved = both[:, 0]
    sub = both[:, 1]
    key_after = jnp.where(eff[:, None], key_moved, states.key)

    # ---- cascade ----------------------------------------------------------
    out = fused_specials_cascade(
        cfg, colour, kind, sub, interpret=interpret, with_stats=with_stats
    )
    colour, kind, elim, act, new, trips, trunc = out[:7]
    stats = out[7] if with_stats else None
    # new specials filled holes → count as eliminations (`board.py:378`)
    elim = comb_elim + elim + new
    act = comb_act + act
    trunc = trunc | comb_ovf

    # ---- playability + post mask (vmapped; mask from the Pallas kernel) ---
    from ..ops.pallas_cascade import settled_mask_sp

    kmask = settled_mask_sp(cfg, colour, kind, interpret=interpret)

    def playable(colour, kind, key, m0):
        return make_playable(
            cfg, colour, kind, key, jnp.asarray(False), jnp.int32(0), mask0=m0
        )

    p_colour, p_kind, p_key, p_shuffled, p_mask, p_gave_up = jax.vmap(
        playable
    )(colour, kind, key_after, kmask)

    out_colour = jnp.where(effm, p_colour, states.colour)
    out_kind = jnp.where(effm, p_kind, states.kind)
    out_key = jnp.where(eff[:, None], p_key, states.key)
    shuffled = eff & p_shuffled
    post_mask = jnp.where(eff[:, None], p_mask, eff_mask)
    truncated = eff & (trunc | p_gave_up)
    elim = jnp.where(eff, elim, 0)
    trips = jnp.where(eff, trips, 0)
    act = jnp.where(eff, act, 0)
    new = jnp.where(eff, new, 0)

    timer = states.timer + 1
    done = timer >= cfg.num_moves
    next_states = EnvState(
        colour=out_colour, kind=out_kind, timer=timer, key=out_key
    )
    if compute_post_mask:
        mask_after = jnp.where(done[:, None], False, post_mask)
    else:
        mask_after = post_mask
    infos = StepInfo(
        is_combination_match=comb,
        num_new_specials=new,
        num_specials_activated=act,
        shuffled=shuffled,
        effective_actions=mask_after,
        truncated=truncated,
        cascade_trips=trips,
    )
    if with_stats:
        return next_states, elim, done, infos, stats
    return next_states, elim, done, infos

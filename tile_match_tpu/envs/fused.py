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
    # fills/keys consumed, exactly like the no_op branch.
    colour, elim, trips, trunc = fused_cascade(
        cfg, colour, sub, interpret=interpret
    )

    # ---- playability loop + post mask (vmapped; usually 0 iterations) -----
    def playable(colour, kind, key):
        return make_playable(
            cfg, colour, kind, key, jnp.asarray(False), jnp.int32(0)
        )

    p_colour, p_kind, p_key, p_shuffled, p_mask, p_gave_up = jax.vmap(
        playable
    )(colour, states.kind, key_after)

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

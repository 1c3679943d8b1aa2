"""The fused batched step must be bit-identical to vmap(engine.step).

Runs a multi-step no-specials rollout through both paths (the Pallas kernel
in interpret mode on CPU) and asserts every EnvState leaf, reward, done and
info field matches at every step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.engine import step
from tile_match_tpu.envs.batched import batched_reset
from tile_match_tpu.envs.fused import batched_step_fused
from tile_match_tpu.state import EnvState

CFG = EnvConfig.create(
    6, 6, 3, 5, colourless_specials=(), colour_specials=()
)


def _policy(key, mask):
    logits = jnp.where(mask, 0.0, -jnp.inf)
    acts = jax.random.categorical(key, logits, axis=-1)
    return jnp.where(mask.any(-1), acts, 0).astype(jnp.int32)


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_step_bit_identical(seed):
    B = 24
    states, ts = batched_reset(CFG, jax.random.PRNGKey(seed), B)
    mask = ts.info.effective_actions
    key = jax.random.PRNGKey(seed + 100)

    sf = states
    sv = states
    mask_f = mask
    mask_v = mask
    for i in range(4):
        key, ka = jax.random.split(key)
        acts = _policy(ka, mask_v)

        nf, rf, df, inf_f = batched_step_fused(
            CFG, sf, acts, mask_f, interpret=True
        )
        nv, rv, dv, inf_v = jax.vmap(
            lambda s, a, m: step(CFG, s, a, eff_mask=m)
        )(sv, acts, mask_v)

        for a, b, name in [
            (nf.colour, nv.colour, "colour"),
            (nf.kind, nv.kind, "kind"),
            (nf.timer, nv.timer, "timer"),
            (nf.key, nv.key, "key"),
            (rf, rv, "reward"),
            (df, dv, "done"),
            (inf_f.effective_actions, inf_v.effective_actions, "mask"),
            (inf_f.shuffled, inf_v.shuffled, "shuffled"),
            (inf_f.truncated, inf_v.truncated, "truncated"),
            (inf_f.cascade_trips, inf_v.cascade_trips, "trips"),
        ]:
            assert np.array_equal(np.asarray(a), np.asarray(b)), (
                f"step {i}: {name} diverges"
            )
        sf, sv = nf, nv
        mask_f, mask_v = inf_f.effective_actions, inf_v.effective_actions


def test_fused_step_noop_moves():
    """Non-effective actions must behave exactly like engine's no_op."""
    B = 8
    states, ts = batched_reset(CFG, jax.random.PRNGKey(7), B)
    mask = ts.info.effective_actions
    # pick NON-effective actions everywhere (exists on generated boards)
    bad = jnp.argmin(mask, axis=-1).astype(jnp.int32)
    nf, rf, df, inf_f = batched_step_fused(CFG, states, bad, mask, interpret=True)
    nv, rv, dv, inf_v = jax.vmap(
        lambda s, a, m: step(CFG, s, a, eff_mask=m)
    )(states, bad, mask)
    assert np.array_equal(np.asarray(rf), np.asarray(rv))
    assert int(np.asarray(rf).sum()) == 0
    assert np.array_equal(np.asarray(nf.colour), np.asarray(nv.colour))
    assert np.array_equal(np.asarray(nf.key), np.asarray(nv.key))
    assert np.array_equal(
        np.asarray(inf_f.effective_actions), np.asarray(inf_v.effective_actions)
    )


# ---------------------------------------------------------------------------
# Specials configs: batched_step_fused_sp vs vmap(engine.step)
# ---------------------------------------------------------------------------

from tile_match_tpu.envs.fused import batched_step_fused_sp  # noqa: E402

CFG_SP = EnvConfig.create(
    6, 6, 3, 6,
    colourless_specials=("cookie",),
    colour_specials=("vertical_laser", "horizontal_laser", "bomb"),
)


def _assert_step_equal(out_f, out_v, tag):
    nf, rf, df, inf_f = out_f
    nv, rv, dv, inf_v = out_v
    for a, b, name in [
        (nf.colour, nv.colour, "colour"),
        (nf.kind, nv.kind, "kind"),
        (nf.key, nv.key, "key"),
        (rf, rv, "reward"),
        (df, dv, "done"),
        (inf_f.effective_actions, inf_v.effective_actions, "mask"),
        (inf_f.is_combination_match, inf_v.is_combination_match, "comb"),
        (inf_f.num_new_specials, inf_v.num_new_specials, "new"),
        (inf_f.num_specials_activated, inf_v.num_specials_activated, "act"),
        (inf_f.shuffled, inf_v.shuffled, "shuffled"),
        (inf_f.truncated, inf_v.truncated, "truncated"),
        (inf_f.cascade_trips, inf_v.cascade_trips, "trips"),
    ]:
        assert np.array_equal(np.asarray(a), np.asarray(b)), f"{tag}: {name}"


def _sprinkle_specials(states, seed, dense=False):
    """Poke specials onto generated boards (they stay line-free: kind edits
    do not create colour runs; cookies blank their colour)."""
    rng = np.random.default_rng(seed)
    colour = np.asarray(states.colour).copy()
    kind = np.asarray(states.kind).copy()
    B, R, C = colour.shape
    for b in range(B):
        for _ in range(rng.integers(3, 9) if dense else rng.integers(1, 5)):
            r, c = rng.integers(0, R), rng.integers(0, C)
            k = int(rng.choice([2, 3, 4, -1]))
            kind[b, r, c] = k
            if k == -1:
                colour[b, r, c] = 0
    return states.replace(
        colour=jnp.asarray(colour), kind=jnp.asarray(kind)
    )


CFG_SP10 = EnvConfig.create(
    10, 10, 4, 6,
    colourless_specials=("cookie",),
    colour_specials=("vertical_laser", "horizontal_laser", "bomb"),
)


@pytest.mark.parametrize("seed,big", [(0, False), (1, False), (2, True), (3, True)])
def test_fused_sp_step_bit_identical(seed, big):
    # big=True: 10x10 boards with denser specials — the regime that exposed
    # the activation-closure stale-region bug (a special joining the closure
    # on the last expansion without contributing its region)
    CFG_SP_local = CFG_SP10 if big else CFG_SP
    # the 10x10 interpret program is enormous; drop accumulated executables
    # first (the in-process XLA CPU compiler segfaults under pressure)
    jax.clear_caches()
    B = 12 if big else 24
    states, ts = batched_reset(CFG_SP_local, jax.random.PRNGKey(seed), B)
    states = _sprinkle_specials(states, seed + 50, dense=big)
    # masks must describe the POKED boards
    from tile_match_tpu.ops.effective import effective_mask_settled

    mask = jax.vmap(
        lambda s: effective_mask_settled(CFG_SP_local, s.colour, s.kind)
    )(states)

    sf = sv = states
    mask_f = mask_v = mask
    key = jax.random.PRNGKey(seed + 200)
    for i in range(2 if big else 4):
        key, ka = jax.random.split(key)
        acts = _policy(ka, mask_v)
        out_f = batched_step_fused_sp(
            CFG_SP_local, sf, acts, mask_f, interpret=True
        )
        out_v = jax.vmap(
            lambda s, a, m: step(CFG_SP_local, s, a, eff_mask=m)
        )(sv, acts, mask_v)
        _assert_step_equal(out_f, out_v, f"sp step {i}")
        sf, sv = out_f[0], out_v[0]
        mask_f, mask_v = out_f[3].effective_actions, out_v[3].effective_actions


def test_fused_sp_laser_creation_in_kernel():
    """A swap completing an unshared length-4 line: the kernel's closed-form
    laser creation must match the full machinery bit-for-bit (and actually
    create the laser)."""
    R = C = 6
    colour = np.array(
        [
            [1, 2, 3, 1, 2, 3],
            [2, 3, 2, 2, 3, 1],
            [1, 1, 2, 1, 3, 3],  # swapping (2,2)<->(3,2) makes 1,1,1,1 in row 2
            [3, 2, 1, 3, 2, 1],
            [2, 3, 2, 1, 3, 2],
            [1, 2, 3, 2, 1, 3],
        ],
        np.int32,
    )
    kind = np.ones((R, C), np.int32)
    states = EnvState(
        colour=jnp.asarray(colour)[None],
        kind=jnp.asarray(kind)[None],
        timer=jnp.zeros((1,), jnp.int32),
        key=jax.random.PRNGKey(5)[None],
    )
    from tile_match_tpu.ops.effective import effective_mask_settled
    from tile_match_tpu.state import action_table

    mask = jax.vmap(
        lambda s: effective_mask_settled(CFG_SP, s.colour, s.kind)
    )(states)
    # find the down-swap (2,2)<->(3,2): action index = 2*C + 2
    a = jnp.asarray([2 * C + 2], jnp.int32)
    assert bool(mask[0, 2 * C + 2])
    out_f = batched_step_fused_sp(CFG_SP, states, a, mask, interpret=True)
    out_v = jax.vmap(lambda s, x, m: step(CFG_SP, s, x, eff_mask=m))(
        states, a, mask
    )
    _assert_step_equal(out_f, out_v, "laser creation")
    assert int(out_f[3].num_new_specials[0]) >= 1  # the laser was created

    # and the KERNEL (not a frozen full trip) performed the creation:
    from tile_match_tpu.ops.pallas_cascade import cascade_sp_chunk
    from tile_match_tpu.ops.board_ops import swap_cells

    sw_c, sw_k = swap_cells(
        jnp.asarray(colour), jnp.asarray(kind),
        jnp.asarray([2, 2]), jnp.asarray([3, 2]),
    )
    z = jnp.zeros((1,), jnp.int32)
    c_o, k_o, trips_o, elim_o, new_o, act_o, frozen_o, active_o, _ = cascade_sp_chunk(
        CFG_SP, sw_c[None], sw_k[None], jax.random.PRNGKey(5)[None],
        z, z, z, interpret=True,
    )
    assert int(frozen_o[0]) == 0, "trip was deferred instead of kernelised"
    assert int(new_o[0]) == 1
    assert int(trips_o[0]) >= 1
    assert (np.asarray(k_o)[0] > 1).sum() >= 1  # a laser tile exists


def test_fused_sp_single_activation_in_kernel():
    """A len-3 match over a laser with a chain-free column: the kernel's
    closed-form single activation (delete union ∪ wipe region) must match
    the full machinery AND be handled without freezing."""
    R = C = 6
    colour = np.array(
        [
            [1, 2, 3, 1, 2, 3],
            [2, 3, 2, 2, 3, 1],
            [1, 1, 2, 1, 3, 3],  # swap (2,2)<->(3,2): row2 -> 1,1,1 | 1 is at (3,2)
            [3, 2, 1, 3, 2, 1],
            [2, 3, 2, 1, 3, 2],
            [1, 2, 3, 2, 1, 3],
        ],
        np.int32,
    )
    colour[2, 3] = 3  # break the len-4: swap creates exactly 1,1,1 at (2,0..2)
    kind = np.ones((R, C), np.int32)
    kind[2, 0] = 2  # vertical laser sitting on a match cell
    states = EnvState(
        colour=jnp.asarray(colour)[None],
        kind=jnp.asarray(kind)[None],
        timer=jnp.zeros((1,), jnp.int32),
        key=jax.random.PRNGKey(11)[None],
    )
    from tile_match_tpu.ops.board_ops import swap_cells
    from tile_match_tpu.ops.effective import effective_mask_settled
    from tile_match_tpu.ops.pallas_cascade import cascade_sp_chunk

    mask = jax.vmap(
        lambda s: effective_mask_settled(CFG_SP, s.colour, s.kind)
    )(states)
    a = jnp.asarray([2 * C + 2], jnp.int32)
    assert bool(mask[0, 2 * C + 2])
    out_f = batched_step_fused_sp(CFG_SP, states, a, mask, interpret=True)
    out_v = jax.vmap(lambda s, x, m: step(CFG_SP, s, x, eff_mask=m))(
        states, a, mask
    )
    _assert_step_equal(out_f, out_v, "single activation")
    assert int(out_f[3].num_specials_activated[0]) >= 1

    sw_c, sw_k = swap_cells(
        jnp.asarray(colour), jnp.asarray(kind),
        jnp.asarray([2, 2]), jnp.asarray([3, 2]),
    )
    z = jnp.zeros((1,), jnp.int32)
    _, _, trips_o, _, _, act_o, frozen_o, _, _ = cascade_sp_chunk(
        CFG_SP, sw_c[None], sw_k[None], jax.random.PRNGKey(11)[None],
        z, z, z, interpret=True,
    )
    assert int(frozen_o[0]) == 0, "activation was deferred, not kernelised"
    assert int(act_o[0]) >= 1


def test_fused_sp_forced_combinations():
    """Every board swaps a special pair (or cookie): the COMPACTED
    combination branch must match the vmapped engine bit-for-bit —
    including the evolved per-board keys, whose compaction round-trips
    through 16-bit-half one-hot contractions (a TPU default-precision
    bf16 matmul silently rounds values > 256; regression for the round-5
    on-device parity failure)."""
    from tile_match_tpu.ops.effective import effective_mask_settled

    jax.clear_caches()
    B = 24
    states, ts = batched_reset(CFG_SP, jax.random.PRNGKey(3), B)
    colour = np.asarray(states.colour).copy()
    kind = np.asarray(states.kind).copy()
    rng = np.random.default_rng(0)
    acts = np.zeros(B, np.int32)
    C = CFG_SP.num_cols
    for b in range(B):
        r, c = rng.integers(0, CFG_SP.num_rows - 1), rng.integers(0, C - 1)
        k1, k2 = rng.choice([2, 3, 4, -1], size=2)
        kind[b, r, c] = k1
        kind[b, r + 1, c] = k2
        if k1 == -1:
            colour[b, r, c] = 0
        if k2 == -1:
            colour[b, r + 1, c] = 0
        acts[b] = r * C + c  # the down-swap between the two specials
    states = states.replace(colour=jnp.asarray(colour), kind=jnp.asarray(kind))
    mask = jax.vmap(
        lambda s: effective_mask_settled(CFG_SP, s.colour, s.kind)
    )(states)
    a = jnp.asarray(acts)
    out_f = batched_step_fused_sp(CFG_SP, states, a, mask, interpret=True)
    out_v = jax.vmap(lambda s, x, m: step(CFG_SP, s, x, eff_mask=m))(
        states, a, mask
    )
    assert int(np.asarray(out_v[3].is_combination_match).sum()) >= B // 2
    _assert_step_equal(out_f, out_v, "forced combos")

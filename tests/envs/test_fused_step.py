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

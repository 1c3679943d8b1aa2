"""Native (threefry) engine: jit/vmap smoke tests + invariants.

The native mode defines its own RNG stream (counter-based, per-env); these
tests check the engine's structural invariants rather than numpy parity
(which parity.py covers): generated boards are match-free with >=1 effective
move, boards stay well-formed across steps, stats are consistent.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.engine import reset, step
from tile_match_tpu.ops.lines import has_any_line


@functools.lru_cache(maxsize=None)
def _fns(cfg):
    r = jax.jit(lambda key: reset(cfg, key))
    s = jax.jit(lambda st, a: step(cfg, st, a))
    return r, s


def _well_formed(cfg, colour, kind):
    colour = np.asarray(colour)
    kind = np.asarray(kind)
    # colour>0 ⟺ kind in {1,2,3,4}; colour==0 ⟺ kind in {0,-1}
    assert ((colour > 0) == (kind > 0)).all()
    assert colour.min() >= 0 and colour.max() <= cfg.num_colours
    assert set(np.unique(kind)).issubset({-1, 0, 1, 2, 3, 4})
    # no empty cells after a completed step
    assert not ((colour == 0) & (kind == 0)).any()


@pytest.mark.parametrize("spec", [True, False])
@pytest.mark.parametrize("seed", range(5))
def test_reset_invariants(spec, seed):
    cfg = EnvConfig(5, 5, 3, 10, cookie=spec, vertical_laser=spec,
                    horizontal_laser=spec, bomb=spec)
    r, _ = _fns(cfg)
    st, info = r(jax.random.PRNGKey(seed))
    _well_formed(cfg, st.colour, st.kind)
    assert not bool(has_any_line(cfg, st.colour, st.kind))
    assert bool(np.asarray(info.effective_actions).any())
    assert int(st.timer) == 0


@pytest.mark.parametrize("seed", range(4))
def test_step_episode(seed):
    cfg = EnvConfig(6, 6, 4, 8)
    r, s = _fns(cfg)
    st, info = r(jax.random.PRNGKey(seed))
    total = 0
    for t in range(cfg.num_moves):
        eff = np.nonzero(np.asarray(info.effective_actions))[0]
        assert len(eff) > 0 or t == cfg.num_moves
        a = int(eff[seed % len(eff)])
        st, reward, done, info = s(st, jnp.int32(a))
        _well_formed(cfg, st.colour, st.kind)
        assert not bool(has_any_line(cfg, st.colour, st.kind))
        assert int(reward) >= 3  # an effective move eliminates >= 3 tiles
        total += int(reward)
        assert bool(done) == (t == cfg.num_moves - 1)
        if bool(done):
            assert not np.asarray(info.effective_actions).any()
    assert total > 0


def test_ineffective_action_is_noop():
    cfg = EnvConfig(5, 5, 3, 10)
    r, s = _fns(cfg)
    st, info = r(jax.random.PRNGKey(0))
    mask = np.asarray(info.effective_actions)
    bad = np.nonzero(~mask)[0]
    if len(bad) == 0:
        pytest.skip("all actions effective")
    before = np.asarray(st.colour).copy()
    st2, reward, done, info2 = s(st, jnp.int32(int(bad[0])))
    assert int(reward) == 0
    assert np.array_equal(np.asarray(st2.colour), before)
    assert int(st2.timer) == 1  # a no-op move still consumes a turn


def test_vmap_batch():
    cfg = EnvConfig(5, 5, 3, 10)
    B = 32
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    vreset = jax.jit(jax.vmap(lambda k: reset(cfg, k)))
    vstep = jax.jit(jax.vmap(lambda st, a: step(cfg, st, a)))
    sts, infos = vreset(keys)
    assert sts.colour.shape == (B, 5, 5)
    # random effective action per board
    masks = np.asarray(infos.effective_actions)
    acts = np.array([np.nonzero(m)[0][0] for m in masks], np.int32)
    sts2, rewards, dones, infos2 = vstep(sts, jnp.asarray(acts))
    assert rewards.shape == (B,)
    assert (np.asarray(rewards) >= 3).all()
    for i in range(B):
        _well_formed(cfg, sts2.colour[i], sts2.kind[i])


def test_determinism():
    cfg = EnvConfig(5, 5, 3, 10)
    r, s = _fns(cfg)
    st1, i1 = r(jax.random.PRNGKey(3))
    st2, i2 = r(jax.random.PRNGKey(3))
    assert np.array_equal(np.asarray(st1.colour), np.asarray(st2.colour))
    a = int(np.nonzero(np.asarray(i1.effective_actions))[0][0])
    n1 = s(st1, jnp.int32(a))
    n2 = s(st2, jnp.int32(a))
    assert np.array_equal(np.asarray(n1[0].colour), np.asarray(n2[0].colour))
    assert int(n1[1]) == int(n2[1])

"""Differential tests: native C++ engine vs the jitted kernels.

The JAX kernels are themselves verified bit-exact against the reference, so
C++ == JAX (on the deterministic sub-kernels) transitively proves C++ ==
reference semantics.
"""

import functools

import jax
import numpy as np
import pytest

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.native import NativeEngine, _flags, load
from tile_match_tpu.ops.board_ops import gravity
from tile_match_tpu.ops.classify import process_colour_lines
from tile_match_tpu.ops.combination import combination_match
from tile_match_tpu.ops.effective import effective_mask
from tile_match_tpu.ops.lines import get_colour_lines
from tile_match_tpu.ops.resolve import resolve_colour_matches


@functools.lru_cache(maxsize=None)
def _jax_fns(cfg):
    return {
        "effective": jax.jit(lambda c, k: effective_mask(cfg, c, k)),
        "resolve": jax.jit(
            lambda c, k: resolve_colour_matches(
                cfg, c, k, process_colour_lines(cfg, c, get_colour_lines(cfg, c, k))
            )
        ),
        "combination": jax.jit(
            lambda c, k, a, b: combination_match(cfg, c, k, a, b)
        ),
        "gravity": jax.jit(gravity),
    }


def _rand_board(rng, shape, colours, n_specials):
    colour = rng.integers(1, colours + 1, size=shape).astype(np.int32)
    kind = np.ones(shape, np.int32)
    for _ in range(n_specials):
        r, c = rng.integers(0, shape[0]), rng.integers(0, shape[1])
        k = int(rng.choice([2, 3, 4, -1]))
        kind[r, c] = k
        if k == -1:
            colour[r, c] = 0
    return colour, kind


@pytest.mark.parametrize("seed", range(40))
def test_effective_mask_matches(seed):
    lib = load()
    rng = np.random.default_rng(seed)
    shape = [(5, 5), (7, 4), (8, 8)][seed % 3]
    colour, kind = _rand_board(rng, shape, 3, int(rng.integers(0, 4)))
    cfg = EnvConfig(shape[0], shape[1], 3, 10)
    out = np.zeros((cfg.num_actions,), np.uint8)
    lib.tmt_effective_mask(colour.copy(), kind.copy(), shape[0], shape[1], out)
    want = np.asarray(_jax_fns(cfg)["effective"](colour, kind))
    assert np.array_equal(out.astype(bool), want)


@pytest.mark.parametrize("seed", range(60))
def test_resolve_matches(seed):
    lib = load()
    rng = np.random.default_rng(seed + 999)
    shape = [(5, 5), (6, 6), (8, 8)][seed % 3]
    colours = [2, 3][seed % 2]
    colour, kind = _rand_board(rng, shape, colours, int(rng.integers(0, 5)))
    cfg = EnvConfig(shape[0], shape[1], colours, 10)

    c2, k2 = colour.copy(), kind.copy()
    stats = np.zeros((2,), np.int32)
    had = lib.tmt_resolve_once(c2, k2, shape[0], shape[1], _flags(cfg), stats)

    jc, jk, act, new, _ovf = _jax_fns(cfg)["resolve"](colour, kind)
    if not had:
        assert int(act) == 0 and int(new) == 0
        return
    assert np.array_equal(c2, np.asarray(jc)), (
        f"seed={seed}\nin:\n{colour}\n{kind}\ncpp:\n{c2}\njax:\n{np.asarray(jc)}"
    )
    assert np.array_equal(k2, np.asarray(jk))
    assert int(stats[0]) == int(act)
    assert int(stats[1]) == int(new)


@pytest.mark.parametrize("seed", range(40))
def test_combination_matches(seed):
    lib = load()
    rng = np.random.default_rng(seed + 31337)
    shape = (6, 6)
    colour, kind = _rand_board(rng, shape, 3, int(rng.integers(0, 4)))
    pairs = [(-1, -1), (-1, 1), (-1, 3), (2, 3), (4, 2), (4, 4), (1, -1), (4, -1)]
    k1, k2 = pairs[seed % len(pairs)]
    r, c = int(rng.integers(0, 5)), int(rng.integers(0, 6))
    c1, c2_ = (r, c), (r + 1, c)
    for (rr, cc), kk in [(c1, k1), (c2_, k2)]:
        kind[rr, cc] = kk
        colour[rr, cc] = 0 if kk == -1 else max(1, colour[rr, cc])
    cfg = EnvConfig(shape[0], shape[1], 3, 10)

    cc2, kk2 = colour.copy(), kind.copy()
    act = lib.tmt_combination(cc2, kk2, 6, 6, c1[0], c1[1], c2_[0], c2_[1])
    jc, jk, jact, _ovf = _jax_fns(cfg)["combination"](
        colour, kind, np.asarray(c1, np.int32), np.asarray(c2_, np.int32)
    )
    assert np.array_equal(cc2, np.asarray(jc)), (
        f"pair={k1, k2}\nin:\n{colour}\n{kind}\ncpp:\n{cc2}\njax:\n{np.asarray(jc)}"
    )
    assert np.array_equal(kk2, np.asarray(jk))
    assert int(act) == int(jact)


@pytest.mark.parametrize("seed", range(10))
def test_gravity_matches(seed):
    lib = load()
    rng = np.random.default_rng(seed)
    colour = rng.integers(0, 4, size=(6, 5)).astype(np.int32)
    kind = (colour > 0).astype(np.int32)
    c2, k2 = colour.copy(), kind.copy()
    lib.tmt_gravity(c2, k2, 6, 5)
    jc, jk = _jax_fns(EnvConfig(6, 5, 3, 10))["gravity"](colour, kind)
    assert np.array_equal(c2, np.asarray(jc))
    assert np.array_equal(k2, np.asarray(jk))


def test_native_engine_episode():
    cfg = EnvConfig(6, 6, 4, 8)
    eng = NativeEngine(cfg, seed=1)
    eng.generate_board()
    from tile_match_tpu.debug import validate_state

    validate_state(cfg, eng.colour, eng.kind)
    from tile_match_tpu.state import action_table

    c1t, c2t = action_table(cfg)
    total = 0
    for t in range(cfg.num_moves):
        mask = eng.effective_mask()
        assert mask.any()
        a = int(np.nonzero(mask)[0][t % mask.sum()])
        elim, comb, new, act, shuf = eng.move(tuple(c1t[a]), tuple(c2t[a]))
        assert elim >= 3
        total += elim
        validate_state(cfg, eng.colour, eng.kind)
    assert total > 0


def test_native_engine_throughput_sanity():
    """The native engine should be far faster than the de-jitted reference."""
    import time

    cfg = EnvConfig(10, 10, 4, 30)
    eng = NativeEngine(cfg, seed=3)
    eng.generate_board()
    from tile_match_tpu.state import action_table

    c1t, c2t = action_table(cfg)
    rng = np.random.default_rng(0)
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < 1.0:
        mask = eng.effective_mask()
        idx = np.nonzero(mask)[0]
        a = int(rng.choice(idx)) if len(idx) else 0
        eng.move(tuple(c1t[a]), tuple(c2t[a]))
        n += 1
    sps = n / (time.perf_counter() - t0)
    assert sps > 300, f"native engine too slow: {sps:.0f} steps/s"


def test_native_batch_engine():
    import time

    from tile_match_tpu.native import NativeBatchEngine

    cfg = EnvConfig(10, 10, 4, 10)
    env = NativeBatchEngine(cfg, batch_size=64, seed=5)
    mask = env.reset()
    assert mask.shape == (64, cfg.num_actions)
    assert mask.any(axis=1).all()
    rng = np.random.default_rng(0)
    total = np.zeros(64)
    for t in range(12):
        acts = np.array(
            [np.random.default_rng(t * 64 + i).choice(np.nonzero(m)[0])
             for i, m in enumerate(mask)],
            np.int32,
        )
        rewards, dones, stats = env.step(acts)
        assert (rewards >= 3).all()
        total += rewards
        mask = env.effective_mask()
        assert mask.any(axis=1).all()  # auto-reset keeps boards playable
    assert (total > 0).all()

    # throughput: OpenMP batch should clear 10k steps/s easily
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 1.0:
        acts = np.argmax(mask, axis=1).astype(np.int32)
        env.step(acts)
        mask = env.effective_mask()
        n += 64
    sps = n / (time.perf_counter() - t0)
    assert sps > 3000, f"batch native engine too slow: {sps:.0f}"

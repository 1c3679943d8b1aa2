"""Differential stress tests for the kernel's rich closed-form trips.

Round-5 absorptions (bomb pairs, cookie creation, length-4 partner cases —
`ops/pallas_cascade._simple_trip_tile`'s case table) must be bit-identical
to the full classify/resolve machinery.  These tests drive
``fused_specials_cascade`` (kernel in interpret mode + compacted machinery
rounds) against the vmapped engine cascade loop — literally the code
``engine_move`` runs — on boards painted with the exact shapes each case
absorbs, plus dense random fuzz where every shape arises organically.

The painted shapes land on line-free checkerboard bases so the FIRST trip
exercises the intended case; subsequent trips (random refills) add organic
coverage for free.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.engine import specials_cascade_trip
from tile_match_tpu.envs.fused import fused_specials_cascade
from tile_match_tpu.ops.lines import has_any_line
from tile_match_tpu.ops.pallas_cascade import cascade_sp_chunk

@pytest.fixture(autouse=True)
def _clear_xla_caches():
    """The interpret-mode programs are enormous; the in-process XLA CPU
    compiler segfaults under accumulated executable pressure (see
    tests/conftest.py history) — drop caches around every test here."""
    jax.clear_caches()
    yield


CFG_FULL = EnvConfig.create(
    8, 8, 4, 6,
    colourless_specials=("cookie",),
    colour_specials=("vertical_laser", "horizontal_laser", "bomb"),
)
CFG_LB = EnvConfig.create(
    8, 8, 4, 6,
    colourless_specials=(),
    colour_specials=("vertical_laser", "horizontal_laser", "bomb"),
)
CFG_NOBOMB = EnvConfig.create(
    8, 8, 4, 6,
    colourless_specials=("cookie",),
    colour_specials=("vertical_laser", "horizontal_laser"),
)


def cascade_twin(cfg, colour_b, kind_b, sub_keys):
    """The vmapped engine cascade loop (engine_move's casc body verbatim)."""

    def one(colour, kind, sub):
        def cond(c):
            colour, kind, elim, act, new, trunc, it = c
            return has_any_line(cfg, colour, kind) & (it < cfg.max_cascades)

        def body(c):
            colour, kind, elim, act, new, trunc, it = c
            colour, kind, e, a, n, ovf = specials_cascade_trip(
                cfg, colour, kind, sub, it
            )
            return colour, kind, elim + e, act + a, new + n, trunc | ovf, it + 1

        z = jnp.int32(0)
        colour, kind, elim, act, new, trunc, it = jax.lax.while_loop(
            cond, body, (colour, kind, z, z, z, jnp.asarray(False), z)
        )
        trunc = trunc | has_any_line(cfg, colour, kind)
        return colour, kind, elim, act, new, it, trunc

    return jax.vmap(one)(colour_b, kind_b, sub_keys)


def assert_cascade_match(cfg, colour_b, kind_b, seed, tag):
    B = colour_b.shape[0]
    sub_keys = jax.vmap(jax.random.PRNGKey)(
        jnp.arange(seed * 10000, seed * 10000 + B)
    )
    got = fused_specials_cascade(
        cfg, jnp.asarray(colour_b), jnp.asarray(kind_b), sub_keys,
        interpret=True,
    )
    want = cascade_twin(
        cfg, jnp.asarray(colour_b), jnp.asarray(kind_b), sub_keys
    )
    names = ["colour", "kind", "elim", "act", "new", "trips", "trunc"]
    for g, w, name in zip(got, want, names):
        g, w = np.asarray(g), np.asarray(w)
        if not np.array_equal(g, w):
            bad = np.nonzero(
                (g != w).reshape(B, -1).any(axis=1)
            )[0][:3]
            raise AssertionError(
                f"{tag}: {name} diverges at boards {bad}\n"
                f"input colour:\n{np.asarray(colour_b)[bad[0]]}\n"
                f"input kind:\n{np.asarray(kind_b)[bad[0]]}\n"
                f"got:\n{g[bad[0]] if g.ndim > 1 else g[bad]}\n"
                f"want:\n{w[bad[0]] if w.ndim > 1 else w[bad]}"
            )


def base_board(R, C, K, rng):
    """A line-free base: tiles alternate among colours by (r + 2c) % K
    pattern with noise re-rolled until line-free."""
    # checkerboard of two colours is always line-free for K >= 2
    a, b = rng.choice(np.arange(1, K + 1), size=2, replace=False)
    col = np.where((np.add.outer(np.arange(R), np.arange(C))) % 2 == 0, a, b)
    return col.astype(np.int32)


def paint(col, shapes):
    for cells, colour in shapes:
        for (r, c) in cells:
            col[r, c] = colour
    return col


def hline(r, c0, n):
    return [(r, c0 + i) for i in range(n)]


def vline(r0, c, n):
    return [(r0 + i, c) for i in range(n)]


# ---------------------------------------------------------------------------
# Targeted shape constructions, one batch per case family.  Colour 4 is held
# out of the checkerboard bases (which only use rng-chosen pairs) often
# enough; use a colour not in the base for the painted line.
# ---------------------------------------------------------------------------


def shape_batch(cfg, shapes_fn, n_variants, seed, specials=None):
    R, C, K = cfg.num_rows, cfg.num_cols, cfg.num_colours
    rng = np.random.default_rng(seed)
    cols, kinds = [], []
    for i in range(n_variants):
        col = base_board(R, C, K, rng)
        used = set(np.unique(col))
        free = [k for k in range(1, K + 1) if k not in used]
        paint_colour = free[rng.integers(len(free))] if free else 1
        shapes = shapes_fn(i, rng, paint_colour)
        col = paint(col, shapes)
        kind = np.ones((R, C), np.int32)
        if specials:
            for _ in range(specials):
                r, c = rng.integers(0, R), rng.integers(0, C)
                sk = int(rng.choice([2, 3, 4, -1]))
                kind[r, c] = sk
                if sk == -1:
                    col[r, c] = 0
        cols.append(col)
        kinds.append(kind)
    return np.stack(cols), np.stack(kinds)


CASES = {
    # h x v crossing primaries, both len 3 (T and L variants)
    "cross33": lambda i, rng, pc: [
        (hline(5, 1 + (i % 3), 3), pc),
        (vline(3, 1 + (i % 3) + (i % 3 == 0), 3), pc),
    ],
    # crossing with the h-line len 4
    "cross43": lambda i, rng, pc: [
        (hline(5, 1, 4), pc),
        (vline(3, 1 + (i % 4), 3), pc),
    ],
    # crossing with the v-line len 4 (h len 3 or 4)
    "crossv4": lambda i, rng, pc: [
        (hline(6, 2, 3 + (i % 2)), pc),
        (vline(3, 2 + (i % 3), 4), pc),
    ],
    # v-primary + h-extension through it (ext lens 3 and 4, various rows)
    "ghost_ext_h": lambda i, rng, pc: [
        (vline(3, 4, 3), pc),
        (hline(3 + (i % 3), 4 - 1 - (i % 2), 3 + (i // 3) % 2), pc),
    ],
    # h-primary + v-extension (uext 0/1/2, ext lens 3 and 4)
    "ghost_ext_v": lambda i, rng, pc: [
        (hline(4, 2, 3), pc),
        (vline(4 - (i % 3), 2 + (i % 3), 3 + (i // 3) % 2), pc),
    ],
    # h-primary len 4 + v-extension
    "ghost_ext_v4": lambda i, rng, pc: [
        (hline(4, 2, 4), pc),
        (vline(4 - (i % 3), 2 + (i % 4), 3 + (i // 4) % 2), pc),
    ],
    # unshared cookie lines, len 5..8, h and v
    "cookie_h": lambda i, rng, pc: [(hline(2 + (i % 4), 0, 5 + (i % 4)), pc)],
    "cookie_v": lambda i, rng, pc: [(vline(0, 1 + (i % 5), 5 + (i % 4)), pc)],
    # shared cookie line (must defer, still bit-exact)
    "cookie_shared": lambda i, rng, pc: [
        (hline(5, 1, 5 + (i % 3)), pc),
        (vline(2 + (i % 2), 2 + (i % 4), 3), pc),
    ],
    # two disjoint pairs + a single normal in one trip
    "multi_pair": lambda i, rng, pc: [
        (hline(6, 0, 3), pc),
        (vline(4, 1, 3), pc),
        (hline(7, 4, 3), pc),
        (vline(5, 5, 3), pc),
    ],
    # multi-share (one line sharing with two) — defers, still bit-exact
    "tripod": lambda i, rng, pc: [
        (hline(5, 1, 4 + (i % 2)), pc),
        (vline(3, 2, 3), pc),
        (vline(3, 4, 3), pc),
    ],
    # v-centre star: one v-primary with TWO h-extensions (round-5 star
    # absorption: bomb at the topmost generator, other ext independent)
    "v_star2": lambda i, rng, pc: [
        (vline(3, 4, 3 + (i % 2)), pc),
        (hline(3, 3, 3), pc),
        (hline(4 + (i % 2), 4 - (i % 2), 3 + (i // 2) % 2), pc),
    ],
    # h-centre star: one h-primary with TWO v-extensions (uext mixes drive
    # the initiator/partner pop-order cases)
    "h_star2": lambda i, rng, pc: [
        (hline(4, 1, 3 + (i % 2)), pc),
        (vline(4 - (i % 3), 1, 3 + (i // 3) % 2), pc),
        (vline(4 - ((i + 1) % 3), 3, 3 + (i // 6) % 2), pc),
    ],
    # shared cookie centres: a len-5..7 line with extension/cross leaves
    "cookie_star_v": lambda i, rng, pc: [
        (vline(1, 3, 5 + (i % 3)), pc),
        (hline(2 + (i % 4), 2 + (i % 2), 3 + (i // 4) % 2), pc),
    ],
    "cookie_star_h": lambda i, rng, pc: [
        (hline(3, 1, 5 + (i % 3)), pc),
        (vline(3, 2 + (i % 4), 3 + (i // 4) % 2), pc),  # uext == 0 ext
    ],
    "cookie_cross_v": lambda i, rng, pc: [
        (vline(1, 2, 5 + (i % 3)), pc),
        (hline(2 + (i % 4), 1, 3 + (i // 4) % 2), pc),  # crossing h-line
    ],
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_painted_shapes_full_specials(case):
    cols, kinds = shape_batch(CFG_FULL, CASES[case], 12, seed=hash(case) % 1000)
    assert_cascade_match(CFG_FULL, cols, kinds, 3, f"full:{case}")


@pytest.mark.parametrize("case", ["cross33", "cross43", "crossv4",
                                  "ghost_ext_h", "ghost_ext_v", "cookie_h"])
def test_painted_shapes_with_specials_on_board(case):
    cols, kinds = shape_batch(
        CFG_FULL, CASES[case], 12, seed=hash(case) % 997, specials=3
    )
    assert_cascade_match(CFG_FULL, cols, kinds, 5, f"sp:{case}")


@pytest.mark.parametrize("case", ["cross33", "cross43", "ghost_ext_v",
                                  "cookie_h", "tripod"])
def test_painted_shapes_lasers_bomb_only(case):
    cols, kinds = shape_batch(CFG_LB, CASES[case], 10, seed=hash(case) % 991)
    assert_cascade_match(CFG_LB, cols, kinds, 7, f"lb:{case}")


@pytest.mark.parametrize("case", ["cross33", "ghost_ext_h", "cookie_h",
                                  "cookie_v", "cookie_shared"])
def test_painted_shapes_no_bomb(case):
    cols, kinds = shape_batch(
        CFG_NOBOMB, CASES[case], 10, seed=hash(case) % 983
    )
    assert_cascade_match(CFG_NOBOMB, cols, kinds, 9, f"nb:{case}")


@pytest.mark.parametrize("seed", range(4))
def test_random_lined_boards_fuzz(seed):
    """Uniform random boards: every shape family arises organically, and
    trips 2+ run on refilled boards (the same coverage engine_move sees)."""
    rng = np.random.default_rng(seed)
    B, R, C = 48, 8, 8
    cols = rng.integers(1, 5, size=(B, R, C)).astype(np.int32)
    kinds = np.ones((B, R, C), np.int32)
    # sprinkle specials on half the boards
    for b in range(0, B, 2):
        for _ in range(rng.integers(1, 5)):
            r, c = rng.integers(0, R), rng.integers(0, C)
            k = int(rng.choice([2, 3, 4, -1]))
            kinds[b, r, c] = k
            if k == -1:
                cols[b, r, c] = 0
    assert_cascade_match(CFG_FULL, cols, kinds, seed + 20, f"fuzz{seed}")


def test_bomb_pair_consumed_in_kernel():
    """A clean T-cross must be consumed by the kernel (frozen == 0) and
    actually create the bomb at the share point."""
    rng = np.random.default_rng(0)
    col = base_board(8, 8, 4, rng)
    used = set(np.unique(col))
    pc = [k for k in range(1, 5) if k not in used][0]
    paint(col, [(hline(5, 2, 3), pc), (vline(3, 3, 3), pc)])
    kind = np.ones((8, 8), np.int32)
    z = jnp.zeros((1,), jnp.int32)
    c_o, k_o, trips_o, elim_o, new_o, act_o, frozen_o, active_o, _ = (
        cascade_sp_chunk(
            CFG_FULL, jnp.asarray(col)[None], jnp.asarray(kind)[None],
            jax.random.PRNGKey(3)[None], z, z, z, interpret=True,
        )
    )
    # later trips on random refills may legitimately freeze; the painted
    # T-pair is the FIRST trip, so trips >= 1 proves the kernel consumed it
    # (freezing happens before consuming) and new >= 1 that it created the
    # bomb in-kernel.
    assert int(trips_o[0]) >= 1, "bomb pair was deferred instead of absorbed"
    assert int(new_o[0]) >= 1, "no bomb tile created in-kernel"


def test_cookie_creation_consumed_in_kernel():
    rng = np.random.default_rng(1)
    col = base_board(8, 8, 4, rng)
    used = set(np.unique(col))
    pc = [k for k in range(1, 5) if k not in used][0]
    paint(col, [(hline(4, 1, 5), pc)])
    kind = np.ones((8, 8), np.int32)
    z = jnp.zeros((1,), jnp.int32)
    c_o, k_o, trips_o, elim_o, new_o, act_o, frozen_o, active_o, _ = (
        cascade_sp_chunk(
            CFG_FULL, jnp.asarray(col)[None], jnp.asarray(kind)[None],
            jax.random.PRNGKey(4)[None], z, z, z, interpret=True,
        )
    )
    assert int(trips_o[0]) >= 1, "cookie line was deferred instead of absorbed"
    assert int(new_o[0]) >= 1, "no cookie tile created in-kernel"


CFG_BIG = EnvConfig.create(
    15, 18, 5, 6,
    colourless_specials=("cookie",),
    colour_specials=("vertical_laser", "horizontal_laser", "bomb"),
)


@pytest.mark.parametrize("seed", [0, 1])
def test_big_board_lean_path(seed):
    """R*C > 256 boards route through the LEAN predicate (sharing and >=5
    lines defer; the star/pairwise chain reductions exceed the Mosaic
    compiler's budget at 20x20) — must still be bit-exact vs the
    machinery."""
    rng = np.random.default_rng(seed)
    B, R, C = 12, 15, 18
    cols = rng.integers(1, 6, size=(B, R, C)).astype(np.int32)
    kinds = np.ones((B, R, C), np.int32)
    for b in range(0, B, 2):
        for _ in range(rng.integers(1, 6)):
            r, c = rng.integers(0, R), rng.integers(0, C)
            k = int(rng.choice([2, 3, 4, -1]))
            kinds[b, r, c] = k
            if k == -1:
                cols[b, r, c] = 0
    assert_cascade_match(CFG_BIG, cols, kinds, seed + 60, f"big{seed}")

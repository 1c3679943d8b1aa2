"""Parity: the fused Pallas cascade vs its XLA twin (same fills).

Interpret-mode on CPU here (the suite pins itself to CPU); the on-device
COMPILED parity check is `python tools/tpu_parity_check.py` on the real
TPU — its round-4 pass is recorded in BENCH.md.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tile_match_tpu.config import EnvConfig
from tile_match_tpu.ops.pallas_cascade import cascade_reference, fused_cascade

CFG = EnvConfig.create(
    6, 6, 3, 10, colourless_specials=(), colour_specials=()
)


def _boards(seed, B, R=6, C=6, K=3):
    rng = np.random.default_rng(seed)
    colour = rng.integers(1, K + 1, size=(B, R, C)).astype(np.int32)
    keys = jax.vmap(jax.random.PRNGKey)(
        jnp.arange(seed * 1000, seed * 1000 + B)
    )
    return jnp.asarray(colour), keys


@pytest.mark.parametrize("seed", range(6))
def test_fused_matches_reference_interpret(seed):
    B = 16 if seed % 2 else 130  # also cover lane padding (130 > 128)
    colour, keys = _boards(seed, B)
    got = fused_cascade(CFG, colour, keys, interpret=True)
    want = cascade_reference(CFG, colour, keys)
    for g, w, name in zip(
        got, want, ["colour", "elim", "trips", "trunc", "mask"]
    ):
        assert np.array_equal(np.asarray(g), np.asarray(w)), (
            f"{name} diverges at seed {seed}:\n{np.asarray(g)}\n!=\n"
            f"{np.asarray(w)}"
        )


def test_fused_line_free_is_identity():
    # a line-free batch: zero trips, zero elim, boards unchanged
    colour = jnp.asarray(
        np.tile(
            np.array(
                [[1, 2, 3], [2, 3, 1], [3, 1, 2]], np.int32
            ).repeat(2, 0).repeat(2, 1),
            (4, 1, 1),
        )
    )
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(4))
    out, elim, trips, trunc, _mask = fused_cascade(
        CFG, colour, keys, interpret=True
    )
    assert np.array_equal(np.asarray(out), np.asarray(colour))
    assert int(np.asarray(elim).sum()) == 0
    assert int(np.asarray(trips).sum()) == 0
    assert not np.asarray(trunc).any()


def test_settled_mask_sp_matches_xla():
    """The kernel's specials settled mask must reproduce
    effective_mask_settled's formula exactly on arbitrary boards."""
    from tile_match_tpu.ops.effective import effective_mask_settled
    from tile_match_tpu.ops.pallas_cascade import settled_mask_sp

    cfg = EnvConfig.create(
        7, 9, 4, 10,
        colourless_specials=("cookie",),
        colour_specials=("vertical_laser", "horizontal_laser", "bomb"),
    )
    rng = np.random.default_rng(5)
    B = 140  # covers lane padding
    colour = rng.integers(1, 5, size=(B, 7, 9)).astype(np.int32)
    kind = np.ones((B, 7, 9), np.int32)
    for b in range(B):
        for _ in range(rng.integers(0, 6)):
            r, c = rng.integers(0, 7), rng.integers(0, 9)
            k = int(rng.choice([2, 3, 4, -1]))
            kind[b, r, c] = k
            if k == -1:
                colour[b, r, c] = 0
    got = settled_mask_sp(
        cfg, jnp.asarray(colour), jnp.asarray(kind), interpret=True
    )
    want = jax.vmap(
        lambda c, k: effective_mask_settled(cfg, c, k)
    )(jnp.asarray(colour), jnp.asarray(kind))
    assert np.array_equal(np.asarray(got), np.asarray(want))

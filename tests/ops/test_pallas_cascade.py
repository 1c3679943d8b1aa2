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
    for g, w, name in zip(got, want, ["colour", "elim", "trips", "trunc"]):
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
    out, elim, trips, trunc = fused_cascade(CFG, colour, keys, interpret=True)
    assert np.array_equal(np.asarray(out), np.asarray(colour))
    assert int(np.asarray(elim).sum()) == 0
    assert int(np.asarray(trips).sum()) == 0
    assert not np.asarray(trunc).any()
